"""64-channel polyphase channelizer + per-channel FM demod.

The flagship model (BASELINE.json north star: >1 Gsamp/s aggregate on a
v5e-16, channels sharded across chips).

TPU-first design
----------------
- The polyphase branch filter runs as a grouped 1-D convolution
  (``lax.conv_general_dilated``, feature_group_count=C) over
  (2·real/imag, C, frames) — dense, static-shape, MXU/VPU friendly.
- The C-point filterbank DFT is a single batched matmul against a
  precomputed C×C IDFT matrix — C=64 maps directly onto the 128×128 MXU
  (better than calling FFT for tiny sizes).
- FM demod is a lag-1 phase difference (vectorized, no scan).
- Sharding: frames ride the mesh ``time`` axis during filtering (GSPMD
  inserts the halo exchange for the conv); the demodulated frame matrix
  is resharded to the ``channels`` axis for per-channel audio chains
  (XLA inserts the all-to-all on ICI).

Reference cognate: the fold-based channelizer path of filter_engine
(/root/reference/src/domains/dsp/filter_engine/block_impl.cc:432-649)
and the multi-fm example; this is the same math arranged for the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def design_prototype(channels: int, taps_per_branch: int,
                     kaiser_beta: float = 9.0) -> np.ndarray:
    """Prototype lowpass for a critically-sampled filterbank: windowed
    sinc with cutoff 1/(2C), length C*P, unity DC gain per branch."""
    n = channels * taps_per_branch
    t = np.arange(n) - (n - 1) / 2.0
    cutoff = 1.0 / (2.0 * channels)
    h = 2 * cutoff * np.sinc(2 * cutoff * t)
    h *= np.kaiser(n, kaiser_beta)
    h /= h.sum() / channels   # per-channel unity gain at band center
    return h.astype(np.float32)


@dataclass
class Channelizer:
    channels: int = 64
    taps_per_branch: int = 8
    audio_decim: int = 16          # frames per audio sample
    sample_rate: float = 128e6     # aggregate input rate (Hz)
    deviation: float = 75e3

    def __post_init__(self):
        C, Pt = self.channels, self.taps_per_branch
        proto = design_prototype(C, Pt)
        # branch p, phase k tap: h[p*C + k]; conv kernels are reversed
        # in time (causal FIR): rhs[k, 0, p] = h[(P-1-p)*C + k]
        hp = proto.reshape(Pt, C)           # (P, C)
        self._rhs = jnp.asarray(hp[::-1].T[:, None, :])   # (C, 1, P)
        # analysis DFT matrix (C x C): output channel c is centered at
        # c * (sample_rate / C), wrapping for negative frequencies
        k = np.arange(C)
        W = np.exp(-2j * np.pi * np.outer(k, k) / C)
        self._Wr = jnp.asarray(W.real.astype(np.float32))
        self._Wi = jnp.asarray(W.imag.astype(np.float32))
        # v4 fused matrices: taps + DFT + interleaved lane permutation
        from cyberether_tpu.ops.pallas_kernels import (
            fold_channelizer_matrices, perm_channelizer_matrix)
        self._bp4 = jnp.asarray(fold_channelizer_matrices(
            hp[::-1].astype(np.float32),
            W.real.astype(np.float32), W.imag.astype(np.float32)))
        # v5 split form: kernel-order interleaved-lane taps + one
        # lane-permuted DFT matrix (FIR on VPU, DFT on MXU)
        self._hp5 = jnp.asarray(
            np.repeat(hp[::-1].astype(np.float32), 2, axis=1))
        self._bperm5 = jnp.asarray(perm_channelizer_matrix(
            W.real.astype(np.float32), W.imag.astype(np.float32)))
        chan_rate = self.sample_rate / C
        kf = self.deviation / chan_rate
        self._fm_ref = np.float32(1.0 / (2.0 * np.pi * kf))

    # ------------------------------------------------------------------
    def init_state(self, dtype=jnp.float32):
        C, Pt = self.channels, self.taps_per_branch
        return {
            "hist": jnp.zeros((2, C, Pt - 1), dtype),   # re/im frames
            "prev": jnp.zeros((2, C), dtype),           # last y frame
        }

    def init_state_v4(self, dtype=jnp.float32):
        """State for the v4 kernel: P history frames in the kernel's
        own interleaved row layout (= raw ``iq.reshape(-1, 2C)`` rows),
        so the steady-state step runs NO layout transform at all."""
        C, Pt = self.channels, self.taps_per_branch
        return {"hist": jnp.zeros((Pt, 2 * C), dtype)}

    def step_pallas_v4(self, state, iq: jnp.ndarray,
                       tile_m: int = 512, interpret: bool = False,
                       kernel: str = "v5", decim_mode: str = "chunk",
                       atan_mode: str = "ypack",
                       demod_mode: str = "classic"
                       ) -> Tuple[jnp.ndarray, dict]:
        """Fused production step: interleaved layout + parallel grid +
        in-kernel decimation.  ``kernel`` picks the arithmetic layout:
        "v5" (THE production default: VPU FIR + one DFT matmul +
        fast3 atan), "v6" (the no-copy-FIR/chunked-decimation
        experiment — measured neutral-to-slower, kept as a tested
        variant), or "v4" (taps folded into P DFT matmuls)."""
        from cyberether_tpu.ops.pallas_kernels import (
            channelize_demod_decim, channelize_demod_decim_v5,
            channelize_demod_decim_v6)

        C, Pt = self.channels, self.taps_per_branch
        M = iq.shape[0]
        x2 = iq.reshape(M, 2 * C)          # free: minor dims collapse
        if demod_mode == "coherent":
            if decim_mode == "chunk":     # chunk pairs with ypack only
                decim_mode = "sel"
            if kernel != "v5" or decim_mode != "sel":
                raise ValueError(
                    "demod_mode='coherent' requires the v5 kernel "
                    "with selector decimation (got kernel="
                    f"{kernel!r}, decim_mode={decim_mode!r})")
            # the averaged-product intermediates put tile 4096 ~0.5 MB
            # over the 16 MB scoped-vmem limit (measured OOM); keep
            # the M-divisibility and decim-multiple invariants while
            # clamping
            t = min(tile_m, 2048, M)
            while t > self.audio_decim and (M % t or
                                            t % self.audio_decim):
                t -= self.audio_decim
            tile_m = t if M % t == 0 else M
        tile = min(tile_m, M)
        grid = M // tile
        if grid > 1:
            # tile i's left halo = last P rows of tile i-1: a strided
            # SLICE of the (grid, tile, 2C) view.  (A fancy-index
            # gather here lowered to ~grid*P serialized dynamic-slices
            # on TPU — measured >0.5 ms/step at grid=64, the round-2
            # roofline gap — and exploded compile time when unrolled.)
            x3 = x2.reshape(grid, tile, 2 * C)
            halos = jnp.concatenate(
                [state["hist"][None], x3[:-1, tile - Pt:, :]], axis=0)
        else:
            halos = state["hist"][None]
        if kernel == "v6":
            audio = channelize_demod_decim_v6(
                x2, halos, self._hp5, self._bperm5,
                float(self._fm_ref), self.audio_decim, tile_m=tile,
                interpret=interpret,
                decim_mode="chunk" if decim_mode == "sel"
                else decim_mode)
        elif kernel == "v5":
            # atan_mode "ypack" (round 5): the filterbank output is
            # lane-packed through the win scratch so the lag products
            # AND the fast3 atan chain run at full 128-lane width —
            # measured 0.136 vs 0.213 ms/step at tile 4096, BIT-
            # IDENTICAL to the fast3 classic path (r5b ablation); the
            # wrapper falls back to fast3 when tile/decim alignment
            # rules out packing
            audio = channelize_demod_decim_v5(
                x2, halos, self._hp5, self._bperm5,
                float(self._fm_ref), self.audio_decim, tile_m=tile,
                interpret=interpret, decim_mode=decim_mode,
                atan_mode=atan_mode, demod_mode=demod_mode)
            if decim_mode == "none":
                D = self.audio_decim
                audio = audio.reshape(M // D, D, C).mean(1)
        else:
            audio = channelize_demod_decim(
                x2, halos, self._bp4, float(self._fm_ref),
                self.audio_decim, tile_m=tile, interpret=interpret)
        return audio, {"hist": x2[M - Pt:]}

    def jitted_step_pallas_v4(self, tile_m: int = 512,
                              interpret: bool = False,
                              kernel: str = "v5",
                              decim_mode: str = "chunk"):
        # no donation: the 4 KB hist state is not worth aliasing, and
        # donating a buffer the output views (hist = x2 slice) trips
        # INVALID_ARGUMENT on the axon backend
        return jax.jit(lambda s, iq: self.step_pallas_v4(
            s, iq, tile_m, interpret, kernel, decim_mode))

    def frames_for(self, samples: int) -> int:
        return samples // self.channels

    # ------------------------------------------------------------------
    def step(self, state, iq: jnp.ndarray
             ) -> Tuple[jnp.ndarray, dict]:
        """One streaming step.

        iq: (frames, C, 2) float32 — interleaved re/im of the input
        stream reshaped into polyphase frames (frame m, branch k =
        sample m*C+k).  Using split float instead of complex64 keeps
        host<->device transfers on the well-supported path.

        Returns (audio, new_state): audio (frames//audio_decim, C)
        float32 FM-demodulated, decimated output.
        """
        C, Pt = self.channels, self.taps_per_branch
        M = iq.shape[0]
        x = jnp.transpose(iq, (2, 1, 0))              # (2, C, M)
        ext = jnp.concatenate([state["hist"], x], axis=-1)

        # polyphase branch FIR: grouped conv over the frame axis
        z = jax.lax.conv_general_dilated(
            ext, self._rhs, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=C,
            preferred_element_type=jnp.float32)        # (2, C, M)

        # filterbank synthesis DFT as a C×C matmul on the MXU:
        # y[c, m] = sum_k W[c, k] * z[k, m]   (complex)
        zr, zi = z[0], z[1]                            # (C, M)
        yr = self._Wr @ zr - self._Wi @ zi
        yi = self._Wr @ zi + self._Wi @ zr             # (C, M)

        # FM demod: angle(conj(y[m-1]) * y[m]) * ref, lag along frames
        pr = jnp.concatenate([state["prev"][0][:, None], yr[:, :-1]],
                             axis=1)
        pi = jnp.concatenate([state["prev"][1][:, None], yi[:, :-1]],
                             axis=1)
        dr = pr * yr + pi * yi                         # Re(conj(p)*y)
        di = pr * yi - pi * yr                         # Im(conj(p)*y)
        demod = jnp.arctan2(di, dr) * self._fm_ref     # (C, M)

        # per-channel audio decimation (boxcar mean over frames)
        D = self.audio_decim
        audio = demod.reshape(C, M // D, D).mean(-1)   # (C, M//D)
        audio = audio.T                                # (M//D, C)

        new_state = {
            "hist": ext[:, :, -(Pt - 1):],
            "prev": jnp.stack([yr[:, -1], yi[:, -1]]),
        }
        return audio, new_state

    # ------------------------------------------------------------------
    def step_pallas(self, state, iq: jnp.ndarray, interpret: bool = False,
                    tile_m: int = 512, variant: str = "v1"
                    ) -> Tuple[jnp.ndarray, dict]:
        """Same math as :meth:`step` through the fused Pallas kernel
        (ops/pallas_kernels.py channelize_demod): FIR + DFT + demod stay
        VMEM-resident instead of three XLA ops round-tripping HBM."""
        from cyberether_tpu.ops.pallas_kernels import channelize_demod

        C, Pt = self.channels, self.taps_per_branch
        M = iq.shape[0]
        x = jnp.transpose(iq, (2, 1, 0))             # (2, C, M)
        ext3 = jnp.concatenate([state["hist"], x], axis=-1)
        # time-major packed layout (frames, 2C): re | im on lanes
        ext = jnp.transpose(ext3, (2, 0, 1)).reshape(M + Pt - 1,
                                                     2 * C)
        hp_k = jnp.transpose(self._rhs[:, 0, :])     # (P, C)
        demod, ylast = channelize_demod(
            ext, hp_k, self._Wr, self._Wi,
            state["prev"].reshape(1, 2 * C),
            float(self._fm_ref), tile_m=min(tile_m, M),
            interpret=interpret, variant=variant)     # (M, C)
        D = self.audio_decim
        audio = demod.reshape(M // D, D, C).mean(1)
        new_state = {"hist": ext3[:, :, -(Pt - 1):],
                     "prev": ylast.reshape(2, C)}
        return audio, new_state

    def jitted_step_pallas(self, interpret: bool = False,
                           tile_m: int = 512, variant: str = "v1"):
        return jax.jit(lambda s, iq: self.step_pallas(s, iq,
                                                      interpret,
                                                      tile_m, variant))

    # ------------------------------------------------------------------
    def sharded_step(self, mesh: Mesh):
        """jit the step over a mesh: frames sharded on 'time' during
        filtering, output resharded onto 'channels' for per-channel
        consumers.  GSPMD inserts the conv halo + all-to-all."""

        def fn(state, iq):
            iq = jax.lax.with_sharding_constraint(
                iq, NamedSharding(mesh, P("time", None, None)))
            audio, new_state = self.step(state, iq)
            audio = jax.lax.with_sharding_constraint(
                audio, NamedSharding(mesh, P(None, "channels")))
            return audio, new_state

        return jax.jit(fn, donate_argnums=(0,))

    def jitted_step(self):
        return jax.jit(self.step, donate_argnums=(0,))

    def sharded_step_fn(self, mesh: Mesh, tile_m: int = 512,
                        interpret: bool = False, kernel: str = "v5",
                        demod_mode: str = "classic"):
        """Time-sharded fused-kernel step, UNJITTED (composable inside
        a larger jitted program — the scheduler's segment compiler
        calls this from ``ChannelizerFusedModule.apply_mesh``): each
        ``time`` shard runs the fused Pallas kernel on its local
        frames after a ``ppermute`` left halo of P frames (the direct
        halo-exchange cognate of the reference's overlap-save
        segmentation, SURVEY.md §5).  Only a parallel-grid kernel is
        shardable — v1/v2 chain a sequential lag carry across tiles,
        which cannot cross shard boundaries.

        State: ``{"hist": (P, 2C)}`` (v4 interleaved rows) replicated;
        only the last shard contributes the next step's history
        (psum-selected).
        """
        from jax import shard_map

        C, Pt = self.channels, self.taps_per_branch
        n_t = mesh.shape["time"]

        def local_fn(state, iq):
            M = iq.shape[0]                        # local frames
            x2 = iq.reshape(M, 2 * C)
            tail = x2[-Pt:]                        # my last P frames
            perm = [(i, (i + 1) % n_t) for i in range(n_t)]
            recv = jax.lax.ppermute(tail, "time", perm)
            idx = jax.lax.axis_index("time")
            hist = jnp.where(idx == 0, state["hist"], recv)
            audio, _ = self.step_pallas_v4(
                {"hist": hist}, iq, tile_m=min(tile_m, M),
                interpret=interpret, kernel=kernel,
                demod_mode=demod_mode)
            new_hist = jax.lax.psum(
                jnp.where(idx == n_t - 1, tail, 0.0), "time")
            return audio, {"hist": new_hist}

        return shard_map(
            local_fn, mesh=mesh,
            in_specs=({"hist": P()}, P("time", None, None)),
            out_specs=(P("time", None), {"hist": P()}),
            check_vma=False)   # pallas_call outputs carry no vma info

    def sharded_step_pallas(self, mesh: Mesh, tile_m: int = 512,
                            interpret: bool = False):
        """Jitted entry over :meth:`sharded_step_fn`."""
        return jax.jit(self.sharded_step_fn(mesh, tile_m, interpret),
                       donate_argnums=(0,))

    # ------------------------------------------------------------------
    def make_input_full(self, frames: int, seed: int = 0) -> np.ndarray:
        """FM carriers in EVERY channel (distinct audio tones).  For
        elementwise correctness checks: demod of an empty channel (and
        of noise) is ±2π atan2-branch noise, so only a fully occupied
        band compares cleanly across implementations."""
        rng = np.random.default_rng(seed)
        C = self.channels
        n = frames * C
        t = np.arange(n) / self.sample_rate
        x = np.zeros(n, np.complex64)
        for ch in range(C):
            fc = (ch - C / 2) * (self.sample_rate / C)
            tone = 300.0 + 37.0 * ch
            msg = np.sin(2 * np.pi * tone * t + rng.uniform(0, 6.28))
            phase = 2 * np.pi * (fc * t + self.deviation
                                 * np.cumsum(msg) / self.sample_rate)
            x += np.exp(1j * phase).astype(np.complex64)
        frames_arr = x.reshape(frames, C)
        return np.stack([frames_arr.real, frames_arr.imag],
                        axis=-1).astype(np.float32)

    def make_input(self, frames: int, seed: int = 0) -> np.ndarray:
        """Synthetic multicarrier test input (frames, C, 2) float32."""
        rng = np.random.default_rng(seed)
        n = frames * self.channels
        t = np.arange(n) / self.sample_rate
        x = np.zeros(n, np.complex64)
        for ch in (3, 17, 40):
            fc = (ch - self.channels / 2) * \
                (self.sample_rate / self.channels)
            msg = np.sin(2 * np.pi * 1e3 * t)
            phase = 2 * np.pi * (fc * t +
                                 self.deviation * np.cumsum(msg)
                                 / self.sample_rate)
            x += np.exp(1j * phase).astype(np.complex64)
        x += (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
            .astype(np.complex64) * 0.01
        frames_arr = x.reshape(frames, self.channels)
        return np.stack([frames_arr.real, frames_arr.imag],
                        axis=-1).astype(np.float32)
