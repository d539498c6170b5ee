"""WBFM broadcast receiver (BASELINE.md measured config 3):
channel filter (FIR) -> FM discriminator -> polyphase audio decimator,
as one fused jitted streaming step with explicit state.

Reference cognate: the simple-fm / overlap-add example flowgraphs
(soapy -> filter -> fm -> audio).
"""

from __future__ import annotations

from dataclasses import dataclass
import numpy as np

import jax
import jax.numpy as jnp

from cyberether_tpu.ops.firs import windowed_sinc_bandpass


@dataclass
class WbfmReceiver:
    sample_rate: float = 2.0e6
    channel_bw: float = 200e3
    audio_decim: int = 40            # 2 MHz -> 50 kHz audio
    taps: int = 129
    deviation: float = 75e3
    #: "conv" (XLA convolution), "matmul" (banded MXU matmul) or
    #: "fft" (overlap-save frequency-domain FIR — the filter_engine
    #: strategy; rides XLA's GS/s-class TPU FFT)
    fir_impl: str = "fft"
    #: polynomial atan2 (~2e-7 rad max err) instead of XLA's —
    #: the discriminator transcendental is the VPU bottleneck
    fast_atan2: bool = True

    def __post_init__(self):
        h = windowed_sinc_bandpass(self.taps, self.sample_rate,
                                   self.channel_bw, [0.0])[0].real
        self._taps = jnp.asarray(h.astype(np.float32))
        kf = self.deviation / self.sample_rate
        self._ref = np.float32(1.0 / (2.0 * np.pi * kf))
        ad = self.audio_decim
        self._audio_taps = jnp.asarray(np.ones(ad, np.float32) / ad)

    def init_state(self):
        return {
            "fir_hist": jnp.zeros((2, self.taps - 1), jnp.float32),
            "prev": jnp.zeros((2,), jnp.float32),
        }

    def step(self, state, iq: jnp.ndarray):
        """iq: (n, 2) float32 re/im; n divisible by audio_decim and by
        128 (the FIR matmul frame).  Returns (audio, new_state)."""
        from cyberether_tpu.ops.firs import (fir_fft_streaming,
                                             fir_filter_streaming,
                                             fir_matmul_streaming)

        x = iq.T                                    # (2, n)
        if self.fir_impl == "matmul":
            filt, new_hist = fir_matmul_streaming(x, self._taps,
                                                  state["fir_hist"])
        elif self.fir_impl == "fft":
            filt, new_hist = fir_fft_streaming(x, self._taps,
                                               state["fir_hist"])
        else:
            filt, new_hist = fir_filter_streaming(x, self._taps,
                                                  state["fir_hist"])
        yr, yi = filt[0], filt[1]
        pr = jnp.concatenate([state["prev"][:1], yr[:-1]])
        pi = jnp.concatenate([state["prev"][1:], yi[:-1]])
        if self.fast_atan2:
            from cyberether_tpu.ops.pallas_kernels import _atan2

            demod = _atan2(pr * yi - pi * yr,
                           pr * yr + pi * yi) * self._ref
        else:
            demod = jnp.arctan2(pr * yi - pi * yr,
                                pr * yr + pi * yi) * self._ref
        n = demod.shape[0]
        audio = demod.reshape(n // self.audio_decim,
                              self.audio_decim).mean(-1)
        new_state = {
            "fir_hist": new_hist,
            "prev": jnp.stack([yr[-1], yi[-1]]),
        }
        return audio, new_state

    def step_pallas(self, state, iq: jnp.ndarray,
                    interpret: bool = False, version: str = "v2",
                    demod_mode: str = "classic"):
        """Fused Pallas path: channel FIR + discriminator in one VMEM
        pass (banded MXU matmuls — see ops/pallas_kernels
        wbfm_fused_v2); audio decimation stays in XLA.  Same
        (audio, state) contract as :meth:`step`.

        ``version="v2"`` (default): the kernel reads the raw (n, 2)
        input via a free reshape — the de-interleave rides the band
        matrices, so NO transpose and NO shifted-copy prep passes run
        (STATUS round-4 item 4).  "v1" keeps the round-3 layout for
        A/B."""
        n = iq.shape[0]
        K = self.taps - 1
        if demod_mode == "coherent" and version != "v2":
            raise ValueError(
                "demod_mode='coherent' requires the v2 kernel")
        if version == "v2":
            from cyberether_tpu.ops.pallas_kernels import \
                wbfm_fused_v2

            if demod_mode == "coherent":
                # opt-in: complex lag products averaged over the
                # decimation window in-kernel, one angle per audio
                # sample (see the channelizer's coherent mode)
                audio = wbfm_fused_v2(
                    iq, self._taps, state["fir_hist"], self._ref,
                    interpret=interpret,
                    coherent_decim=self.audio_decim)
                demod = None
            else:
                demod = wbfm_fused_v2(iq, self._taps,
                                      state["fir_hist"], self._ref,
                                      interpret=interpret)
            x = None
        else:
            from cyberether_tpu.ops.pallas_kernels import wbfm_fused

            x = iq.T                                # (2, n)
            demod = wbfm_fused(x, self._taps, state["fir_hist"],
                               self._ref, interpret=interpret)
        if demod is not None:
            audio = self._decimate(demod, n)
        new_hist = (iq[n - K:, :].T if x is None else x[:, n - K:]) \
            if K else state["fir_hist"]
        # last filtered sample (the lag-1 carry other impls thread)
        xtail = iq[n - self.taps:, :].T if x is None \
            else x[:, -self.taps:]
        ylast = jnp.concatenate([state["fir_hist"], xtail],
                                axis=-1)[:, -self.taps:] \
            @ self._taps[::-1]
        return audio, {"fir_hist": new_hist, "prev": ylast}

    def _decimate(self, demod: jnp.ndarray, n: int) -> jnp.ndarray:
        """Boxcar audio decimation.  The obvious
        ``reshape(n/D, D).mean(-1)`` puts D on the minor dim — a
        pathological relayout on TPU measured at ~0.19 ms of a
        0.35 ms step (r5 decomposition).  Decimating on the kernel's
        128-lane row layout instead — group lcm(D, 128) samples as
        whole rows and apply a small selector matmul — runs at
        ~0.016 ms: 0.366 -> 0.177 ms for the full step."""
        import math as _math

        D = self.audio_decim
        g = _math.lcm(D, 128)
        rows = g // 128                 # rows per group
        if n % g == 0:
            sel = np.kron(np.eye(g // D, dtype=np.float32),
                          np.full((1, D), 1.0 / D, np.float32))
            d3 = demod.reshape(n // g, g)
            return (d3 @ jnp.asarray(sel).T).reshape(-1)
        return demod.reshape(n // D, D).mean(-1)

    def jitted_step(self):
        return jax.jit(self.step, donate_argnums=(0,))

    def jitted_step_pallas(self):
        return jax.jit(self.step_pallas, donate_argnums=(0,),
                       static_argnames=("interpret", "version",
                                        "demod_mode"))

    def make_input(self, n: int, seed: int = 0) -> np.ndarray:
        rng = np.random.default_rng(seed)
        t = np.arange(n) / self.sample_rate
        msg = np.sin(2 * np.pi * 1e3 * t)
        phase = 2 * np.pi * self.deviation * np.cumsum(msg) \
            / self.sample_rate
        x = np.exp(1j * phase).astype(np.complex64)
        x += 0.01 * (rng.standard_normal(n)
                     + 1j * rng.standard_normal(n)).astype(np.complex64)
        return np.stack([x.real, x.imag], axis=-1).astype(np.float32)
