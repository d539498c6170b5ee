"""Single-channel spectrum pipeline (BASELINE.md measured config 1):
window -> FFT -> |.| dB -> range scale, as one fused jitted step.

Matches the spectrum-analyzer example flowgraph
(/root/reference/examples/flowgraphs/spectrum-analyzer.yml) — the
flowgraph compiler produces the same program; this module is the
direct-callable form used by benchmarks.
"""

from __future__ import annotations

from dataclasses import dataclass
import numpy as np

import jax
import jax.numpy as jnp

from cyberether_tpu.ops.windows import blackman


@dataclass
class SpectrumPipeline:
    fft_size: int = 2048
    batches: int = 8
    range_min: float = -100.0
    range_max: float = 0.0
    #: run the DFT as MXU matmuls (ops/mxu_fft) instead of XLA's FFT
    use_mxu_fft: bool = True
    #: replace exact log10/tanh with the reference-style approximations
    #: (ApproxLog10 + Pade tanh) — the VPU transcendental units are the
    #: spectrum bottleneck, not the FFT
    fast_math: bool = True

    def __post_init__(self):
        w = np.asarray(blackman(self.fft_size))
        # fftshift via (-1)^n folded into the window (invert module)
        sign = np.where(np.arange(self.fft_size) % 2 == 0, 1.0, -1.0)
        self._win = jnp.asarray((w * sign).astype(np.float32))
        self._coeff = np.float32(20.0 * np.log10(1.0 / self.fft_size))
        lo, hi = min(self.range_min, self.range_max), \
            max(self.range_min, self.range_max)
        self._scale = np.float32(1.0 / (hi - lo))
        self._offset = np.float32(-lo / (hi - lo))

    def step(self, iq: jnp.ndarray, win=None) -> jnp.ndarray:
        """iq: (batches, fft_size, 2) float32 re/im -> (batches,
        fft_size) float32 normalized spectrum in [0, 1].

        ``win`` overrides the precomputed window (bench harnesses pass
        a carry-perturbed copy so a stateless step chained under
        ``lax.scan`` cannot be hoisted out of the loop)."""
        from cyberether_tpu.ops.fastmath import approx_log10, \
            approx_tanh

        w = self._win if win is None else win
        if self.use_mxu_fft:
            from cyberether_tpu.ops.mxu_fft import fft_mxu_split

            xr = iq[..., 0] * w
            xi = iq[..., 1] * w
            yr, yi = fft_mxu_split(xr, xi)
            mag2 = jnp.maximum(yr * yr + yi * yi, 1e-60)
            db = (10.0 * (approx_log10(mag2) if self.fast_math
                          else jnp.log10(mag2))) + self._coeff
        else:
            x = (iq[..., 0] + 1j * iq[..., 1]) * w
            spec = jnp.fft.fft(x, axis=-1)
            mag = jnp.maximum(jnp.abs(spec), 1e-30)
            db = (20.0 * (approx_log10(mag) if self.fast_math
                          else jnp.log10(mag))) + self._coeff
        norm = db * self._scale + self._offset
        t = 4.0 * (norm - 0.5)
        return 0.5 + 0.5 * (approx_tanh(t) if self.fast_math
                            else jnp.tanh(t))

    def step_pallas(self, iq: jnp.ndarray, bf16: bool = False,
                    interpret: bool = False, win=None) -> jnp.ndarray:
        """Whole pipeline as ONE fused Pallas kernel: k-tiled full-DFT
        matmul + |.|^2 + dB + range, VMEM-resident.  ``bf16`` trades
        ~0.03 dB for ~4x MXU rate (display grade)."""
        from cyberether_tpu.ops.pallas_kernels import spectrum_fused

        return spectrum_fused(
            iq, np.asarray(self._win) if win is None else win,
            float(self._coeff),
            float(self._scale), float(self._offset),
            bf16=bf16, interpret=interpret)

    def step_pallas_ct(self, iq: jnp.ndarray,
                       interpret: bool = False, win=None,
                       exact: bool = True,
                       version: str = "ct5",
                       stage2: str = "",
                       kb: int = 8) -> jnp.ndarray:
        """Fused Cooley-Tukey kernel (n = m x 128): the m-point stage
        on the VPU (true-f32 ALUs), the 128-point stage on the MXU —
        ~16x fewer MXU flops than the full-DFT kernel at n=2048.

        ``exact=True`` (reference grade, round-5 production: the
        "cpack5" complex-packed DIF stage 2 — one exact VPU radix-2
        level then 64-point complex sub-DFTs as full-tile (128,128)
        real matmuls at HIGHEST, HALF the MAC passes of the direct
        128-DFT; measured 2.35e-5 of f64 truth on hardware at
        22.8-25.9 Gsamp/s across claim modes, vs 18.4-19.6 for the
        old "highest") or False (display grade 1-pass stage 2,
        34-40 G).  ``stage2`` overrides the mapping: "cpack5"
        (production exact) | "cpack2"/"cpack4"/"cpack"/"cpack6"
        (intermediate packing generations, r5h-r5m) | "highest"
        (direct 6-pass) | "x4" (manual 4-product bf16 compensation,
        ~3.2e-4 — the bf16 hi+lo representation limit) | "default" |
        "dbatch" (display matmuls batched over k1: 36.3 G, r5b) |
        "k5"/"k6" (hoisted 3-way-split K-stacked bf16) |
        "hfft64"/"fft64"/"hbatch" (measured negative results, kept
        for A/B — see tools/ablation/r5*).  The round-5 finding
        chain: the 6-pass HIGHEST cost tracks MAC passes (not call
        count, not VPU splitting), K=64/N=64 sub-DFT matmuls pad 4x
        (fft64 lost 1.7x despite halved MACs) — complex-packing the
        64-point sub-DFTs as [[C,-S],[S,C]] on [ur|ui] lanes keeps
        full MXU tiles at half the MACs, and pltpu.roll+iota-select
        packing (zero scratch trips) plus absorbing the W128 odd
        twiddle into a k1-independent odd-bin matrix made it win.
        ``version``: "ct5" (production:
        FFT-structured stage 1, needs power-of-two n/128 — falls back
        to ct4 otherwise), "ct4" (direct stage-1 MACs, any m), or
        "ct1" (round-3 layout, kept for A/B)."""
        from cyberether_tpu.ops.pallas_kernels import (
            spectrum_fused_ct, spectrum_fused_ct4, spectrum_fused_ct5)

        w = np.asarray(self._win) if win is None else win
        if version == "ct1":
            return spectrum_fused_ct(
                iq, w, float(self._coeff), float(self._scale),
                float(self._offset), interpret=interpret, exact=exact)
        s2 = stage2 or ("cpack5" if exact else "default")
        m = self.fft_size // 128
        if version == "ct5" and m & (m - 1) == 0 and m <= 32:
            return spectrum_fused_ct5(
                iq, w, float(self._coeff), float(self._scale),
                float(self._offset), interpret=interpret, stage2=s2)
        if s2.startswith("cpack"):
            # the packed tiers are ct5-structure only; the ct4
            # fallback's exact tier is the direct 6-pass HIGHEST
            # (silently dropping to its x3 split branch would be a
            # 4e-4-grade downgrade of an "exact" request)
            s2 = "highest"
        return spectrum_fused_ct4(
            iq, w, float(self._coeff), float(self._scale),
            float(self._offset), interpret=interpret, stage2=s2,
            kb=kb)

    def step_dft(self, iq: jnp.ndarray,
                 bf16: bool = False, win=None) -> jnp.ndarray:
        """XLA path of the same single-matmul full DFT (lets XLA
        schedule the epilogue; compare against step_pallas)."""
        from cyberether_tpu.ops.fastmath import approx_log10, \
            approx_tanh
        from cyberether_tpu.ops.pallas_kernels import _dft_cs

        cmat, smat = _dft_cs(self.fft_size)
        w = self._win if win is None else win
        xr = iq[..., 0] * w
        xi = iq[..., 1] * w
        c, sn = jnp.asarray(cmat), jnp.asarray(smat)
        if bf16:
            xr, xi = xr.astype(jnp.bfloat16), xi.astype(jnp.bfloat16)
            c, sn = c.astype(jnp.bfloat16), sn.astype(jnp.bfloat16)
        f32 = jnp.float32
        yr = (jnp.dot(xr, c, preferred_element_type=f32)
              + jnp.dot(xi, sn, preferred_element_type=f32))
        yi = (jnp.dot(xi, c, preferred_element_type=f32)
              - jnp.dot(xr, sn, preferred_element_type=f32))
        mag2 = jnp.maximum(yr * yr + yi * yi, 1e-60)
        db = (10.0 * (approx_log10(mag2) if self.fast_math
                      else jnp.log10(mag2))) + self._coeff
        norm = db * self._scale + self._offset
        t = 4.0 * (norm - 0.5)
        return 0.5 + 0.5 * (approx_tanh(t) if self.fast_math
                            else jnp.tanh(t))

    def jitted_step_dft(self, bf16: bool = False):
        return jax.jit(lambda iq: self.step_dft(iq, bf16))

    def jitted_step_pallas(self, bf16: bool = False,
                           interpret: bool = False):
        return jax.jit(lambda iq: self.step_pallas(iq, bf16,
                                                   interpret))

    def jitted_step(self):
        return jax.jit(self.step)

    def make_input(self, seed: int = 0) -> np.ndarray:
        rng = np.random.default_rng(seed)
        shape = (self.batches, self.fft_size)
        x = np.exp(2j * np.pi * 0.1 * np.arange(self.fft_size))[None, :] \
            + 0.01 * (rng.standard_normal(shape)
                      + 1j * rng.standard_normal(shape))
        return np.stack([x.real, x.imag], axis=-1).astype(np.float32)
