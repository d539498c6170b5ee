"""dsp/ domain — signal-processing modules.

Reference: /root/reference/src/domains/dsp/ (SURVEY.md §2.4 dsp list).
All compute is pure JAX traced into the fused graph program; streaming
recurrences use associative scans (:mod:`cyberether_tpu.ops.streaming`)
instead of the reference's per-sample C++ loops.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from cyberether_tpu import ops
from cyberether_tpu.core.block import simple_block
from cyberether_tpu.core.module import Module, PASS_FLAG
from cyberether_tpu.core.params import Field, Schema
from cyberether_tpu.core.registry import register_block, register_module
from cyberether_tpu.core.tensor import SignalAxes, TensorSpec
from cyberether_tpu.core.types import (DataType, Device, Taint,
                                       ValidationError)


def resolve_signal_axes(spec: TensorSpec) -> SignalAxes:
    """ResolveSignalAxes (memory/axis.cc:231-243): explicit attributes,
    with rank-1 defaulting sample to axis 0."""
    axes = spec.axes
    if axes.sample is None and spec.rank == 1:
        axes = replace(axes, sample=0)
    return axes


def _require_sample_axis(spec: TensorSpec, who: str) -> int:
    axes = resolve_signal_axes(spec)
    if axes.sample is None:
        raise ValidationError(
            f"[{who}] input must carry sampleAxis metadata")
    return axes.sample


def _lane_view(spec: TensorSpec) -> Tuple[int, Optional[int]]:
    """(sample_axis, batch_axis) after resolution."""
    axes = resolve_signal_axes(spec)
    return axes.sample, axes.batch


# ---------------------------------------------------------------------------
# window — Blackman window generator (dsp/window), STATIC_OUTPUT
# ---------------------------------------------------------------------------
@register_module
class WindowModule(Module):
    module_type = "window"
    taints = Taint.STATIC_OUTPUT
    output_ports = ("window",)
    schema = Schema(Field("size", "int", 1024))

    def validate(self) -> None:
        if int(self.config["size"]) == 0:
            raise ValidationError("window size cannot be zero")

    def create(self) -> Dict[str, TensorSpec]:
        return {"window": TensorSpec((int(self.config["size"]),),
                                     DataType.CF32, self.device,
                                     SignalAxes(sample=0))}

    def apply(self, inputs, state):
        w = ops.blackman(int(self.config["size"]))
        return {"window": w.astype(jnp.complex64)}, state


# ---------------------------------------------------------------------------
# fft (dsp/fft) — pocketfft-compatible, unnormalized both directions
# ---------------------------------------------------------------------------
@register_module
class FftModule(Module):
    module_type = "fft"
    taints = Taint.STATELESS
    input_ports = ("signal",)
    output_ports = ("signal",)
    schema = Schema(Field("forward", "bool", True),
                    Field("complexOutput", "bool", False))

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype not in (DataType.F32, DataType.CF32):
            raise ValidationError(f"unsupported input dtype {spec.dtype}")
        self._axis = _require_sample_axis(spec, "MODULE_FFT")

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["signal"]
        out_dtype = spec.dtype
        shape = list(spec.shape)
        if (spec.dtype == DataType.F32 and self.config["forward"]
                and self.config["complexOutput"]):
            out_dtype = DataType.CF32
            shape[self._axis] = shape[self._axis] // 2 + 1
        return {"signal": spec.with_shape(shape).with_dtype(out_dtype)}

    def apply(self, inputs, state):
        x = inputs["signal"]
        fwd = bool(self.config["forward"])
        if jnp.iscomplexobj(x):
            out = ops.fft_c2c(x, self._axis, fwd)
        elif fwd and self.config["complexOutput"]:
            out = ops.fft_r2c(x, self._axis)
        else:
            out = ops.fft_r2r_fftpack(x, self._axis, fwd)
        return {"signal": out}, state


@register_module
class FftMxuModule(FftModule):
    """fft with provider='mxu': the C2C forward transform runs as MXU
    matmuls (ops/mxu_fft) instead of XLA's VPU FFT — the reference's
    per-provider module-implementation pattern (JST_REGISTER_MODULE
    provider key) carried over."""

    provider = "mxu"

    def validate(self) -> None:
        super().validate()
        spec = self.input_specs["signal"]
        if not (spec.dtype == DataType.CF32 and self.config["forward"]):
            raise ValidationError(
                "mxu provider supports CF32 forward transforms")
        from cyberether_tpu.ops.mxu_fft import _factor

        _factor(spec.shape[self._axis])   # raises if unfactorable

    def apply(self, inputs, state):
        from cyberether_tpu.ops.mxu_fft import fft_mxu

        x = jnp.moveaxis(inputs["signal"], self._axis, -1)
        out = jnp.moveaxis(fft_mxu(x), -1, self._axis)
        return {"signal": out}, state


def fft_pallas_eligible(spec, axis: int) -> bool:
    """Shapes the pallas FFT provider takes: CF32 with n = m*128, m a
    power of two <= 32 (composites use this to pick the provider)."""
    if spec.dtype != DataType.CF32:
        return False
    n = spec.shape[axis]
    m = n // 128
    return n % 128 == 0 and m & (m - 1) == 0 and 1 <= m <= 32


@register_module
class FftPallasModule(FftModule):
    """fft with provider='pallas': the fused ct5-structure kernel
    (chunk-axis FFT stage 1 + 128-point MXU stage 2 at HIGHEST
    precision — ops/pallas_kernels.fft_pallas).  Measured 16.2 Gsamp/s
    vs 12.5 for XLA's FFT and 5.1 for the mxu provider at
    (4096, 2048) CF32.  Inverse transforms ride the conjugation
    identity ifft(x) = conj(fft(conj(x)))/n."""

    provider = "pallas"

    def validate(self) -> None:
        super().validate()
        spec = self.input_specs["signal"]
        if spec.dtype != DataType.CF32:
            raise ValidationError(
                "pallas provider supports CF32 transforms")
        if not fft_pallas_eligible(spec, self._axis):
            raise ValidationError(
                f"pallas provider needs n = m*128, m a power of two "
                f"<= 32 (got n={spec.shape[self._axis]})")

    def apply(self, inputs, state):
        from cyberether_tpu.ops.pallas_kernels import fft_pallas

        x = jnp.moveaxis(inputs["signal"], self._axis, -1)
        # interpret when THIS module executes on CPU — whether that's
        # the session default backend or a 'device: cpu' segment
        # inside a TPU session (Mosaic kernels only lower on TPU)
        interp = (jax.default_backend() == "cpu"
                  or self.device == Device.CPU)
        if self.config["forward"]:
            out = fft_pallas(x, interpret=interp)
        else:
            # UNNORMALIZED backward (the module's pocketfft
            # convention, ops/fftops.fft_c2c): conj(fft(conj(x)))
            out = jnp.conj(fft_pallas(jnp.conj(x),
                                      interpret=interp))
        return {"signal": jnp.moveaxis(out, -1, self._axis)}, state


# ---------------------------------------------------------------------------
# amplitude (dsp/amplitude) — |x| -> dB with 1/N normalization offset
# ---------------------------------------------------------------------------
@register_module
class AmplitudeModule(Module):
    module_type = "amplitude"
    taints = Taint.STATELESS
    input_ports = ("signal",)
    output_ports = ("signal",)
    schema = Schema(Field("fastMath", "bool", False))

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype not in (DataType.F32, DataType.CF32):
            raise ValidationError(f"unsupported input dtype {spec.dtype}")
        axes = resolve_signal_axes(spec)
        if axes.sample is None and axes.channel is None:
            raise ValidationError(
                "input must contain sampleAxis or channelAxis metadata")
        self._norm = spec.shape[axes.sample] if axes.sample is not None \
            else 1

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["signal"]
        return {"signal": spec.with_dtype(DataType.F32)}

    def apply(self, inputs, state):
        x = inputs["signal"]
        coeff = 20.0 * np.log10(1.0 / self._norm)
        mag = jnp.abs(x)
        if self.config.get("fastMath"):
            # reference ApproxLog10 numerics (backend/devices/cpu/
            # helpers.hh:61-74) — ~8e-3 dB, transcendental free
            from cyberether_tpu.ops.fastmath import approx_log10

            db = 20.0 * approx_log10(jnp.where(mag == 0.0, 1.0, mag))
        else:
            db = 20.0 * jnp.log10(jnp.where(mag == 0.0, 1.0, mag))
        out = jnp.where(mag == 0.0, -jnp.inf, db + coeff)
        return {"signal": out.astype(jnp.float32)}, state


# ---------------------------------------------------------------------------
# invert (dsp/invert) — spectrum inversion: multiply by (-1)^n along the
# sample axis (odd lengths use the integer-bin phasor)
# ---------------------------------------------------------------------------
@register_module
class InvertModule(Module):
    module_type = "invert"
    taints = Taint.STATELESS
    input_ports = ("signal",)
    output_ports = ("signal",)

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype not in (DataType.F32, DataType.CF32):
            raise ValidationError(f"unsupported input dtype {spec.dtype}")
        self._axis = _require_sample_axis(spec, "MODULE_INVERT")

    def create(self) -> Dict[str, TensorSpec]:
        return {"signal":
                self.input_specs["signal"].with_dtype(DataType.CF32)}

    def apply(self, inputs, state):
        x = inputs["signal"].astype(jnp.complex64)
        n = x.shape[self._axis]
        k = np.arange(n)
        # build the phasor from REAL planes and combine on device —
        # complex64 host->device uploads are unimplemented on axon
        if n % 2 == 0:
            pr = np.where(k % 2 == 0, 1.0, -1.0).astype(np.float32)
            pi = np.zeros(n, np.float32)
        else:
            phase = 2.0 * np.pi * (n // 2) * k / n
            pr = np.cos(phase).astype(np.float32)
            pi = np.sin(phase).astype(np.float32)
        phasor = (jnp.asarray(pr) + 1j * jnp.asarray(pi)) \
            .astype(jnp.complex64)
        shape = [1] * x.ndim
        shape[self._axis] = n
        return {"signal": x * phasor.reshape(shape)}, state


# ---------------------------------------------------------------------------
# agc (dsp/agc) — tiled RMS AGC with slew-limited gain interpolation
# ---------------------------------------------------------------------------
@register_module
class AgcModule(Module):
    module_type = "agc"
    taints = Taint.STATELESS
    input_ports = ("signal",)
    output_ports = ("signal",)
    schema = Schema(
        Field("tileSize", "int", 1024),
        Field("reference", "float", 1.0),
        Field("epsilon", "float", 1e-12),
        Field("minGain", "float", 0.01),
        Field("maxGain", "float", 100.0),
        Field("maxGainChange", "float", 4.0))

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype not in (DataType.F32, DataType.CF32):
            raise ValidationError(f"unsupported input dtype {spec.dtype}")
        if int(self.config["tileSize"]) == 0:
            raise ValidationError("tileSize cannot be zero")
        self._axis = _require_sample_axis(spec, "MODULE_AGC")

    def create(self) -> Dict[str, TensorSpec]:
        return {"signal": self.input_specs["signal"]}

    def apply(self, inputs, state):
        x = inputs["signal"]
        ax = self._axis
        n = x.shape[ax]
        tile = min(int(self.config["tileSize"]), n)
        ref = float(self.config["reference"])
        eps = float(self.config["epsilon"])
        gmin = float(self.config["minGain"])
        gmax = float(self.config["maxGain"])
        gchg = float(self.config["maxGainChange"])

        xt = jnp.moveaxis(x, ax, -1)
        lanes = xt.shape[:-1]
        flat = xt.reshape((-1, n))
        power = jnp.abs(flat.astype(jnp.complex64)) ** 2

        ntiles = 1 + (n - 1) // tile
        # per-tile mean power (last tile may be shorter)
        gains = []
        for t in range(ntiles):
            s = t * tile
            ln = min(tile, n - s)
            mp = jnp.mean(power[:, s:s + ln], axis=-1)
            gains.append(jnp.clip(ref / jnp.sqrt(mp + eps), gmin, gmax))
        # sequential slew-limit chain (small, unrolled at trace time)
        start = gains[0]
        out_rows = []
        for t in range(ntiles):
            s = t * tile
            ln = min(tile, n - s)
            if t + 1 < ntiles:
                raw = gains[t + 1]
                lo = jnp.maximum(gmin, start / gchg)
                hi = jnp.where(start > gmax / gchg, gmax, start * gchg)
                end = jnp.clip(raw, lo, hi)
            else:
                end = start
            step = (end - start) / ln
            idx = jnp.arange(ln, dtype=jnp.float32)
            g = start[:, None] + step[:, None] * idx[None, :]
            out_rows.append(flat[:, s:s + ln] * g.astype(
                jnp.float32 if not jnp.iscomplexobj(x) else jnp.complex64))
            start = end
        out = jnp.concatenate(out_rows, axis=-1).reshape(lanes + (n,))
        out = jnp.moveaxis(out, -1, ax)
        return {"signal": out.astype(x.dtype)}, state


# ---------------------------------------------------------------------------
# am (dsp/am) — envelope detector + DC-blocker
#   out[n] = env[n] - env[n-1] + alpha*out[n-1]  (first-order recurrence,
#   evaluated with an associative scan instead of a sample loop)
# ---------------------------------------------------------------------------
@register_module
class AmModule(Module):
    module_type = "am"
    input_ports = ("signal",)
    output_ports = ("signal",)
    schema = Schema(Field("sampleRate", "float", 240e3),
                    Field("dcAlpha", "float", 0.995))

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype != DataType.CF32:
            raise ValidationError("input must be complex (CF32)")
        self._axis = _require_sample_axis(spec, "MODULE_AM")
        axes = resolve_signal_axes(spec)
        self._batch = axes.batch
        lanes = spec.size // spec.shape[self._axis]
        if self._batch is not None:
            lanes //= spec.shape[self._batch]
        self._lanes = lanes

    def create(self) -> Dict[str, TensorSpec]:
        return {"signal":
                self.input_specs["signal"].with_dtype(DataType.F32)}

    def init_state(self):
        return {"prev_env": np.zeros((self._lanes,), jnp.float32),
                "prev_out": np.zeros((self._lanes,), jnp.float32)}

    def apply(self, inputs, state):
        x = inputs["signal"]
        alpha = float(self.config["dcAlpha"])
        stream, unflatten = _to_lane_stream(x, self._axis, self._batch)
        env = jnp.abs(stream)                                  # (lanes, T)
        prev_env = state["prev_env"]
        diff = env - jnp.concatenate([prev_env[:, None], env[:, :-1]],
                                     axis=-1)
        out, last = ops.first_order_iir(diff, alpha, state["prev_out"],
                                        axis=-1)
        new_state = {"prev_env": env[:, -1], "prev_out": last}
        return {"signal": unflatten(out).astype(jnp.float32)}, new_state


def _to_lane_stream(x: jnp.ndarray, sample_axis: int,
                    batch_axis: Optional[int]):
    """Reshape to (lanes, time) where time = batch*samples in stream
    order (batches are consecutive in time, matching the reference's
    batch-then-sample loops).  Returns (stream, unflatten_fn)."""
    nd = x.ndim
    sample_axis %= nd
    if batch_axis is not None:
        batch_axis %= nd
    order = [d for d in range(nd)
             if d != sample_axis and d != batch_axis]
    perm = order + ([batch_axis] if batch_axis is not None else []) \
        + [sample_axis]
    xt = jnp.transpose(x, perm)
    lane_shape = xt.shape[:len(order)]
    stream = xt.reshape((-1,) + (int(np.prod(xt.shape[len(order):])),)) \
        if order else xt.reshape((1, -1))
    tail_shape = xt.shape[len(order):]

    def unflatten(y: jnp.ndarray) -> jnp.ndarray:
        yt = y.reshape(lane_shape + tail_shape)
        inv = np.argsort(perm)
        return jnp.transpose(yt, inv)

    return stream, unflatten


# ---------------------------------------------------------------------------
# fm (dsp/fm) — quadrature FM discriminator; narrow mode with optional
# de-emphasis; wide mode adds stereo pilot decode (scan-based)
# ---------------------------------------------------------------------------
@register_module
class FmModule(Module):
    module_type = "fm"
    input_ports = ("signal",)
    output_ports = ("signal",)
    schema = Schema(Field("mode", "str", "narrow"),
                    Field("deemphasis", "str", "none"),
                    Field("sampleRate", "float", 240e3))

    def validate(self) -> None:
        cfg = self.config
        if cfg["mode"] not in ("narrow", "wide"):
            raise ValidationError("mode must be 'narrow' or 'wide'")
        if cfg["deemphasis"] not in ("none", "50us", "75us"):
            raise ValidationError(
                "de-emphasis must be 'none', '50us', or '75us'")
        sr = float(cfg["sampleRate"])
        if not (0 < sr <= 20e6):
            raise ValidationError("sample rate must be in (0, 20e6]")
        if cfg["mode"] == "wide" and sr < 200e3:
            raise ValidationError("wideband mode requires >= 200 kHz")
        spec = self.input_specs["signal"]
        if spec.dtype != DataType.CF32:
            raise ValidationError("input must be complex (CF32)")
        axes = resolve_signal_axes(spec)
        if axes.sample is None:
            raise ValidationError("input must carry sampleAxis metadata")
        if cfg["mode"] == "wide" and axes.channel is not None:
            raise ValidationError(
                "wideband mode does not support channelized input")
        self._axis = axes.sample
        self._batch = axes.batch
        lanes = spec.size // spec.shape[self._axis]
        if self._batch is not None:
            lanes //= spec.shape[self._batch]
        self._lanes = lanes
        self._wide = cfg["mode"] == "wide"

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["signal"]
        out = spec.with_dtype(DataType.F32)
        if self._wide:
            shape = spec.shape + (2,)
            axes = replace(resolve_signal_axes(spec), channel=spec.rank)
            out = replace(out.with_shape(shape), axes=axes)
        return {"signal": out.with_attrs(frequency=0.0)}

    # -- coefficients -------------------------------------------------------
    def _coeffs(self):
        sr = float(self.config["sampleRate"])
        deviation = 75e3 if self._wide else 100e3
        kf = deviation / sr
        ref = 1.0 / (2.0 * np.pi * kf)
        de = self.config["deemphasis"]
        if de == "none":
            alpha = 1.0
        else:
            tau = 50e-6 if de == "50us" else 75e-6
            alpha = 1.0 - np.exp(-1.0 / (sr * tau))
        return ref, alpha

    def init_state(self):
        # HOST templates only (np, not jnp): eagerly creating a
        # complex64 device array is a complex h2d — UNIMPLEMENTED on
        # the axon backend and it POISONS the whole device stream
        # (every later fetch fails); the scheduler realifies state at
        # upload (_upload_state)
        st = {"prev": np.zeros((self._lanes,), np.complex64),
              "has_prev": np.zeros((self._lanes,), np.bool_)}
        if self.config["deemphasis"] != "none" and not self._wide:
            st["deemph"] = np.zeros((self._lanes,), np.float32)
        if self._wide:
            st["stereo"] = _wide_fm_init(self._lanes)
        return st

    def apply(self, inputs, state):
        x = inputs["signal"]
        ref, alpha = self._coeffs()
        stream, unflatten = _to_lane_stream(x, self._axis, self._batch)
        prev = jnp.concatenate([state["prev"][:, None], stream[:, :-1]],
                               axis=-1)
        demod = jnp.angle(jnp.conj(prev) * stream) * ref
        # first-ever sample (no previous) demodulates to 0
        first_mask = jnp.concatenate(
            [~state["has_prev"][:, None],
             jnp.zeros_like(stream[:, :-1], dtype=bool)], axis=-1)
        demod = jnp.where(first_mask, 0.0, demod)
        new_state = dict(state)
        new_state["prev"] = stream[:, -1]
        new_state["has_prev"] = jnp.ones_like(state["has_prev"])

        if not self._wide:
            if self.config["deemphasis"] != "none":
                # y[n] = (1-alpha) y[n-1] + alpha x[n]
                y, last = ops.first_order_iir(alpha * demod, 1.0 - alpha,
                                              state["deemph"], axis=-1)
                new_state["deemph"] = last
                demod = y
            return {"signal": unflatten(demod).astype(jnp.float32)}, \
                new_state

        sr = float(self.config["sampleRate"])
        left, right, stereo_state = _wide_fm_decode(
            demod, state["stereo"], sr, alpha,
            self.config["deemphasis"] != "none")
        new_state["stereo"] = stereo_state
        out = jnp.stack([unflatten(left), unflatten(right)], axis=-1)
        return {"signal": out.astype(jnp.float32)}, new_state


def _biquad_coeffs_notch(sr: float):
    """19 kHz pilot notch biquad (fm/module_impl.cc updateCoefficients)."""
    w = 2.0 * np.pi * 19e3 / sr
    alpha = np.sin(w) / (2.0 * 20.0)
    a0 = 1.0 + alpha
    b0 = 1.0 / a0
    b1 = -2.0 * np.cos(w) / a0
    return (np.float32(b0), np.float32(b1), np.float32(b0),
            np.float32(b1), np.float32((1.0 - alpha) / a0))


_AUDIO_LP_Q = (0.51763809, 0.70710678, 1.93185165)


def _biquad_coeffs_lowpass(sr: float, fc: float, q: float):
    w = 2.0 * np.pi * fc / sr
    alpha = np.sin(w) / (2.0 * q)
    cosw = np.cos(w)
    a0 = 1.0 + alpha
    b1 = (1.0 - cosw) / a0
    b0 = b1 / 2.0
    return (np.float32(b0), np.float32(b1), np.float32(b0),
            np.float32(-2.0 * cosw / a0),
            np.float32((1.0 - alpha) / a0))


def _wide_fm_init(lanes: int):
    z = jnp.zeros((lanes,), jnp.float32)
    return {
        "pilot_phase": z, "pilot_cos_stage": z, "pilot_sin_stage": z,
        "pilot_cos": z, "pilot_sin": z,
        "sum_notch": jnp.zeros((lanes, 2), jnp.float32),
        "diff_notch": jnp.zeros((lanes, 2), jnp.float32),
        "sum_lp": jnp.zeros((lanes, 3, 2), jnp.float32),
        "diff_lp": jnp.zeros((lanes, 3, 2), jnp.float32),
        "left_de": z, "right_de": z,
    }


def _biquad_step(x, zs, coeffs):
    """Transposed direct-form II biquad: returns (y, new_zs)."""
    b0, b1, b2, a1, a2 = coeffs
    y = b0 * x + zs[..., 0]
    z0 = b1 * x - a1 * y + zs[..., 1]
    z1 = b2 * x - a2 * y
    return y, jnp.stack([z0, z1], axis=-1)


def _wide_fm_decode(demod, st, sr: float, de_alpha: float, de_on: bool):
    """Stereo decode (pilot PLL + 38 kHz subcarrier), sample-sequential
    scan — the one irreducibly recurrent DSP path
    (fm/module_impl_native_cpu.cc wideBand branch)."""
    pilot_inc = np.float32(2.0 * np.pi * 19e3 / sr)
    pilot_alpha = np.float32(1.0 - np.exp(-2.0 * np.pi * 200.0 / sr))
    notch = _biquad_coeffs_notch(sr)
    lps = [_biquad_coeffs_lowpass(sr, 15e3, q) for q in _AUDIO_LP_Q]
    two_pi = np.float32(2.0 * np.pi)

    def step(carry, d):
        (phase, pcs, pss, pc, ps, sn, dn, slp, dlp, lde, rde) = carry
        cosw = jnp.cos(phase)
        sinw = jnp.sin(phase)
        pcs = pcs + pilot_alpha * (d * cosw - pcs)
        pss = pss + pilot_alpha * (d * sinw - pss)
        pc = pc + pilot_alpha * (pcs - pc)
        ps = ps + pilot_alpha * (pss - ps)

        s_n, sn = _biquad_step(d, sn, notch)
        s = s_n
        slp_new = []
        for i, co in enumerate(lps):
            s, z = _biquad_step(s, slp[:, i], co)
            slp_new.append(z)
        slp = jnp.stack(slp_new, axis=1)

        pilot_off = jnp.arctan2(pc, ps)
        diff_carrier = jnp.sin(2.0 * (phase + pilot_off))
        dm, dn = _biquad_step(2.0 * d * diff_carrier, dn, notch)
        dd = dm
        dlp_new = []
        for i, co in enumerate(lps):
            dd, z = _biquad_step(dd, dlp[:, i], co)
            dlp_new.append(z)
        dlp = jnp.stack(dlp_new, axis=1)

        left = s + dd
        right = s - dd
        if de_on:
            lde = lde + de_alpha * (left - lde)
            rde = rde + de_alpha * (right - rde)
            left, right = lde, rde
        phase = phase + pilot_inc
        phase = jnp.where(phase >= two_pi, phase - two_pi, phase)
        return ((phase, pcs, pss, pc, ps, sn, dn, slp, dlp, lde, rde),
                (left, right))

    carry0 = (st["pilot_phase"], st["pilot_cos_stage"],
              st["pilot_sin_stage"], st["pilot_cos"], st["pilot_sin"],
              st["sum_notch"], st["diff_notch"], st["sum_lp"],
              st["diff_lp"], st["left_de"], st["right_de"])
    carry, (left, right) = jax.lax.scan(step, carry0, demod.T)
    new_st = dict(zip(
        ("pilot_phase", "pilot_cos_stage", "pilot_sin_stage", "pilot_cos",
         "pilot_sin", "sum_notch", "diff_notch", "sum_lp", "diff_lp",
         "left_de", "right_de"), carry))
    return left.T, right.T, new_st


# ---------------------------------------------------------------------------
# squelch (dsp/squelch) — peak-amplitude gate publishing metrics and a
# SKIP flag (compiled to a validity flag here)
# ---------------------------------------------------------------------------
@register_module
class SquelchModule(Module):
    module_type = "squelch"
    taints = Taint.STATELESS
    input_ports = ("signal",)
    output_ports = ("signal",)
    schema = Schema(Field("threshold", "float", 0.1))

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype not in (DataType.F32, DataType.CF32):
            raise ValidationError(f"unsupported input dtype {spec.dtype}")

    def create(self) -> Dict[str, TensorSpec]:
        return {"signal": self.input_specs["signal"]}

    def apply(self, inputs, state):
        x = inputs["signal"]
        peak = jnp.max(jnp.abs(x))
        passing = peak > float(self.config["threshold"])
        return {"signal": x, PASS_FLAG: passing,
                "metric:passing": passing,
                "metric:amplitude": peak}, state


# ---------------------------------------------------------------------------
# filter_taps (dsp/filter_taps) — windowed-sinc bandpass designer, STATIC
# ---------------------------------------------------------------------------
@register_module
class FilterTapsModule(Module):
    module_type = "filter_taps"
    taints = Taint.STATIC_OUTPUT
    output_ports = ("coeffs",)
    schema = Schema(
        Field("sampleRate", "float", 2.0e6),
        Field("bandwidth", "float", 1.0e6),
        Field("center", "list[float]", [0.0]),
        Field("taps", "int", 101),
        Field("heads", "int", 0))   # accepted for YAML compat; derived

    def validate(self) -> None:
        cfg = self.config
        sr, bw = float(cfg["sampleRate"]), float(cfg["bandwidth"])
        if not (np.isfinite(sr) and sr > 0):
            raise ValidationError("sample rate must be positive")
        if not (np.isfinite(bw) and 0 < bw <= sr):
            raise ValidationError(
                "bandwidth must be between 0 and sample rate")
        if int(cfg["taps"]) == 0 or int(cfg["taps"]) % 2 == 0:
            raise ValidationError("number of taps must be odd")
        if not cfg["center"]:
            raise ValidationError("at least one center frequency required")
        half = sr / 2.0
        for i, c in enumerate(cfg["center"]):
            if not np.isfinite(c) or c > half or c < -half:
                raise ValidationError(
                    f"center frequency #{i} out of [-fs/2, fs/2]")

    def create(self) -> Dict[str, TensorSpec]:
        heads = len(self.config["center"])
        taps = int(self.config["taps"])
        centers = [float(c) for c in self.config["center"]]
        return {"coeffs": TensorSpec(
            (heads, taps), DataType.CF32, self.device,
            SignalAxes(sample=1, channel=0),
            attributes={"sampleRate": float(self.config["sampleRate"]),
                        "bandwidth": float(self.config["bandwidth"]),
                        "center": centers[0] if len(centers) == 1
                        else centers})}

    def apply(self, inputs, state):
        taps = ops.windowed_sinc_bandpass(
            int(self.config["taps"]), float(self.config["sampleRate"]),
            float(self.config["bandwidth"]),
            [float(c) for c in self.config["center"]])
        # upload as split re/im and combine on device: complex64
        # host<->device transfers are unimplemented on the axon backend
        coeffs = (jnp.asarray(taps.real.astype(np.float32))
                  + 1j * jnp.asarray(taps.imag.astype(np.float32)))
        return {"coeffs": coeffs.astype(jnp.complex64)}, state


# ---------------------------------------------------------------------------
# rrc_filter (dsp/rrc_filter) — streaming RRC FIR with history state
# ---------------------------------------------------------------------------
@register_module
class RrcFilterModule(Module):
    module_type = "rrc_filter"
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(
        Field("symbolRate", "float", 1.0e6),
        Field("sampleRate", "float", 2.0e6),
        Field("rollOff", "float", 0.35),
        Field("taps", "int", 101))

    def validate(self) -> None:
        cfg = self.config
        if float(cfg["sampleRate"]) < float(cfg["symbolRate"]):
            raise ValidationError("sampleRate must be >= symbolRate")
        if not (0.0 <= float(cfg["rollOff"]) <= 1.0):
            raise ValidationError("roll-off must be in [0, 1]")
        t = int(cfg["taps"])
        if t % 2 == 0 or t < 3:
            raise ValidationError("taps must be odd and >= 3")
        spec = self.input_specs["buffer"]
        if spec.dtype not in (DataType.F32, DataType.CF32):
            raise ValidationError(f"unsupported input dtype {spec.dtype}")
        self._axis = _require_sample_axis(spec, "MODULE_RRC_FILTER")
        self._batch = resolve_signal_axes(spec).batch

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer": self.input_specs["buffer"]}

    def init_state(self):
        spec = self.input_specs["buffer"]
        lanes = spec.size // spec.shape[self._axis]
        if self._batch is not None:
            lanes //= spec.shape[self._batch]
        dt = spec.dtype.jnp_dtype
        return {"history": np.zeros(
            (lanes, int(self.config["taps"]) - 1), dt)}

    def apply(self, inputs, state):
        x = inputs["buffer"]
        taps = jnp.asarray(ops.rrc_taps(
            int(self.config["taps"]), float(self.config["sampleRate"]),
            float(self.config["symbolRate"]), float(self.config["rollOff"])))
        stream, unflatten = _to_lane_stream(x, self._axis, self._batch)
        y, hist = ops.fir_filter_streaming(stream, taps, state["history"],
                                           axis=-1)
        return {"buffer": unflatten(y).astype(x.dtype)}, {"history": hist}


# ---------------------------------------------------------------------------
# overlap_add (dsp/overlap_add) — OLA reconstruction with carried overlap
# ---------------------------------------------------------------------------
@register_module
class OverlapAddModule(Module):
    module_type = "overlap_add"
    input_ports = ("buffer", "overlap")
    output_ports = ("buffer",)

    def validate(self) -> None:
        buf = self.input_specs["buffer"]
        ovl = self.input_specs["overlap"]
        if buf.dtype != ovl.dtype:
            raise ValidationError("buffer/overlap dtype mismatch")
        if buf.dtype not in (DataType.F32, DataType.CF32):
            raise ValidationError(f"unsupported dtype {buf.dtype}")
        if buf.rank != ovl.rank:
            raise ValidationError("buffer/overlap rank mismatch")
        baxes = resolve_signal_axes(buf)
        oaxes = resolve_signal_axes(ovl)
        if (baxes.sample != oaxes.sample or baxes.batch != oaxes.batch
                or baxes.channel != oaxes.channel):
            raise ValidationError("buffer/overlap signal axes must match")
        if baxes.sample is None:
            raise ValidationError("inputs must carry sampleAxis metadata")
        self._axis = baxes.sample
        self._batch = baxes.batch
        if buf.shape[self._axis] < ovl.shape[self._axis]:
            raise ValidationError("overlap larger than buffer")
        for d in range(buf.rank):
            if d != self._axis and buf.shape[d] != ovl.shape[d]:
                raise ValidationError(f"shape mismatch on axis {d}")

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer": self.input_specs["buffer"]}

    def init_state(self):
        ovl = self.input_specs["overlap"]
        shape = list(ovl.shape)
        if self._batch is not None:
            shape[self._batch] = 1
        return {"prev": np.zeros(tuple(shape), ovl.dtype.jnp_dtype)}

    def apply(self, inputs, state):
        buf = inputs["buffer"]
        ovl = inputs["overlap"]
        ax = self._axis
        olen = ovl.shape[ax]
        prev = state["prev"]
        if self._batch is not None:
            b = self._batch
            nb = ovl.shape[b]
            shifted = jnp.concatenate(
                [prev.astype(ovl.dtype),
                 jax.lax.slice_in_dim(ovl, 0, nb - 1, axis=b)], axis=b)
            new_prev = jax.lax.slice_in_dim(ovl, nb - 1, nb, axis=b)
        else:
            shifted = prev.astype(ovl.dtype)
            new_prev = ovl
        head = jax.lax.slice_in_dim(buf, 0, olen, axis=ax) + shifted
        tail = jax.lax.slice_in_dim(buf, olen, buf.shape[ax], axis=ax)
        out = jnp.concatenate([head, tail], axis=ax)
        return {"buffer": out}, {"prev": new_prev}


# ---------------------------------------------------------------------------
# fold (dsp/fold) — polyphase spectral fold (channelizer reduction)
# ---------------------------------------------------------------------------
@register_module
class FoldModule(Module):
    module_type = "fold"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("offset", "int", 0), Field("size", "int", 0))

    def validate(self) -> None:
        if int(self.config["size"]) == 0:
            raise ValidationError("size cannot be zero")
        spec = self.input_specs["buffer"]
        if spec.dtype not in (DataType.F32, DataType.CF32):
            raise ValidationError(f"unsupported dtype {spec.dtype}")
        self._axis = _require_sample_axis(spec, "MODULE_FOLD")
        axes = resolve_signal_axes(spec)
        n = spec.shape[self._axis]
        size = int(self.config["size"])
        if n % size != 0:
            raise ValidationError(
                f"size ({size}) does not divide axis extent ({n})")
        offs = spec.attr("channelOffsets")
        if offs is not None:
            offs = [int(o) for o in offs]
            if axes.channel is None or \
                    len(offs) != spec.shape[axes.channel]:
                raise ValidationError(
                    "channelOffsets must match channelAxis extent")
            for o in offs:
                if o > n:
                    raise ValidationError("channel offset exceeds axis")
        elif int(self.config["offset"]) > n:
            raise ValidationError("offset greater than axis extent")
        self._channel = axes.channel
        self._offsets = offs

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["buffer"]
        size = int(self.config["size"])
        shape = list(spec.shape)
        decim = shape[self._axis] // size
        shape[self._axis] = size
        out = spec.with_shape(shape)
        attrs = dict(out.attributes)
        attrs.pop("channelOffsets", None)
        if "sampleRate" in attrs:
            attrs["sampleRate"] = float(attrs["sampleRate"]) / decim
        return {"buffer": replace(out, attributes=attrs)}

    def apply(self, inputs, state):
        x = inputs["buffer"]
        ax = self._axis
        n = x.shape[ax]
        size = int(self.config["size"])
        decim = n // size
        if self._offsets is None:
            off = int(self.config["offset"]) % n
            y = jnp.roll(x, off, axis=ax)
        else:
            # per-channel circular shift via gather
            offs = jnp.asarray([int(o) % n for o in self._offsets])
            idx = (jnp.arange(n)[None, :] - offs[:, None]) % n  # (C, n)
            y = jnp.moveaxis(x, (self._channel, ax), (0, 1))
            y = jnp.take_along_axis(
                y, idx.reshape(idx.shape + (1,) * (y.ndim - 2)), axis=1)
            y = jnp.moveaxis(y, (0, 1), (self._channel, ax))
        yt = jnp.moveaxis(y, ax, -1)
        yt = yt.reshape(yt.shape[:-1] + (decim, size))
        folded = jnp.mean(yt, axis=-2)
        out = jnp.moveaxis(folded, -1, ax)
        return {"buffer": out.astype(x.dtype)}, state


# ---------------------------------------------------------------------------
# phase_correction (dsp/phase_correction) — per-batch/channel phasor with
# carried phase state
# ---------------------------------------------------------------------------
@register_module
class PhaseCorrectionModule(Module):
    module_type = "phase_correction"
    input_ports = ("signal",)
    output_ports = ("signal",)
    schema = Schema(Field("phaseIncrement", "float", 0.0))

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype != DataType.CF32:
            raise ValidationError("input must be CF32")
        axes = resolve_signal_axes(spec)
        self._batch = axes.batch
        self._channel = axes.channel
        incs = spec.attr("channelPhaseIncrements")
        if incs is not None:
            incs = [float(v) for v in incs]
            if self._channel is None or \
                    len(incs) != spec.shape[self._channel]:
                raise ValidationError(
                    "channelPhaseIncrements must match channelAxis extent")
        self._channel_incs = incs

    def create(self) -> Dict[str, TensorSpec]:
        return {"signal": self.input_specs["signal"]}

    def init_state(self):
        spec = self.input_specs["signal"]
        nch = spec.shape[self._channel] if self._channel is not None else 1
        return {"phases": np.zeros((nch,), jnp.float64)
                if jax.config.jax_enable_x64
                else np.zeros((nch,), jnp.float32)}

    def apply(self, inputs, state):
        x = inputs["signal"]
        spec = self.input_specs["signal"]
        nch = spec.shape[self._channel] if self._channel is not None else 1
        nbatch = spec.shape[self._batch] if self._batch is not None else 1
        if self._channel_incs is not None:
            incs = np.asarray(self._channel_incs, np.float64)
        else:
            incs = np.full((nch,), float(self.config["phaseIncrement"]))
        incs = np.remainder(incs + np.pi, 2 * np.pi) - np.pi  # IEEE rem
        incs_j = jnp.asarray(incs, state["phases"].dtype)

        batch_idx = jnp.arange(nbatch, dtype=state["phases"].dtype)
        phase = state["phases"][:, None] + incs_j[:, None] * batch_idx
        corr = jnp.exp(1j * phase.astype(jnp.float32)).astype(jnp.complex64)

        # broadcast correction onto x along (channel, batch) axes
        shape = [1] * x.ndim
        if self._channel is not None:
            shape[self._channel] = nch
        if self._batch is not None:
            shape[self._batch] = nbatch
        corr_full = corr  # (nch, nbatch)
        if self._channel is None:
            corr_full = corr_full[0]
            if self._batch is None:
                corr_full = corr_full[0]
        elif self._batch is None:
            corr_full = corr_full[:, 0]
        elif self._batch < self._channel:
            corr_full = corr_full.T   # reshape order is (batch, channel)
        corr_b = corr_full.reshape(shape)
        out = x * corr_b

        new_phase = jnp.remainder(
            state["phases"] + incs_j * nbatch + jnp.pi,
            2 * jnp.pi) - jnp.pi
        return {"signal": out}, {"phases": new_phase}


# ---------------------------------------------------------------------------
# signal_generator (dsp/signal_generator) — phase-accumulator source
# ---------------------------------------------------------------------------
@register_module
class SignalGeneratorModule(Module):
    module_type = "signal_generator"
    output_ports = ("signal",)
    schema = Schema(
        Field("signalType", "str", "cosine"),
        Field("signalDataType", "dtype", DataType.F32),
        Field("sampleRate", "float", 1e6),
        Field("frequency", "float", 1000.0),
        Field("amplitude", "float", 1.0),
        Field("phase", "float", 0.0),
        Field("dcOffset", "float", 0.0),
        Field("noiseVariance", "float", 1.0),
        Field("chirpStartFreq", "float", 1000.0),
        Field("chirpEndFreq", "float", 10000.0),
        Field("chirpDuration", "float", 1.0),
        Field("bufferSize", "int", 8192),
        Field("seed", "int", 0))

    _TYPES = ("sine", "cosine", "square", "sawtooth", "triangle", "noise",
              "dc", "chirp")

    def validate(self) -> None:
        if self.config["signalType"] not in self._TYPES:
            raise ValidationError(
                f"unknown signalType '{self.config['signalType']}'")
        dt = DataType.parse(self.config["signalDataType"])
        if dt not in (DataType.F32, DataType.CF32):
            raise ValidationError("signalDataType must be F32 or CF32")
        if int(self.config["bufferSize"]) == 0:
            raise ValidationError("bufferSize cannot be zero")
        if float(self.config["sampleRate"]) <= 0:
            raise ValidationError("sampleRate must be positive")

    def create(self) -> Dict[str, TensorSpec]:
        n = int(self.config["bufferSize"])
        dt = DataType.parse(self.config["signalDataType"])
        return {"signal": TensorSpec(
            (n,), dt, self.device, SignalAxes(sample=0),
            attributes={"frequency": 0.0,
                        "sampleRate": float(self.config["sampleRate"])})}

    def init_state(self):
        # host templates only (np): see FmModule.init_state
        dt = np.float64 if jax.config.jax_enable_x64 else np.float32
        st = {"phase": np.asarray(
            float(self.config["phase"]) % (2 * np.pi), dt)}
        if self.config["signalType"] == "chirp":
            st["chirp_time"] = np.asarray(0.0, dt)
        if self.config["signalType"] == "noise":
            st["key"] = np.asarray(
                jax.random.PRNGKey(int(self.config["seed"])))
        return st

    def apply(self, inputs, state):
        cfg = self.config
        n = int(cfg["bufferSize"])
        sr = float(cfg["sampleRate"])
        amp = float(cfg["amplitude"])
        dc = float(cfg["dcOffset"])
        kind = cfg["signalType"]
        complex_out = DataType.parse(cfg["signalDataType"]) == DataType.CF32
        new_state = dict(state)

        if kind == "dc":
            val = amp + dc
            if complex_out:
                out = jnp.full((n,), val + 1j * val, jnp.complex64)
            else:
                out = jnp.full((n,), val, jnp.float32)
            return {"signal": out}, new_state

        if kind == "noise":
            var = float(cfg["noiseVariance"])
            scale = amp * np.sqrt(max(var, 0.0))
            key, k1, k2 = jax.random.split(state["key"], 3)
            new_state["key"] = key
            if var > 0:
                re = jax.random.normal(k1, (n,)) * scale + dc
            else:
                re = jnp.full((n,), dc)
            if complex_out:
                im = (jax.random.normal(k2, (n,)) * scale + dc) \
                    if var > 0 else jnp.full((n,), dc)
                out = (re + 1j * im).astype(jnp.complex64)
            else:
                out = re.astype(jnp.float32)
            return {"signal": out}, new_state

        if kind == "chirp":
            f0 = float(cfg["chirpStartFreq"])
            f1 = float(cfg["chirpEndFreq"])
            dur = float(cfg["chirpDuration"])
            rate = (f1 - f0) / dur
            dt_ = 1.0 / sr
            t = jnp.remainder(state["chirp_time"] + dt_ * jnp.arange(n),
                              dur)
            inst_freq = f0 + rate * t
            # cumulative phase: integrate frequency stepwise
            dphase = 2.0 * jnp.pi * inst_freq * dt_
            phases = state["phase"] + jnp.concatenate(
                [jnp.zeros((1,)), jnp.cumsum(dphase[:-1])])
            phases = jnp.remainder(phases, 2 * jnp.pi)
            new_state["phase"] = jnp.remainder(
                state["phase"] + jnp.sum(dphase), 2 * jnp.pi)
            new_state["chirp_time"] = jnp.remainder(
                state["chirp_time"] + n * dt_, dur)
            i = amp * jnp.cos(phases) + dc
            if complex_out:
                q = amp * jnp.sin(phases)
                out = (i + 1j * q).astype(jnp.complex64)
            else:
                out = i.astype(jnp.float32)
            return {"signal": out}, new_state

        # periodic phase-accumulator waveforms
        freq = float(cfg["frequency"])
        inc = 2.0 * np.pi * freq / sr
        phases = jnp.remainder(state["phase"] + inc * jnp.arange(n),
                               2 * np.pi)
        new_state["phase"] = jnp.remainder(state["phase"] + inc * n,
                                           2 * np.pi)
        if kind == "sine":
            i = amp * jnp.sin(phases) + dc
            q = amp * jnp.cos(phases)
        elif kind == "cosine":
            i = amp * jnp.cos(phases) + dc
            q = amp * jnp.sin(phases)
        elif kind == "square":
            i = amp * jnp.where(phases < np.pi, 1.0, -1.0) + dc
            q = amp * jnp.where(
                jnp.remainder(phases - np.pi / 2, 2 * np.pi) < np.pi,
                1.0, -1.0)
        elif kind == "sawtooth":
            pv = phases / (2 * np.pi)
            i = amp * (2.0 * pv - 1.0) + dc
            q = i
        else:  # triangle
            pv = phases / (2 * np.pi)
            i = amp * jnp.where(pv < 0.5, 4.0 * pv - 1.0,
                                3.0 - 4.0 * pv) + dc
            q = i
        if complex_out:
            out = (i + 1j * q).astype(jnp.complex64)
        else:
            out = i.astype(jnp.float32)
        return {"signal": out}, new_state


# ---------------------------------------------------------------------------
# block registrations
# ---------------------------------------------------------------------------
for _type in ("window", "fft", "amplitude", "invert", "agc", "am", "fm",
              "squelch", "filter_taps", "rrc_filter", "overlap_add",
              "fold", "phase_correction", "signal_generator"):
    register_block(simple_block(_type))
