"""psk_demod — PSK carrier/timing recovery.

Reference: /root/reference/src/domains/dsp/psk_demod/ (2148 LoC):
Mueller-Müller timing recovery + Costas carrier loop over a sample
history ring, emitting a fixed block of symbols once enough are pending
(SKIP until then).

TPU mapping: the recovery loop is irreducibly sequential, so it runs as
a ``lax.scan`` over the validated ``maxIterations`` bound with masking
for history exhaustion, vmapped across independent lanes; the
variable-rate output is reconciled through a fixed-capacity pending
ring exactly like the reference.
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from cyberether_tpu.blocks.dsp import resolve_signal_axes
from cyberether_tpu.core.block import simple_block
from cyberether_tpu.core.module import Module, PASS_FLAG
from cyberether_tpu.core.params import Field, Schema
from cyberether_tpu.core.registry import register_block, register_module
from cyberether_tpu.core.tensor import TensorSpec
from cyberether_tpu.core.types import DataType, Taint, ValidationError

_PI = math.pi
_INV_SQRT2 = 0.7071067811865475


def _loop_coefficients(bw: float, damping: float) -> Tuple[float, float]:
    """2nd-order loop alpha/beta (psk_demod/module_impl.cc
    deriveLoopCoefficients, finite-damping branch)."""
    denom = 1.0 + 2.0 * damping * bw + bw * bw
    alpha = (4.0 * damping * bw) / denom
    beta = (4.0 * bw * bw) / denom
    if not (denom > 0 and alpha > 0 and beta > 0):
        raise ValidationError("loop parameters do not produce usable "
                              "finite coefficients")
    return alpha, beta


@register_module
class PskDemodModule(Module):
    module_type = "psk_demod"
    input_ports = ("signal",)
    output_ports = ("signal",)
    schema = Schema(
        Field("pskType", "str", "qpsk"),
        Field("sampleRate", "float", 2000000.0),
        Field("symbolRate", "float", 1000000.0),
        Field("frequencyLoopBandwidth", "float", 0.05),
        Field("timingLoopBandwidth", "float", 0.05),
        Field("dampingFactor", "float", 0.707))

    def validate(self) -> None:
        cfg = self.config
        sr, symr = float(cfg["sampleRate"]), float(cfg["symbolRate"])
        if not (math.isfinite(sr) and sr > 0):
            raise ValidationError("sample rate must be positive")
        if not (math.isfinite(symr) and 0 < symr < sr):
            raise ValidationError("symbol rate must be in (0, sampleRate)")
        for key in ("frequencyLoopBandwidth", "timingLoopBandwidth"):
            v = float(cfg[key])
            if not (0 < v < 1):
                raise ValidationError(f"{key} must be between 0 and 1")
        if float(cfg["dampingFactor"]) <= 0:
            raise ValidationError("damping factor must be positive")
        orders = {"bpsk": 2, "qpsk": 4, "8psk": 8}
        if cfg["pskType"] not in orders:
            raise ValidationError(f"unsupported PSK type {cfg['pskType']}")
        self._order = orders[cfg["pskType"]]

        self._omega_nom = sr / symr
        if self._omega_nom < 2.0:
            raise ValidationError("samples per symbol must be at least 2")
        self._omega_min = max(0.5, self._omega_nom * 0.5)
        self._omega_max = max(self._omega_min + 1e-6,
                              self._omega_nom * 1.5)
        self._freq_alpha, self._freq_beta = _loop_coefficients(
            float(cfg["frequencyLoopBandwidth"]),
            float(cfg["dampingFactor"]))
        self._timing_alpha, self._timing_beta = _loop_coefficients(
            float(cfg["timingLoopBandwidth"]),
            float(cfg["dampingFactor"]))

        spec = self.input_specs["signal"]
        if spec.dtype != DataType.CF32:
            raise ValidationError("input must be CF32")
        axes = resolve_signal_axes(spec)
        if axes.sample is None:
            raise ValidationError("input must carry sampleAxis metadata")
        self._axis = axes.sample
        self._batch = axes.batch
        n_in = spec.shape[self._axis]
        if n_in < int(self._omega_nom):
            raise ValidationError("sample axis too short for one symbol")
        self._n_in = n_in
        self._n_out = int(math.ceil(n_in * symr / sr))
        self._hist_cap = n_in + 1
        self._max_iter = self._n_out * (int(self._omega_nom) + 4)
        self._batch_size = spec.shape[self._batch] \
            if self._batch is not None else 1
        self._out_per_lane = self._n_out * self._batch_size
        self._pend_cap = self._out_per_lane + \
            self._max_iter * self._batch_size
        lanes = spec.size // n_in
        if self._batch is not None:
            lanes //= self._batch_size
        self._lanes = lanes

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["signal"]
        shape = list(spec.shape)
        shape[self._axis] = self._n_out
        out = spec.with_shape(shape)
        return {"signal": out.with_attrs(
            sampleRate=float(self.config["symbolRate"]))}

    def init_state(self):
        # host numpy templates only — see FmModule.init_state: eager
        # jnp complex creation is a poisoning h2d on axon
        L = self._lanes
        c0 = np.zeros((L,), np.complex64)
        return {
            "hist": np.zeros((L, self._hist_cap), np.complex64),
            "occ": np.zeros((L,), np.int32),
            "mu": np.zeros((L,), np.float32),
            "omega": np.full((L,), self._omega_nom, np.float32),
            "index": np.zeros((L,), np.int32),
            "phase": np.zeros((L,), np.float32),
            "freq": np.zeros((L,), np.float32),
            "prev_sym": c0,
            "prev_dec": c0,
            "has_prev": np.zeros((L,), np.bool_),
            "pend": np.zeros((L, self._pend_cap), np.complex64),
            "pend_n": np.zeros((L,), np.int32),
        }

    # -- decision / error functions (module_impl.cc helpers) --------------
    def _decision(self, s):
        if self._order == 2:
            return jnp.where(jnp.real(s) >= 0, 1.0, -1.0) + 0.0j
        if self._order == 4:
            re = jnp.where(jnp.real(s) >= 0, _INV_SQRT2, -_INV_SQRT2)
            im = jnp.where(jnp.imag(s) >= 0, _INV_SQRT2, -_INV_SQRT2)
            return (re + 1j * im).astype(jnp.complex64)
        ph = jnp.angle(s)
        dp = jnp.round(ph / (_PI / 4)) * (_PI / 4)
        return jnp.exp(1j * dp).astype(jnp.complex64)

    def _costas_error(self, s):
        if self._order == 2:
            e = jnp.imag(s) * jnp.where(jnp.real(s) > 0, 1.0, -1.0)
        elif self._order == 4:
            dec = (jnp.where(jnp.real(s) > 0, 1.0, -1.0)
                   + 1j * jnp.where(jnp.imag(s) > 0, 1.0, -1.0))
            e = jnp.imag(s * jnp.conj(dec))
        else:
            ph = jnp.angle(s)
            dp = jnp.round(ph * 4.0 / _PI) * (_PI / 4.0)
            e = jnp.sin(ph - dp)
        return jnp.clip(e, -1.0, 1.0)

    # -- per-lane recovery over one pushed block ---------------------------
    def _recover(self, carry, block):
        """carry: per-lane scalars + hist/pend; block: (n_in,) complex."""
        (hist, occ, mu, omega, index, phase, freq, prev_sym, prev_dec,
         has_prev, pend, pend_n) = carry

        # push block into history (shift-down ring kept left-aligned)
        shift = jnp.maximum(occ + self._n_in - self._hist_cap, 0)
        hist = jnp.roll(hist, -shift)
        occ = occ - shift
        hist = jax.lax.dynamic_update_slice(hist, block, (occ,))
        occ = occ + self._n_in
        index = jnp.maximum(index - shift, 0)

        def body(st, _):
            (mu, omega, index, phase, freq, prev_sym, prev_dec,
             has_prev, pend, pend_n, exhausted) = st
            # mu/index normalization (floor-advance bounded by history)
            k = jnp.maximum(jnp.floor(mu), 0.0).astype(jnp.int32)
            a = jnp.minimum(k, jnp.maximum(occ - 1 - index, 0))
            index2 = index + a
            mu2 = mu - a.astype(jnp.float32)
            b = jnp.minimum(jnp.ceil(jnp.maximum(-mu2, 0.0)
                                     ).astype(jnp.int32), index2)
            index2 = index2 - b
            mu2 = jnp.maximum(mu2 + b.astype(jnp.float32), 0.0)
            now_exhausted = exhausted | (index2 + 1 >= occ)

            s0 = hist[index2]
            s1 = hist[jnp.minimum(index2 + 1, self._hist_cap - 1)]
            frac = jnp.clip(mu2, 0.0, 1.0)
            interp = s0 * (1.0 - frac) + s1 * frac
            corrected = interp * jnp.exp(-1j * phase)
            dec = self._decision(corrected)

            terr = jnp.real(prev_dec * jnp.conj(corrected)
                            - prev_sym * jnp.conj(dec))
            terr = jnp.clip(terr, -1.0, 1.0)
            do_t = has_prev & ~now_exhausted
            omega2 = jnp.where(
                do_t, jnp.clip(omega + self._timing_beta * terr,
                               self._omega_min, self._omega_max), omega)
            mu3 = jnp.where(do_t, mu2 + self._timing_alpha * terr, mu2)

            ferr = self._costas_error(corrected)
            freq2 = jnp.clip(freq + self._freq_beta * ferr, -_PI, _PI)
            phase2 = phase + freq2 + self._freq_alpha * ferr
            phase2 = phase2 - 2.0 * _PI * jnp.round(phase2 / (2 * _PI))

            live = ~now_exhausted
            pend2 = jnp.where(
                live,
                jax.lax.dynamic_update_slice(
                    pend, corrected[None],
                    (jnp.minimum(pend_n, self._pend_cap - 1),)),
                pend)
            pend_n2 = jnp.where(live, pend_n + 1, pend_n)

            new = (jnp.where(live, mu3 + omega2, mu2),
                   jnp.where(live, omega2, omega),
                   jnp.where(live, index2, index2),
                   jnp.where(live, phase2, phase),
                   jnp.where(live, freq2, freq),
                   jnp.where(live, corrected, prev_sym),
                   jnp.where(live, dec, prev_dec),
                   has_prev | live,
                   pend2, pend_n2, now_exhausted)
            return new, None

        st0 = (mu, omega, index, phase, freq, prev_sym, prev_dec,
               has_prev, pend, pend_n,
               jnp.asarray(False))
        (mu, omega, index, phase, freq, prev_sym, prev_dec, has_prev,
         pend, pend_n, _), _ = jax.lax.scan(
            body, st0, None, length=self._max_iter)

        # prune consumed history
        prune = jnp.where(occ > 1, jnp.minimum(index, occ - 1), 0)
        hist = jnp.roll(hist, -prune)
        occ = occ - prune
        index = index - prune
        return (hist, occ, mu, omega, index, phase, freq, prev_sym,
                prev_dec, has_prev, pend, pend_n)

    # ----------------------------------------------------------------------
    def apply(self, inputs, state):
        x = inputs["signal"]
        from cyberether_tpu.blocks.dsp import _to_lane_stream

        # (lanes, batch * n_in) stream; process per batch block
        stream, unflatten_in = _to_lane_stream(x, self._axis, self._batch)
        L, B, N = self._lanes, self._batch_size, self._n_in
        blocks = stream.reshape(L, B, N)

        # emission decision happens BEFORE pushing this cycle's samples
        can_emit = jnp.all(state["pend_n"] >= self._out_per_lane)
        out_syms = state["pend"][:, :self._out_per_lane]
        pend0 = jnp.where(
            can_emit,
            jnp.roll(state["pend"], -self._out_per_lane, axis=1),
            state["pend"])
        pend_n0 = jnp.where(can_emit,
                            state["pend_n"] - self._out_per_lane,
                            state["pend_n"])

        carry = (state["hist"], state["occ"], state["mu"],
                 state["omega"], state["index"], state["phase"],
                 state["freq"], state["prev_sym"], state["prev_dec"],
                 state["has_prev"], pend0, pend_n0)
        recover = jax.vmap(self._recover)
        for b in range(B):
            carry = recover(carry, blocks[:, b, :])
        (hist, occ, mu, omega, index, phase, freq, prev_sym, prev_dec,
         has_prev, pend, pend_n) = carry

        # late emission: symbols may have completed during this cycle
        can_emit2 = (~can_emit) & jnp.all(pend_n >= self._out_per_lane)
        out_syms = jnp.where(can_emit2, pend[:, :self._out_per_lane],
                             out_syms)
        pend = jnp.where(can_emit2,
                         jnp.roll(pend, -self._out_per_lane, axis=1),
                         pend)
        pend_n = jnp.where(can_emit2, pend_n - self._out_per_lane,
                           pend_n)
        emitted = can_emit | can_emit2

        new_state = {"hist": hist, "occ": occ, "mu": mu, "omega": omega,
                     "index": index, "phase": phase, "freq": freq,
                     "prev_sym": prev_sym, "prev_dec": prev_dec,
                     "has_prev": has_prev, "pend": pend,
                     "pend_n": pend_n}

        # shape output: (lanes, batch, n_out) -> input layout
        lane_out = out_syms.reshape(L, B, self._n_out) \
            .reshape(L, B * self._n_out)
        out_shape = list(x.shape)
        out_shape[self._axis] = self._n_out
        _, unflatten_out = _to_lane_stream(
            jnp.zeros(out_shape, x.dtype), self._axis, self._batch)
        out = unflatten_out(lane_out)
        return {"signal": out, PASS_FLAG: emitted,
                "metric:frequencyError": freq[0]}, new_state


register_block(simple_block("psk_demod"))
