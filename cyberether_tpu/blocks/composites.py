"""Composite blocks (block-only, no own module — ⊙ in SURVEY.md §2.4):
spectrum_engine, decimator, filter.  filter_engine lives in its own
module (:mod:`cyberether_tpu.blocks.filter_engine`).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from cyberether_tpu.blocks.dsp import resolve_signal_axes
from cyberether_tpu.core.block import Block, BlockContext
from cyberether_tpu.core.params import Field, Schema
from cyberether_tpu.core.registry import register_block
from cyberether_tpu.core.types import DataType, ValidationError


# ---------------------------------------------------------------------------
# spectrum_engine (dsp/spectrum_engine/block_impl.cc:120-215):
# cast(CF32) -> window -> invert -> reshape -> multiply -> fft
#   -> [agc(tile=N)] -> amplitude -> [range]
# ---------------------------------------------------------------------------
@register_block
class SpectrumEngineBlock(Block):
    block_type = "spectrum_engine"
    label = "Spectrum Engine"
    summary = "Computes spectra with windowing, FFT, and optional scaling."
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(
        Field("enableAgc", "bool", False),
        Field("enableScale", "bool", False),
        Field("rangeMin", "float", -120.0),
        Field("rangeMax", "float", 0.0),
        Field("fastMath", "bool", False))

    def build(self, ctx: BlockContext) -> None:
        spec = ctx.input_spec("buffer")
        axes = resolve_signal_axes(spec)
        if axes.sample is None:
            raise ValidationError(
                "[BLOCK_SPECTRUM_ENGINE] input must carry sampleAxis")
        axis = axes.sample
        n = spec.shape[axis]

        cast = ctx.module("cast_input", "cast", {"outputType": "CF32"},
                          {"buffer": ctx.input_ref("buffer")})
        win = ctx.module("window", "window", {"size": n})
        inv = ctx.module("invert", "invert", {}, {"signal": win["window"]})
        shape = [1] * spec.rank
        shape[axis] = n
        rsh = ctx.module("reshape_window", "reshape", {"shape": shape},
                         {"buffer": inv["signal"]})
        sax = ctx.module("axes_window", "signal_axes",
                         {"axes": f"sample={axis}"},
                         {"buffer": rsh["buffer"]})
        mul = ctx.module("multiply", "multiply", {},
                         {"a": cast["buffer"], "b": sax["buffer"]})
        # eligible power-of-two*128 transforms ride the fused pallas
        # FFT (measured 16.2 vs 12.5 Gsamp/s for XLA's FFT); other
        # shapes keep the generic provider
        from cyberether_tpu.blocks.dsp import fft_pallas_eligible
        from cyberether_tpu.core.tensor import TensorSpec
        from cyberether_tpu.core.types import DataType

        from cyberether_tpu.core.types import Device

        cf_spec = TensorSpec(spec.shape, DataType.CF32, spec.device)
        # pick pallas only for device-default (TPU) placement; a
        # 'device: cpu' composite would run the Mosaic kernel
        # interpreted — slower than XLA's fft
        prov = "pallas" if (fft_pallas_eligible(cf_spec, axis)
                            and self.device != Device.CPU) \
            else None
        fft = ctx.module("fft", "fft", {"forward": True},
                         {"signal": mul["product"]}, provider=prov)
        tail = fft["signal"]
        if self.config["enableAgc"]:
            agc = ctx.module("agc", "agc", {"tileSize": n},
                             {"signal": tail})
            tail = agc["signal"]
        amp = ctx.module("amplitude", "amplitude",
                         {"fastMath": self.config["fastMath"]},
                         {"signal": tail})
        out = amp["signal"]
        if self.config["enableScale"]:
            rng = ctx.module("range", "range",
                             {"min": self.config["rangeMin"],
                              "max": self.config["rangeMax"]},
                             {"signal": out})
            out = rng["signal"]
        ctx.expose("buffer", out)


# ---------------------------------------------------------------------------
# decimator (dsp/decimator/block_impl.cc): reshape (split sample axis by
# ratio) -> arithmetic add along child axis -> squeeze -> duplicate
# ---------------------------------------------------------------------------
@register_block
class DecimatorBlock(Block):
    block_type = "decimator"
    label = "Decimator"
    summary = "Integer decimation by summing adjacent samples."
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("ratio", "int", 4))

    def validate(self) -> None:
        if int(self.config["ratio"]) == 0:
            raise ValidationError("ratio cannot be zero")

    def build(self, ctx: BlockContext) -> None:
        spec = ctx.input_spec("buffer")
        axes = resolve_signal_axes(spec)
        if axes.sample is None:
            raise ValidationError("[BLOCK_DECIMATOR] input must carry "
                                  "sampleAxis")
        axis = axes.sample
        ratio = int(self.config["ratio"])
        n = spec.shape[axis]
        if n % ratio != 0:
            raise ValidationError(
                f"ratio ({ratio}) does not divide axis extent ({n})")
        shape = list(spec.shape)
        shape[axis] = n // ratio
        shape.insert(axis + 1, ratio)
        rsh = ctx.module("reshape", "reshape", {"shape": shape},
                         {"buffer": ctx.input_ref("buffer")})
        # restore axis roles shifted by the split
        roles = []
        for name_, v in (("sample", axes.sample), ("batch", axes.batch),
                         ("channel", axes.channel)):
            if v is not None:
                roles.append(f"{name_}={v if v <= axis else v + 1}")
        sax = ctx.module("axes", "signal_axes", {"axes": ",".join(roles)},
                         {"buffer": rsh["buffer"]})
        arith = ctx.module("arithmetic", "arithmetic",
                           {"operation": "add", "axis": axis + 1},
                           {"buffer": sax["buffer"]})
        sq = ctx.module("squeeze_dims", "squeeze_dims", {"axis": axis + 1},
                        {"buffer": arith["buffer"]})
        dup = ctx.module("duplicate", "duplicate", {},
                         {"buffer": sq["buffer"]})
        ctx.expose("buffer", dup["buffer"])


# ---------------------------------------------------------------------------
# filter (dsp/filter) — all-in-one FIR filter: windowed-sinc taps
# designer + the full overlap-add engine chain
# (src/domains/dsp/filter/block_impl.cc:315-580 builds filter_taps plus
# the same composition as filter_engine).
# ---------------------------------------------------------------------------
@register_block
class FilterBlock(Block):
    block_type = "filter"
    label = "Filter"
    summary = "FIR band-pass filter (designer + overlap-add engine)."
    input_ports = ("signal",)
    output_ports = ("buffer", "coeffs")
    schema = Schema(
        Field("sampleRate", "float", 2.0e6),
        Field("bandwidth", "float", 1.0e6),
        Field("center", "list[float]", [0.0]),
        Field("taps", "int", 101),
        Field("heads", "int", 0))

    def build(self, ctx: BlockContext) -> None:
        from cyberether_tpu.blocks.filter_engine import \
            compose_filter_engine

        taps = ctx.module("filter_taps", "filter_taps", {
            "sampleRate": self.config["sampleRate"],
            "bandwidth": self.config["bandwidth"],
            "center": self.config["center"],
            "taps": self.config["taps"]})
        out = compose_filter_engine(self, ctx, ctx.input_ref("signal"),
                                    taps["coeffs"])
        ctx.expose("buffer", out)
        ctx.expose("coeffs", taps["coeffs"])
