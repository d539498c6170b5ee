"""filter_engine — overlap-add frequency-domain FIR engine with
integer-ratio resampler heuristics.

Reference: /root/reference/src/domains/dsp/filter_engine/block_impl.cc
(:29-120 resample heuristics, :432-649 composition):

    cast -> [expand_dims] -> pad(T-1) ->  FFT ─┐
    cast filter ----------> pad(N-1) ->  FFT ──┴ multiply
      -> [fold(resamplerSize, offsets)] -> IFFT -> normalize(1/len)
      -> [phase_correction] -> unpad(padSize) -> overlap_add

The entire chain compiles into ONE fused XLA program per cycle; only
the overlap_add history and phase_correction phases persist as state.
On a sharded mesh the channel (multi-head) axis maps onto the mesh
'channels' axis (see cyberether_tpu.parallel).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np

from cyberether_tpu.blocks.dsp import resolve_signal_axes
from cyberether_tpu.core.block import Block, BlockContext
from cyberether_tpu.core.params import Schema
from cyberether_tpu.core.registry import register_block
from cyberether_tpu.core.types import DataType, ValidationError
from cyberether_tpu.utils.logging import get_logger

log = get_logger("filter_engine")


class _Plan:
    resample = False
    sample_axis = 0
    filter_sample_axis = 0
    multi_head = False
    convolution_size = 0
    pad_size = 0
    resampler_offsets: List[int] = []
    resampler_size = 0
    resampled_sample_rate = 0.0


def _resample_heuristics(sample_rate: Optional[float],
                         bandwidth: Optional[float],
                         centers: Optional[List[float]],
                         combined: int, plan: _Plan) -> None:
    """block_impl.cc:44-176 CalculateResampleHeuristics."""
    if sample_rate is None or bandwidth is None or centers is None:
        log.warning("bypassing resampling: filter lacks attributes")
        return
    if sample_rate <= 0 or bandwidth <= 0:
        return
    ratio = sample_rate / bandwidth
    if not math.isfinite(ratio) or ratio <= 0:
        return
    if ratio != math.floor(ratio):
        log.warning("bypassing resampling: bandwidth not an integer "
                    "divisor of sample rate")
        return
    ratio = int(ratio)
    if plan.pad_size % ratio != 0:
        log.warning("bypassing resampling: taps-1 not a multiple of ratio")
        return
    if combined % ratio != 0:
        log.warning("bypassing resampling: combined size not a multiple "
                    "of ratio")
        return
    plan.resampler_offsets = [0] * len(centers)
    freq_per_bin = sample_rate / combined
    for head, center in enumerate(centers):
        if center == 0.0:
            continue
        center_bin = center / freq_per_bin
        rounded = round(center_bin)
        fold_offset = -rounded
        plan.resampler_offsets[head] = int(fold_offset) % combined
        if center_bin != rounded:
            log.warning("output shifted: center %.2f MHz not a multiple "
                        "of bin width", center / 1e6)
    plan.resampler_size = combined // ratio
    plan.pad_size //= ratio
    plan.resampled_sample_rate = sample_rate / ratio
    plan.resample = True


def compose_filter_engine(block: Block, ctx: BlockContext,
                          signal_ref, filter_ref):
    """Build the overlap-add engine chain from resolvable port refs and
    return the output ref.  Shared by the ``filter_engine`` block and
    the all-in-one ``filter`` block (the reference's filter/block_impl.cc
    reuses the same composition with its own taps module)."""
    sig_spec = ctx.resolve_spec(signal_ref)
    flt_spec = ctx.resolve_spec(filter_ref)
    return _compose(block, ctx, signal_ref, sig_spec, filter_ref,
                    flt_spec)


@register_block
class FilterEngineBlock(Block):
    block_type = "filter_engine"
    label = "Filter Engine"
    summary = "Overlap-add frequency-domain FIR with integer resampling."
    input_ports = ("signal", "filter")
    output_ports = ("buffer",)
    schema = Schema()

    def build(self, ctx: BlockContext) -> None:
        out = compose_filter_engine(self, ctx, ctx.input_ref("signal"),
                                    ctx.input_ref("filter"))
        ctx.expose("buffer", out)


def _compose(self: Block, ctx: BlockContext, signal_ref, sig_spec,
             filter_ref, flt_spec):

        for who, spec in (("signal", sig_spec), ("filter", flt_spec)):
            if spec.dtype not in (DataType.F32, DataType.CF32):
                raise ValidationError(
                    f"[BLOCK_FILTER_ENGINE] {who} must be F32 or CF32")
        if not (1 <= flt_spec.rank <= 2):
            raise ValidationError(
                "[BLOCK_FILTER_ENGINE] filter must be rank 1 or 2")

        sig_axes = resolve_signal_axes(sig_spec)
        flt_axes = resolve_signal_axes(flt_spec)
        if sig_axes.sample is None:
            raise ValidationError(
                "[BLOCK_FILTER_ENGINE] signal must carry sampleAxis")
        if flt_spec.rank == 1 and flt_axes.sample != 0:
            raise ValidationError(
                "[BLOCK_FILTER_ENGINE] rank-1 filter needs sampleAxis=0")
        if flt_spec.rank == 2 and (flt_axes.sample != 1
                                   or flt_axes.channel != 0):
            raise ValidationError(
                "[BLOCK_FILTER_ENGINE] rank-2 filter needs channelAxis=0, "
                "sampleAxis=1")

        plan = _Plan()
        plan.multi_head = flt_spec.rank == 2 and flt_axes.channel == 0
        if plan.multi_head and sig_axes.channel is not None:
            raise ValidationError(
                "[BLOCK_FILTER_ENGINE] cannot add filter channels to a "
                "channelized signal")
        plan.sample_axis = sig_axes.sample
        plan.filter_sample_axis = flt_axes.sample
        signal_size = sig_spec.shape[plan.sample_axis]
        filter_size = flt_spec.shape[plan.filter_sample_axis]
        heads = flt_spec.shape[0] if plan.multi_head else 1
        plan.convolution_size = signal_size + filter_size - 1
        plan.pad_size = filter_size - 1

        centers = flt_spec.attr("center")
        if centers is not None:
            if np.isscalar(centers):
                centers = [float(centers)] * heads
            else:
                centers = [float(c) for c in centers]
                if len(centers) != heads:
                    raise ValidationError(
                        "[BLOCK_FILTER_ENGINE] center metadata must match "
                        "filter channel extent")
        sr = flt_spec.attr("sampleRate")
        bw = flt_spec.attr("bandwidth")
        _resample_heuristics(
            None if sr is None else float(sr),
            None if bw is None else float(bw),
            centers, plan.convolution_size, plan)

        # ---- composition ------------------------------------------------
        cast_sig = ctx.module("cast_signal", "cast",
                              {"outputType": "CF32"},
                              {"buffer": signal_ref})
        cast_flt = ctx.module("cast_filter", "cast",
                              {"outputType": "CF32"},
                              {"buffer": filter_ref})
        signal_ref = cast_sig["buffer"]
        sample_axis = plan.sample_axis

        # output axes (heads inserted at the sample axis position)
        out_roles: Dict[str, int] = {}
        if plan.multi_head:
            out_roles["channel"] = plan.sample_axis
            out_roles["sample"] = plan.sample_axis + 1
            if sig_axes.batch is not None:
                out_roles["batch"] = (sig_axes.batch + 1
                                      if sig_axes.batch >= plan.sample_axis
                                      else sig_axes.batch)
        else:
            out_roles["sample"] = plan.sample_axis
            if sig_axes.batch is not None:
                out_roles["batch"] = sig_axes.batch
            if sig_axes.channel is not None:
                out_roles["channel"] = sig_axes.channel
        roles_str = ",".join(f"{k}={v}" for k, v in out_roles.items())

        if plan.multi_head:
            exp = ctx.module("expand_signal", "expand_dims",
                             {"axis": plan.sample_axis},
                             {"buffer": signal_ref})
            sax0 = ctx.module("axes_signal", "signal_axes",
                              {"axes": roles_str}, {"buffer": exp["buffer"]})
            signal_ref = sax0["buffer"]
            sample_axis += 1

        pad_sig = ctx.module("padSignal", "pad",
                             {"size": filter_size - 1, "axis": sample_axis},
                             {"unpadded": signal_ref})
        pad_flt = ctx.module("padFilter", "pad",
                             {"size": signal_size - 1,
                              "axis": plan.filter_sample_axis},
                             {"unpadded": cast_flt["buffer"]})
        fft_sig = ctx.module("fftSignal", "fft", {"forward": True},
                             {"signal": pad_sig["padded"]})
        fft_flt = ctx.module("fftFilter", "fft", {"forward": True},
                             {"signal": pad_flt["padded"]})

        # reshape filter spectrum for broadcasting against the signal
        sig_rank = (sig_spec.rank + 1) if plan.multi_head else sig_spec.rank
        bshape = [1] * sig_rank
        if plan.multi_head:
            bshape[plan.sample_axis] = heads
        bshape[sample_axis] = plan.convolution_size
        flt_ref = fft_flt["signal"]
        if tuple(bshape) != fft_flt.module_obj.output_specs["signal"].shape:
            rsh = ctx.module("reshape_filter", "reshape",
                             {"shape": bshape}, {"buffer": flt_ref})
            flt_ref = rsh["buffer"]
        flt_roles = [f"sample={sample_axis}"]
        if plan.multi_head:
            flt_roles.append(f"channel={plan.sample_axis}")
        sax_f = ctx.module("axes_filter", "signal_axes",
                           {"axes": ",".join(flt_roles)},
                           {"buffer": flt_ref})

        mul = ctx.module("multiply", "multiply", {},
                         {"a": fft_sig["signal"], "b": sax_f["buffer"]})
        sax_p = ctx.module("axes_product", "signal_axes",
                           {"axes": roles_str}, {"buffer": mul["product"]})
        product = sax_p["buffer"]

        apply_phase = plan.resample and any(plan.resampler_offsets)
        ifft_in = product
        if plan.resample:
            attrs_cfg: Dict[str, object] = {"remove": ["channelOffsets"]}
            if plan.multi_head:
                attrs_cfg = {"set": {"channelOffsets":
                                     list(plan.resampler_offsets)}}
            att = ctx.module("attrs_product", "attributes", attrs_cfg,
                             {"buffer": product})
            fold = ctx.module(
                "fold", "fold",
                {"offset": 0 if plan.multi_head
                 else plan.resampler_offsets[0],
                 "size": plan.resampler_size},
                {"buffer": att["buffer"]})
            ifft_in = fold["buffer"]

        ifft = ctx.module("ifft", "fft", {"forward": False},
                          {"signal": ifft_in})
        out_len = (plan.resampler_size if plan.resample
                   else plan.convolution_size)
        norm = ctx.module("normalize", "multiply_constant",
                          {"constant": 1.0 / out_len},
                          {"factor": ifft["signal"]})
        tail = norm["product"]

        if apply_phase:
            if plan.multi_head:
                incs = [math.remainder(
                    2.0 * math.pi * off * signal_size
                    / plan.convolution_size, 2.0 * math.pi)
                    for off in plan.resampler_offsets]
                att2 = ctx.module("attrs_phase", "attributes",
                                  {"set": {"channelPhaseIncrements": incs}},
                                  {"buffer": tail})
                pc_in = att2["buffer"]
                pc_cfg = {"phaseIncrement": 0.0}
            else:
                pc_in = tail
                pc_cfg = {"phaseIncrement": math.remainder(
                    2.0 * math.pi * plan.resampler_offsets[0] * signal_size
                    / plan.convolution_size, 2.0 * math.pi)}
            pc = ctx.module("phase_correction", "phase_correction", pc_cfg,
                            {"signal": pc_in})
            tail = pc["signal"]

        if plan.pad_size > 0:
            unpad = ctx.module("unpad", "unpad",
                               {"size": plan.pad_size, "axis": sample_axis},
                               {"padded": tail})
            ola = ctx.module("overlap", "overlap_add", {},
                             {"buffer": unpad["unpadded"],
                              "overlap": unpad["pad"]})
            tail = ola["buffer"]

        final_attrs: Dict[str, object] = {}
        if plan.resample:
            final_attrs["sampleRate"] = plan.resampled_sample_rate
        fin = ctx.module("axes_out", "signal_axes", {"axes": roles_str},
                         {"buffer": tail})
        out_ref = fin["buffer"]
        if final_attrs:
            att3 = ctx.module("attrs_out", "attributes",
                              {"set": final_attrs}, {"buffer": out_ref})
            out_ref = att3["buffer"]
        return out_ref
