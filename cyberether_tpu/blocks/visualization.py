"""visualization/ domain — SURFACE modules.

Reference: /root/reference/src/domains/visualization/ (lineplot,
waterfall, spectrogram, constellation, frame, note).  The reference
renders into GPU framebuffers via compute/draw shaders; the TPU-native
split is: the *reduction* (averaging, scrolling history, heat decay)
runs on-device as module state inside the fused program, and
``present_data`` converts the reduced array to an RGBA frame host-side
(:mod:`cyberether_tpu.viz`), which the web UI / remote stream consumes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from cyberether_tpu.blocks.dsp import resolve_signal_axes
from cyberether_tpu.core.block import Block, BlockContext, simple_block
from cyberether_tpu.core.module import Module
from cyberether_tpu.core.params import Field, Schema
from cyberether_tpu.core.registry import register_block, register_module
from cyberether_tpu.core.tensor import SignalAxes, TensorSpec
from cyberether_tpu.core.types import DataType, Taint, ValidationError
from cyberether_tpu.utils.logging import get_logger
from cyberether_tpu.viz.colormaps import apply_colormap

log = get_logger("visualization")


def _last_axis_view(spec: TensorSpec):
    """Collapse to (frames, width): width = sample axis, everything else
    is treated as stacked frames averaged/scrolled."""
    axes = resolve_signal_axes(spec)
    sample = axes.sample if axes.sample is not None else spec.rank - 1
    return sample


def _axes_meta(spec: TensorSpec, width: int, range_min: float,
               range_max: float) -> Dict[str, Any]:
    """Axis extents for client-side ticks/labels/cursor readout (the
    reference's axis component + lineplot cursor,
    /root/reference/src/domains/visualization/lineplot/
    module_impl.cc:281-458 and src/render/components/axis*).

    x: frequency span from the link's sampleRate/frequency attributes
    (bin index when absent); y: the display dB range."""
    sr = spec.attributes.get("sampleRate")
    fc = float(spec.attributes.get("frequency", 0.0) or 0.0)
    if sr:
        sr = float(sr)
        x = {"min": fc - sr / 2, "max": fc + sr / 2,
             "unit": "Hz", "label": "frequency"}
    else:
        x = {"min": 0.0, "max": float(width), "unit": "bin",
             "label": "bin"}
    return {"x": x, "y": {"min": float(range_min),
                          "max": float(range_max),
                          "unit": "dB", "label": "power"}}


# ---------------------------------------------------------------------------
# lineplot (visualization/lineplot)
# ---------------------------------------------------------------------------
@register_module
class LineplotModule(Module):
    module_type = "lineplot"
    taints = Taint.SURFACE
    input_ports = ("signal",)
    output_ports = ("surface",)
    schema = Schema(
        Field("averaging", "int", 1),
        Field("decimation", "int", 1),
        Field("numberOfVerticalLines", "int", 11),
        Field("numberOfHorizontalLines", "int", 5),
        Field("thickness", "float", 1.0),
        Field("rangeMin", "float", -100.0),
        Field("rangeMax", "float", 0.0))
    #: present-only knobs — live-updatable without a module rebuild
    view_fields = ("numberOfVerticalLines", "numberOfHorizontalLines",
                   "thickness", "rangeMin", "rangeMax")

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype != DataType.F32:
            raise ValidationError("lineplot input must be F32")
        self._axis = _last_axis_view(spec)
        dec = max(int(self.config["decimation"]), 1)
        self._width = spec.shape[self._axis] // dec

    def create(self) -> Dict[str, TensorSpec]:
        return {"surface": TensorSpec((self._width,), DataType.F32,
                                      self.device)}

    def init_state(self):
        if int(self.config["averaging"]) > 1:
            return {"avg": np.zeros((self._width,), jnp.float32),
                    "count": np.zeros((), jnp.int32)}
        return None

    def apply(self, inputs, state):
        x = inputs["signal"]
        dec = max(int(self.config["decimation"]), 1)
        # average all lanes down to one line along the sample axis
        line = jnp.moveaxis(x, self._axis, -1).reshape((-1, x.shape[self._axis]))
        line = jnp.mean(line, axis=0)
        if dec > 1:
            line = line[:self._width * dec].reshape(self._width, dec)
            line = jnp.mean(line, axis=-1)
        n_avg = int(self.config["averaging"])
        if n_avg > 1 and state is not None:
            count = jnp.minimum(state["count"] + 1, n_avg)
            avg = state["avg"] + (line - state["avg"]) / count.astype(
                jnp.float32)
            return {"surface": avg}, {"avg": avg, "count": count}
        return {"surface": line}, state

    def present_data(self, outputs, state):
        line = np.asarray(outputs["surface"])
        return {"line": line, "kind": "lineplot",
                "grid": (int(self.config["numberOfVerticalLines"]),
                         int(self.config["numberOfHorizontalLines"])),
                "thickness": float(self.config["thickness"]),
                "axes": _axes_meta(self.input_specs["signal"],
                                   self._width,
                                   self.config["rangeMin"],
                                   self.config["rangeMax"])}


# ---------------------------------------------------------------------------
# waterfall (visualization/waterfall) — scrolling history
# ---------------------------------------------------------------------------
@register_module
class WaterfallModule(Module):
    module_type = "waterfall"
    taints = Taint.SURFACE
    input_ports = ("signal",)
    output_ports = ("surface", "seq")
    schema = Schema(Field("height", "int", 512),
                    Field("interpolate", "bool", True),
                    Field("zoom", "float", 1.0),
                    Field("offset", "int", 0),
                    Field("rangeMin", "float", -100.0),
                    Field("rangeMax", "float", 0.0))
    #: present-only knobs — zoom/offset ride the editor's wheel/drag
    #: input events; ranges rescale the display without a rebuild
    view_fields = ("zoom", "offset", "rangeMin", "rangeMax")

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype != DataType.F32:
            raise ValidationError("waterfall input must be F32")
        self._axis = _last_axis_view(spec)
        self._width = spec.shape[self._axis]
        self._rows = spec.size // self._width

    def create(self) -> Dict[str, TensorSpec]:
        h = int(self.config["height"])
        return {"surface": TensorSpec((h, self._width), DataType.F32,
                                      self.device),
                # total rows ever scrolled — the delta-stream codec's
                # sync counter (an OUTPUT, not state: present_data must
                # never touch device state, which is donated to the
                # in-flight compute)
                "seq": TensorSpec((), DataType.I32, self.device)}

    def init_state(self):
        h = int(self.config["height"])
        return {"buf": np.zeros((h, self._width), jnp.float32),
                "seq": np.zeros((), jnp.int32)}

    def apply(self, inputs, state):
        x = inputs["signal"]
        rows = jnp.moveaxis(x, self._axis, -1).reshape((-1, self._width))
        nr = rows.shape[0]
        h = int(self.config["height"])
        buf = jnp.roll(state["buf"], -nr, axis=0)
        buf = jax.lax.dynamic_update_slice(buf, rows.astype(jnp.float32),
                                           (h - nr, 0))
        seq = state["seq"] + nr
        return {"surface": buf, "seq": seq}, {"buf": buf, "seq": seq}

    def present_data(self, outputs, state):
        buf = np.asarray(outputs["surface"])
        zoom = max(float(self.config["zoom"]), 1.0)
        off = int(self.config["offset"])
        w = buf.shape[1]
        x0_frac, x1_frac = 0.0, 1.0
        span = w
        if zoom > 1.0:
            span = max(int(w / zoom), 1)
            off = min(max(off, 0), w - span)
            buf = buf[:, off:off + span]
            x0_frac, x1_frac = off / w, (off + span) / w
        else:
            # full width displayed: a stale nonzero stored offset must
            # not leak into view/interactive (wheel-zoom anchoring
            # would recenter from it on the first zoom-in)
            off = 0
        axes = _axes_meta(self.input_specs["signal"], w,
                          self.config["rangeMin"],
                          self.config["rangeMax"])
        fx0, fx1 = axes["x"]["min"], axes["x"]["max"]
        axes["x"]["min"] = fx0 + (fx1 - fx0) * x0_frac
        axes["x"]["max"] = fx0 + (fx1 - fx0) * x1_frac
        axes["y"] = {"min": 0.0, "max": float(buf.shape[0]),
                     "unit": "line", "label": "history"}
        # scroll_seq: total rows ever pushed — the server's delta codec
        # sends only rows since the last frame it shipped; view changes
        # (zoom/offset) force a keyframe
        seq = int(np.asarray(outputs["seq"])) if "seq" in outputs else 0
        return {"frame": apply_colormap(buf), "kind": "waterfall",
                "axes": axes, "scroll_seq": seq,
                "view": [int(off), int(span)],
                "interactive": {"zoom": zoom, "offset": int(off),
                                "width": int(w), "span": int(span)}}


# ---------------------------------------------------------------------------
# spectrogram (visualization/spectrogram) — scrolling heat w/ falloff
# ---------------------------------------------------------------------------
@register_module
class SpectrogramModule(Module):
    module_type = "spectrogram"
    taints = Taint.SURFACE
    input_ports = ("signal",)
    output_ports = ("surface",)
    schema = Schema(Field("height", "int", 256))

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype != DataType.F32:
            raise ValidationError("spectrogram input must be F32")
        self._axis = _last_axis_view(spec)
        self._width = spec.shape[self._axis]

    def create(self) -> Dict[str, TensorSpec]:
        h = int(self.config["height"])
        return {"surface": TensorSpec((h, self._width), DataType.F32,
                                      self.device)}

    def init_state(self):
        h = int(self.config["height"])
        return {"heat": np.zeros((h, self._width), jnp.float32)}

    def apply(self, inputs, state):
        x = inputs["signal"]
        h = int(self.config["height"])
        line = jnp.moveaxis(x, self._axis, -1).reshape((-1, self._width))
        line = jnp.mean(line, axis=0)
        # vertical heat: map value [0,1] to row bucket, splat with decay
        heat = state["heat"] * 0.95
        row = jnp.clip(((1.0 - line) * (h - 1)).astype(jnp.int32), 0, h - 1)
        heat = heat.at[row, jnp.arange(self._width)].add(1.0)
        return {"surface": heat}, {"heat": heat}

    def present_data(self, outputs, state):
        heat = np.asarray(outputs["surface"])
        mx = heat.max() or 1.0
        axes = _axes_meta(self.input_specs["signal"], self._width,
                          -100.0, 0.0)
        return {"frame": apply_colormap(heat / mx),
                "kind": "spectrogram", "axes": axes}


# ---------------------------------------------------------------------------
# constellation (visualization/constellation) — IQ scatter heat
# ---------------------------------------------------------------------------
@register_module
class ConstellationModule(Module):
    module_type = "constellation"
    taints = Taint.SURFACE
    input_ports = ("signal",)
    output_ports = ("surface",)
    schema = Schema(Field("size", "int", 256))

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype != DataType.CF32:
            raise ValidationError("constellation input must be CF32")

    def create(self) -> Dict[str, TensorSpec]:
        s = int(self.config["size"])
        return {"surface": TensorSpec((s, s), DataType.F32, self.device)}

    def init_state(self):
        s = int(self.config["size"])
        return {"heat": np.zeros((s, s), jnp.float32)}

    def apply(self, inputs, state):
        x = inputs["signal"].reshape(-1)
        s = int(self.config["size"])
        heat = state["heat"] * 0.9
        # normalize to [-1.5, 1.5] view box
        xi = jnp.clip(((jnp.real(x) / 3.0 + 0.5) * (s - 1)).astype(
            jnp.int32), 0, s - 1)
        yi = jnp.clip(((jnp.imag(x) / 3.0 + 0.5) * (s - 1)).astype(
            jnp.int32), 0, s - 1)
        heat = heat.at[yi, xi].add(1.0)
        return {"surface": heat}, {"heat": heat}

    def present_data(self, outputs, state):
        heat = np.asarray(outputs["surface"])
        mx = heat.max() or 1.0
        return {"frame": apply_colormap(heat / mx), "kind": "constellation"}


# ---------------------------------------------------------------------------
# frame (visualization/frame) — video frame display
# ---------------------------------------------------------------------------
@register_module
class FrameModule(Module):
    module_type = "frame"
    taints = Taint.SURFACE
    input_ports = ("frame",)
    output_ports = ("surface",)
    schema = Schema(Field("lut", "bool", False))

    def validate(self) -> None:
        spec = self.input_specs["frame"]
        if spec.rank < 2:
            raise ValidationError("frame input must be at least rank 2")

    def create(self) -> Dict[str, TensorSpec]:
        return {"surface": self.input_specs["frame"]}

    def apply(self, inputs, state):
        return {"surface": inputs["frame"]}, state

    def present_data(self, outputs, state):
        img = np.asarray(outputs["surface"])
        if self.config["lut"]:
            rng = img.max() - img.min() or 1.0
            return {"frame": apply_colormap((img - img.min()) / rng),
                    "kind": "frame"}
        return {"frame": img, "kind": "frame"}


# ---------------------------------------------------------------------------
# canvas — retained drawing surface (Sakura Retained::Canvas)
# ---------------------------------------------------------------------------
@register_module
class CanvasModule(Module):
    """App-owned drawing surface (reference retained canvas widget,
    include/jetstream/render/sakura/components/retained/canvas.hh:13-43:
    id/size/clearColor config + an onLayout callback receiving
    framebufferSize/pixelRatio).  The reference records into GPU draw
    lists; here drawing happens host-side through
    :class:`cyberether_tpu.viz.draw.DrawList` at present time and the
    RGBA frame rides the normal surface stream.

    Two drive modes: a Python callback (``set_draw_callback``; the
    superluminal ``canvas()`` API attaches one — gets the DrawList and
    the layout dict each present cycle) or declarative JSON draw commands
    in the ``commands`` config/view field (YAML- and REST-editable:
    ``[{"op": "line", "args": [0, 0, 50, 50], "color": "#00ff88"}]``),
    replayed each frame.
    """

    module_type = "canvas"
    taints = Taint.SURFACE
    input_ports = ()
    output_ports = ()
    schema = Schema(
        Field("width", "int", 512),
        Field("height", "int", 256),
        Field("clearColor", "str", "#101018ff"),
        Field("commands", "str", "[]"))
    view_fields = ("clearColor", "commands")

    def validate(self) -> None:
        w, h = int(self.config["width"]), int(self.config["height"])
        if not (8 <= w <= 4096 and 8 <= h <= 4096):
            raise ValidationError(
                f"canvas size must be 8..4096 (got {w}x{h})")
        # keep an attached callback across reconfigure (validate
        # re-runs on every rebuild; the owner attached once)
        self._draw_cb = getattr(self, "_draw_cb", None)

    def create(self) -> Dict[str, TensorSpec]:
        return {}

    def apply(self, inputs, state):
        return {}, state        # no device compute; present-only

    def set_draw_callback(self, cb) -> None:
        """``cb(drawlist, layout)`` invoked every present cycle.
        Host attachment, dti convention: a reconfigure rebuilds the
        module, so the owner re-attaches (DtiModule.attach_buffer
        precedent); the declarative ``commands`` path rides config
        and needs no re-attach."""
        self._draw_cb = cb

    def _replay(self, dl) -> None:
        import json

        try:
            cmds = json.loads(str(self.config["commands"]) or "[]")
        except Exception:
            return
        if not isinstance(cmds, list):
            return
        allowed = {"clear", "rect", "line", "polyline", "circle",
                   "text", "image"}
        for cmd in cmds[:4096]:
            if not isinstance(cmd, dict):
                continue
            op = cmd.get("op")
            if op not in allowed:
                continue
            args = list(cmd.get("args", []))
            kw = {k: v for k, v in cmd.items()
                  if k not in ("op", "args")}
            try:
                getattr(dl, op)(*args, **kw)
            except Exception:
                continue          # skip malformed commands, keep rest

    def present_data(self, outputs, state):
        from cyberether_tpu.viz.draw import DrawList

        dl = DrawList(int(self.config["width"]),
                      int(self.config["height"]),
                      clear_color=str(self.config["clearColor"]))
        if self._draw_cb is not None:
            try:
                self._draw_cb(dl, dl.layout)
                self._cb_error_logged = False
            except Exception:
                # a bad callback must not kill present, but the user
                # must see WHY the panel is blank — log once per
                # failure streak, not at the present-pump rate
                if not getattr(self, "_cb_error_logged", False):
                    self._cb_error_logged = True
                    log.exception("canvas draw callback failed "
                                  "(panel shows clear color until "
                                  "the callback stops raising)")
        else:
            self._replay(dl)
        return {"frame": dl.rgba, "kind": "frame",
                "layout": dl.layout}


# ---------------------------------------------------------------------------
# note (visualization/note) — markdown annotation, no compute
# ---------------------------------------------------------------------------
class NoteBlock(Block):
    block_type = "note"
    label = "Note"
    summary = "Displays formatted markdown text inside a node."
    schema = Schema(Field("content", "str",
                          "# Note\nWrite your **markdown** here."))

    def build(self, ctx: BlockContext) -> None:
        pass   # no modules, no ports — annotation only


register_block(NoteBlock)

for _type in ("lineplot", "waterfall", "spectrogram", "constellation",
              "frame", "canvas"):
    register_block(simple_block(_type))
