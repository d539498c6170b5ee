"""Superluminal implementation.

Reference call path (SURVEY.md §3.5): ``lm.plot`` stores a PlotConfig
wrapping the user's buffer zero-copy; ``lm.show``/``lm.realtime`` build
the hidden flowgraph (dti source per buffer + per-plot block chains,
src/superluminal/base.cc:774-1128) and run the compute/present loops.
"""

from __future__ import annotations

import threading
import time as _time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from cyberether_tpu.core.instance import Instance
from cyberether_tpu.core.types import Device, GraphError
from cyberether_tpu.utils.logging import get_logger

log = get_logger("superluminal")


# ---------------------------------------------------------------------------
# constants (reference python/superluminal/_internal/__init__.py)
# ---------------------------------------------------------------------------
class constant:
    def __init__(self, key: str, value: int):
        self._key, self._value = key, value

    def __repr__(self):
        return f"Constant(value={self._key})"

    @property
    def key(self):
        return self._key

    @property
    def value(self):
        return self._value


real = constant("real", 0)
imag = constant("imag", 1)
amplitude = constant("amplitude", 2)
phase = constant("phase", 3)

time = constant("time", 0)
frequency = constant("frequency", 1)

line = constant("line", 0)
heat = constant("heat", 1)
scatter = constant("scatter", 2)
waterfall = constant("waterfall", 3)

none = constant("none", 0)
cpu = constant("cpu", 1)
tpu = constant("tpu", 2)

_TYPES = {"line", "heat", "scatter", "waterfall"}
_DOMAINS = {"time", "frequency"}
_OPERATIONS = {"real", "imag", "amplitude", "phase"}


@dataclass
class _PlotConfig:
    label: str
    buffer: np.ndarray
    type: constant
    source: constant
    display: constant
    operation: constant
    mosaic: List[List[int]]
    channel_axis: int = -1
    channel_index: int = -1
    options: Dict[str, Any] = field(default_factory=dict)


@dataclass
class _Widget:
    kind: str
    title: str
    mosaic: List[List[int]]
    payload: Any = None


class _State:
    def __init__(self) -> None:
        self.instance: Optional[Instance] = None
        self.plots: List[_PlotConfig] = []
        self.widgets: List[_Widget] = []
        self.dtis: List[Any] = []
        self.started = False
        self.presenting = False
        self.remote_server = None
        self.config: Dict[str, Any] = {}


_state = _State()


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------
def configure(device: constant = none, preferred_device: constant = cpu,
              device_id: int = 0, window_title: str = "Superluminal",
              remote: bool = False, remote_broker: str = "",
              remote_codec: str = "png", remote_encoder: str = "auto",
              remote_auto_join: bool = False, remote_framerate: int = 30,
              remote_port: int = 8765, on_remote_ready=None) -> None:
    _state.config = {
        "window_title": window_title,
        "remote": remote,
        "remote_port": remote_port,
        "remote_framerate": remote_framerate,
        "on_remote_ready": on_remote_ready,
    }


def plot(data: np.ndarray, type: constant, label: str = "",
         mosaic: Optional[List[List[int]]] = None,
         domain: Tuple[constant, constant] = (time, time),
         operation: constant = amplitude, batch_axis: int = -1,
         channel_axis: int = -1, channel_index: int = -1,
         options: Optional[Dict[str, Any]] = None) -> None:
    if not isinstance(data, np.ndarray):
        raise TypeError("Data must be a numpy array.")
    if not isinstance(type, constant) or type.key not in _TYPES:
        raise ValueError(f"Invalid type: {type}")
    for d in domain:
        if not isinstance(d, constant) or d.key not in _DOMAINS:
            raise ValueError(f"Invalid domain: {d}")
    if operation.key not in _OPERATIONS:
        raise ValueError(f"Invalid operation: {operation.key}")
    label = label or f"plot{len(_state.plots)}"
    _state.plots.append(_PlotConfig(
        label=label, buffer=data, type=type, source=domain[0],
        display=domain[1], operation=operation,
        mosaic=mosaic or [[1]], channel_axis=channel_axis,
        channel_index=channel_index, options=dict(options or {})))


def box(title: str, mosaic: List[List[int]], callback) -> None:
    _state.widgets.append(_Widget("box", title, mosaic, callback))


def canvas(title: str, size: Tuple[int, int] = (512, 256),
           draw=None, mosaic: Optional[List[List[int]]] = None,
           clear_color: str = "#101018ff") -> None:
    """Retained drawing surface (reference Canvas widget,
    include/jetstream/render/sakura/components/retained/canvas.hh:13-43
    and the C++ superluminal canvas surface).  ``draw(drawlist,
    layout)`` runs host-side every present cycle with a
    :class:`cyberether_tpu.viz.draw.DrawList` bound to the panel
    framebuffer; ``layout`` carries framebufferSize/pixelRatio (the
    onLayout cognate).  The rasterized RGBA frame streams like any
    other surface."""
    _state.widgets.append(_Widget(
        "canvas", title, mosaic or [[1]],
        (tuple(int(v) for v in size), draw, clear_color)))


def text(label: str, value: str = "") -> None:
    _state.widgets.append(_Widget("text", label, [[1]], value))


def slider(label: str, value: float = 0.0, minimum: float = 0.0,
           maximum: float = 1.0, callback=None) -> float:
    _state.widgets.append(_Widget("slider", label, [[1]],
                                  (value, minimum, maximum, callback)))
    return value


def layout(matrix_height: int, matrix_width: int, panel_height: int,
           panel_width: int, offset_x: int = 0, offset_y: int = 0
           ) -> List[List[int]]:
    """Mosaic helper: a panel_height x panel_width panel at
    (offset_y, offset_x) inside a matrix grid."""
    mosaic = [[0] * matrix_width for _ in range(matrix_height)]
    for r in range(offset_y, min(offset_y + panel_height, matrix_height)):
        for c in range(offset_x,
                       min(offset_x + panel_width, matrix_width)):
            mosaic[r][c] = 1
    return mosaic


def start() -> None:
    if _state.started:
        return
    _build()
    _state.instance.start()
    _state.started = True
    _state.presenting = True


def show(duration: Optional[float] = None) -> None:
    """Run until interrupted (or ``duration`` seconds in headless use)."""
    start()
    try:
        t0 = _time.monotonic()
        while _state.presenting:
            if duration is not None and \
                    _time.monotonic() - t0 >= duration:
                break
            _time.sleep(0.02)
    except KeyboardInterrupt:
        pass
    stop()
    terminate()


def running() -> bool:
    return _state.presenting


# -- reference binding aliases (python/superluminal/superluminal.cc:133-177) --
def initialize(config: Optional[Dict[str, Any]] = None) -> None:
    configure(**(config or {}))


def presenting() -> bool:
    return _state.presenting


def poll_events(wait: bool = True) -> bool:
    if wait:
        _time.sleep(0.02)
    return _state.presenting


def mosaic_layout(*args, **kwargs) -> List[List[int]]:
    return layout(*args, **kwargs)


def remote_room_id() -> str:
    return "local"


def remote_invite_url() -> str:
    port = int(_state.config.get("remote_port", 8765))
    return f"http://localhost:{port}"


def remote_access_token() -> str:
    return ""


def print_remote_info() -> None:
    print(f"room: {remote_room_id()}  url: {remote_invite_url()}")


def update() -> None:
    """Mark plot buffers dirty (dti sources re-read them each cycle, so
    this is a pacing hint kept for API parity)."""
    for dti in _state.dtis:
        dti.mark_dirty()


def realtime(callback: Callable[[], None]) -> None:
    start()
    t = threading.Thread(target=callback, daemon=True)
    t.start()
    try:
        while _state.presenting and t.is_alive():
            _time.sleep(0.02)
    except KeyboardInterrupt:
        pass
    _state.presenting = False
    t.join(timeout=2.0)
    stop()
    terminate()


def stop() -> None:
    _state.presenting = False
    if _state.instance is not None:
        _state.instance.stop()
    if _state.remote_server is not None:
        _state.remote_server.stop()
        _state.remote_server = None
    _state.started = False


def terminate() -> None:
    stop()
    if _state.instance is not None:
        _state.instance.destroy()
    _state.instance = None
    _state.plots.clear()
    _state.widgets.clear()
    _state.dtis.clear()


def instance() -> Optional[Instance]:
    return _state.instance


def present() -> Dict[str, Any]:
    """Fetch the current rendered surface data (headless display)."""
    if _state.instance is None:
        return {}
    return _state.instance.present().get("superluminal", {})


# ---------------------------------------------------------------------------
# graph construction (base.cc:774-1128 buildXPlotGraph)
# ---------------------------------------------------------------------------
def _build() -> None:
    from cyberether_tpu.blocks.dti import DtiModule  # registration

    inst = Instance(headless=True)
    fg = inst.flowgraph_create("superluminal")
    _state.instance = inst
    _state.dtis = []

    from cyberether_tpu.core.types import DataType

    for i, cfg in enumerate(_state.plots):
        src = f"dti{i}"
        fg.block_create(src, "dti", {
            "label": cfg.label,
            "shape": list(cfg.buffer.shape),
            "dataType": DataType.from_np(cfg.buffer.dtype).value})
        rec = fg.records[src]
        dti_mod = rec.build.modules[f"{src}/m"]
        dti_mod.attach_buffer(cfg.buffer)
        _state.dtis.append(dti_mod)
        out = f"${{graph.{src}.output.buffer}}"

        if cfg.channel_axis >= 0 and cfg.channel_index >= 0:
            # per-channel plot (interferometer example shape): slice
            # the selected channel out before the plot chain
            toks = [":"] * cfg.buffer.ndim
            toks[cfg.channel_axis] = str(cfg.channel_index)
            fg.block_create(f"ch{i}", "slice",
                            {"slice": "[" + ", ".join(toks) + "]"},
                            {"buffer": out})
            out = f"${{graph.ch{i}.output.buffer}}"

        needs_fft = (cfg.source.key == "time"
                     and cfg.display.key == "frequency")
        if cfg.type.key == "scatter":
            fg.block_create(f"plot{i}", "constellation", {},
                            {"signal": out})
            continue
        if needs_fft:
            fg.block_create(
                f"spec{i}", "spectrum_engine",
                {"enableScale": True,
                 "rangeMin": cfg.options.get("range_min", -120.0),
                 "rangeMax": cfg.options.get("range_max", 0.0)},
                {"buffer": out})
            feed = f"${{graph.spec{i}.output.buffer}}"
        else:
            fg.block_create(f"op{i}", "component",
                            {"operation": cfg.operation.key},
                            {"buffer": out})
            fg.block_create(
                f"rng{i}", "range",
                {"min": cfg.options.get("range_min", -1.0),
                 "max": cfg.options.get("range_max", 1.0)},
                {"signal": f"${{graph.op{i}.output.buffer}}"})
            feed = f"${{graph.rng{i}.output.signal}}"

        if cfg.type.key in ("waterfall", "heat"):
            fg.block_create(f"plot{i}", "waterfall",
                            {"height":
                             cfg.options.get("height", 512)},
                            {"signal": feed})
        else:
            fg.block_create(f"plot{i}", "lineplot", {},
                            {"signal": feed})

    for i, w in enumerate(_state.widgets):
        if w.kind != "canvas":
            continue
        (cw, ch), draw_cb, clear = w.payload
        name = f"canvas{i}"
        fg.block_create(name, "canvas",
                        {"width": cw, "height": ch,
                         "clearColor": clear})
        if draw_cb is not None:
            fg.records[name].build.modules[f"{name}/m"] \
                .set_draw_callback(draw_cb)

    if _state.config.get("remote"):
        from cyberether_tpu.remote.server import RemoteServer

        port = int(_state.config.get("remote_port", 8765))
        _state.remote_server = RemoteServer(
            inst, port=port,
            fps=float(_state.config.get("remote_framerate", 30)))
        _state.remote_server.start()
        cb = _state.config.get("on_remote_ready")
        if callable(cb):
            cb(lambda *a: None, "local", f"http://localhost:{port}", "")
