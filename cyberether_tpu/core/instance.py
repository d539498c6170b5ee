"""Instance — application root.

Reference: /root/reference/src/instance.cc (owns viewport + render +
compositor + remote + flowgraph map; compute:415 / present:456 /
poll:578) and the two-thread model of src/run_native.cc:808-871 (compute
thread loops ``instance->compute()``, present thread loops
``instance->present()``).

Here the Instance owns a map of flowgraphs and the compute/present
threads; "render" is the host-side visualization service
(:mod:`cyberether_tpu.viz`), attached on demand.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, Dict, List, Optional

from cyberether_tpu.core.flowgraph import Flowgraph
from cyberether_tpu.core.types import Device, GraphError
from cyberether_tpu.utils.logging import get_logger

log = get_logger("instance")


class Instance:
    def __init__(self, headless: bool = True,
                 default_device: Device = Device.TPU):
        self.headless = headless
        self.default_device = default_device
        self.flowgraphs: Dict[str, Flowgraph] = {}
        self._computing = False
        self._presenting = False
        self._compute_thread: Optional[threading.Thread] = None
        self._present_thread: Optional[threading.Thread] = None
        self._present_cb: Optional[Callable[[Dict[str, Any]], None]] = None
        self._lock = threading.RLock()
        self._errors: List[BaseException] = []

    # -- flowgraph management ----------------------------------------------
    def flowgraph_create(self, name: str = "main") -> Flowgraph:
        with self._lock:
            if name in self.flowgraphs:
                raise GraphError(f"flowgraph '{name}' already exists")
            fg = Flowgraph(name=name, default_device=self.default_device)
            self.flowgraphs[name] = fg
            return fg

    def flowgraph_import(self, path_or_yaml: str,
                         name: str = "main") -> Flowgraph:
        with self._lock:
            if path_or_yaml.lstrip().startswith(("---", "version:", "graph:",
                                                 "title:", "protocolVersion"
                                                 )) or "\n" in path_or_yaml:
                fg = Flowgraph.from_yaml(path_or_yaml, name=name,
                                         default_device=self.default_device)
            else:
                fg = Flowgraph.from_file(path_or_yaml, name=name,
                                         default_device=self.default_device)
            self.flowgraphs[name] = fg
            return fg

    def flowgraph_destroy(self, name: str) -> None:
        with self._lock:
            fg = self.flowgraphs.pop(name, None)
            if fg is not None:
                fg.stop()

    # -- one-shot cycles ----------------------------------------------------
    def compute(self, timeout: Optional[float] = None) -> bool:
        worked = False
        for fg in list(self.flowgraphs.values()):
            worked |= fg.compute(timeout=timeout)
        return worked

    def present(self) -> Dict[str, Dict[str, Any]]:
        out: Dict[str, Dict[str, Any]] = {}
        for name, fg in list(self.flowgraphs.items()):
            data = fg.present()
            if data:
                out[name] = data
        return out

    # -- threaded loop (run_native.cc:808-871) ------------------------------
    def start(self, present_hz: float = 60.0,
              present_cb: Optional[Callable[[Dict[str, Any]], None]] = None
              ) -> None:
        if self._computing:
            return
        self._present_cb = present_cb
        self._computing = True
        self._presenting = True

        def compute_loop() -> None:
            while self._computing:
                try:
                    if not self.compute(timeout=0.1):
                        time.sleep(0.001)
                except Exception as e:  # stop cleanly on compute errors
                    log.exception("compute loop error")
                    self._errors.append(e)
                    self._computing = False

        def present_loop() -> None:
            period = 1.0 / present_hz
            while self._presenting:
                t0 = time.monotonic()
                try:
                    # present_data is DESTRUCTIVE for streaming
                    # surfaces (the audio ring drains on read): only
                    # pump frames when someone consumes them — a
                    # serving RemoteServer runs its own pump (r5
                    # review finding: the no-op pump stole ~2/3 of
                    # every WS client's PCM chunks)
                    if self._present_cb is not None:
                        frames = self.present()
                        if frames:
                            self._present_cb(frames)
                except Exception:  # present must never kill compute
                    log.exception("present loop error")
                dt = time.monotonic() - t0
                if dt < period:
                    time.sleep(period - dt)

        self._compute_thread = threading.Thread(
            target=compute_loop, name="ce-compute", daemon=True)
        self._present_thread = threading.Thread(
            target=present_loop, name="ce-present", daemon=True)
        self._compute_thread.start()
        self._present_thread.start()

    def stop(self) -> None:
        self._computing = False
        self._presenting = False
        for t in (self._compute_thread, self._present_thread):
            # wait for the thread however long its in-flight device
            # call takes: a daemon thread killed inside a tunnel
            # dispatch/compile aborts the whole process at interpreter
            # exit ("FATAL: exception not rethrown"); a cold graph
            # build through the tunnel is ~30-60 s, so this is a real
            # wait, not a hang (Ctrl-C twice force-exits)
            waited = 0.0
            while t is not None and t.is_alive():
                t.join(timeout=30.0)
                if t.is_alive():
                    waited += 30.0
                    log.warning("waiting for %s (%.0f s — in-flight "
                                "device compile/dispatch?)",
                                t.name, waited)
        self._compute_thread = None
        self._present_thread = None
        for fg in self.flowgraphs.values():
            fg.stop()

    @property
    def running(self) -> bool:
        return self._computing

    # -- frame capture (Viewport::FrameCapture analog,
    #    include/jetstream/viewport/capture.hh:10-22) --------------------
    def capture_frame(self, directory: str) -> List[str]:
        """Render every surface to a PNG under ``directory`` and return
        the written paths."""
        import os

        import numpy as np

        from cyberether_tpu.remote.server import _frame_to_png_b64

        os.makedirs(directory, exist_ok=True)
        written: List[str] = []
        for fg_name, frames in self.present().items():
            for name, data in frames.items():
                png_b64 = _frame_to_png_b64(data)
                if png_b64 is None:
                    continue
                import base64

                path = os.path.join(
                    directory, f"{fg_name}_{name.replace('/', '_')}.png")
                with open(path, "wb") as f:
                    f.write(base64.b64decode(png_b64))
                written.append(path)
        return written

    def capture_video(self, directory: str, seconds: float = 2.0,
                      fps: float = 10.0) -> List[str]:
        """Record every surface for ``seconds`` into an animated GIF
        per surface (the Viewport::FrameCapture→encoder pipeline of the
        reference remote path, src/viewport/capture/vulkan.cc, reduced
        to a host-side encoder — no hardware codec in this image)."""
        import base64
        import io as _io
        import os

        from PIL import Image

        from cyberether_tpu.remote.server import _frame_to_png_b64

        os.makedirs(directory, exist_ok=True)
        frames: Dict[str, List[Any]] = {}
        period = 1.0 / fps
        t_end = time.monotonic() + seconds
        while time.monotonic() < t_end:
            t0 = time.monotonic()
            for fg_name, surfs in self.present().items():
                for name, data in surfs.items():
                    png = _frame_to_png_b64(data)
                    if png is None:
                        continue
                    img = Image.open(
                        _io.BytesIO(base64.b64decode(png))).convert("P")
                    frames.setdefault(f"{fg_name}_{name}", []).append(img)
            dt = time.monotonic() - t0
            if dt < period:
                time.sleep(period - dt)
        written: List[str] = []
        for key, imgs in frames.items():
            if not imgs:
                continue
            path = os.path.join(
                directory, key.replace("/", "_") + ".gif")
            imgs[0].save(path, save_all=True, append_images=imgs[1:],
                         duration=int(1000 / fps), loop=0)
            written.append(path)
        return written

    def destroy(self) -> None:
        self.stop()
        self.flowgraphs.clear()
