"""Canvas widget: host rasterizer + canvas block + superluminal API
(reference retained canvas,
include/jetstream/render/sakura/components/retained/canvas.hh:13-43)."""

import json

import numpy as np


def test_drawlist_primitives():
    from cyberether_tpu.viz.draw import DrawList

    dl = DrawList(64, 32, clear_color="#000000ff")
    assert dl.layout["framebufferSize"] == (64, 32)
    img = dl.rgba
    assert img.shape == (32, 64, 4)
    assert (img[..., :3] == 0).all()

    dl.rect(4, 4, 8, 8, "#ff0000")
    img = dl.rgba
    assert (img[6, 6, :3] == (255, 0, 0)).all()
    assert (img[2, 2, :3] == 0).all()

    dl.line(0, 16, 63, 16, (0, 255, 0), thickness=1)
    assert (dl.rgba[16, 30, :3] == (0, 255, 0)).all()

    dl.circle(48, 8, 5, "#0000ff", fill=True)
    assert (dl.rgba[8, 48, :3] == (0, 0, 255)).all()

    before = dl.rgba.sum()
    dl.text(2, 20, "Hello", "#ffffff")
    assert dl.rgba.sum() > before          # text drew something

    patch = np.full((4, 4, 4), 255, np.uint8)
    dl.image(60, 28, patch)                # clipped blit must not raise
    assert (dl.rgba[29, 61] == 255).all()


def test_color_css_shorthand():
    """#rgb / #rgba shorthand expands per CSS (#9ab = #99aabb) — the
    shipped examples use shorthand colors (review finding)."""
    from cyberether_tpu.viz.draw import _color

    assert _color("#9ab") == (0x99, 0xAA, 0xBB, 255)
    assert _color("#4be8") == (0x44, 0xBB, 0xEE, 0x88)
    assert _color("#99aabb") == (0x99, 0xAA, 0xBB, 255)
    assert _color((1, 2, 3)) == (1, 2, 3, 255)


def test_drawlist_polyline_and_scaled_text():
    from cyberether_tpu.viz.draw import DrawList

    dl = DrawList(64, 64)
    dl.polyline([(0, 0), (63, 0), (63, 63)], "#ffffff",
                thickness=2, closed=True)
    img = dl.rgba
    assert (img[0, 32, :3] > 0).any()      # top edge
    assert (img[32, 32, :3] > 0).any()     # diagonal (closed)
    before = img.sum()
    dl.text(8, 24, "A", "#ff00ff", size=2)
    assert dl.rgba.sum() > before


def test_canvas_block_declarative_and_view_update():
    from cyberether_tpu import Flowgraph

    fg = Flowgraph()
    cmds = [{"op": "rect", "args": [0, 0, 16, 16], "color": "#ffffff"},
            {"op": "bogus", "args": []},           # ignored
            {"op": "line", "args": [0, 0, 31, 31],
             "color": "#00ff00", "thickness": 3}]
    fg.block_create("cv", "canvas",
                    {"width": 32, "height": 32,
                     "clearColor": "#000000ff",
                     "commands": json.dumps(cmds)})
    frames = fg.present()
    assert "cv" in frames
    f = frames["cv"]
    assert f["kind"] == "frame"
    assert f["frame"].shape == (32, 32, 4)
    assert f["layout"]["framebufferSize"] == (32, 32)
    assert (f["frame"][2, 10, :3] == 255).all()   # rect, off-diagonal
    assert (f["frame"][4, 4, :3] == (0, 255, 0)).all()  # line atop

    # live view update re-draws without a rebuild
    fg.block_set_view("cv", {"commands": json.dumps(
        [{"op": "clear", "args": ["#112233"]}])})
    f2 = fg.present()["cv"]
    assert tuple(f2["frame"][4, 4, :3]) == (0x11, 0x22, 0x33)
    fg.stop()


def test_canvas_alongside_compute_graph():
    """A portless surface module must not disturb scheduling of a
    real compute chain in the same graph."""
    from cyberether_tpu import Flowgraph

    fg = Flowgraph()
    fg.block_create("gen", "signal_generator",
                    {"signalType": "cosine", "bufferSize": 256})
    fg.block_create("lp", "lineplot", {},
                    {"signal": "${graph.gen.output.signal}"})
    fg.block_create("cv", "canvas", {"width": 16, "height": 16})
    assert fg.compute(timeout=30.0)
    frames = fg.present()
    assert "cv" in frames and "lp" in frames
    fg.stop()


def test_canvas_callback_reattach_after_reconfigure():
    """Reconfigure rebuilds the module instance, so host attachments
    follow the dti convention: the owner re-attaches (same as
    DtiModule.attach_buffer).  The declarative `commands` config
    path needs no re-attach."""
    from cyberether_tpu import Flowgraph

    fg = Flowgraph()
    fg.block_create("cv", "canvas", {"width": 16, "height": 16})
    cb = lambda dl, layout: dl.clear("#445566")   # noqa: E731
    fg.records["cv"].build.modules["cv/m"].set_draw_callback(cb)
    assert tuple(fg.present()["cv"]["frame"][3, 3, :3]) \
        == (0x44, 0x55, 0x66)
    fg.block_reconfigure("cv", {"width": 24, "height": 16})
    mod = fg.records["cv"].build.modules["cv/m"]
    mod.set_draw_callback(cb)                     # re-attach
    f = fg.present()["cv"]
    assert f["frame"].shape == (16, 24, 4)
    assert tuple(f["frame"][3, 3, :3]) == (0x44, 0x55, 0x66)
    fg.stop()


def test_canvas_streams_over_binary_ws():
    """End-to-end: a canvas surface rides the remote binary WS like
    any other frame (u32 header | JSON | encoded payload) and decodes
    back to the drawn pixels."""
    import asyncio
    import io
    import struct
    import time

    import pytest

    websockets = pytest.importorskip("websockets")
    from PIL import Image

    from cyberether_tpu.core.instance import Instance
    from cyberether_tpu.remote.server import RemoteServer

    port = 8898
    inst = Instance(headless=True)
    fg = inst.flowgraph_create("main")
    fg.block_create("cv", "canvas", {
        "width": 64, "height": 32, "clearColor": "#000000ff",
        "commands": json.dumps(
            [{"op": "rect", "args": [0, 0, 64, 32],
              "color": "#ff0000"}])})
    srv = RemoteServer(inst, port=port, codec="png")
    srv.start()
    inst.start()
    deadline = time.monotonic() + 10
    import urllib.request
    while time.monotonic() < deadline:
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=1)
            break
        except Exception:
            time.sleep(0.1)

    async def grab():
        async with websockets.connect(
                f"ws://127.0.0.1:{port}/api/v1/stream",
                max_size=None) as ws:
            for _ in range(40):
                msg = await asyncio.wait_for(ws.recv(), timeout=5)
                if isinstance(msg, str):
                    continue
                (hlen,) = struct.unpack_from("<I", msg, 0)
                header = json.loads(msg[4:4 + hlen].decode())
                if header["name"] == "cv":
                    return header, msg[4 + hlen:]
        return None, None

    try:
        header, payload = asyncio.run(grab())
    finally:
        srv.stop()
        inst.stop()
    assert header is not None, "canvas surface never streamed"
    assert header["kind"] == "frame"
    img = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    assert img.shape == (32, 64, 3)
    assert (img[5, 5] == (255, 0, 0)).all()


def test_superluminal_canvas_callback():
    import cyberether_tpu.superluminal as lm

    seen = {}

    def draw(dl, layout):
        seen["layout"] = layout
        dl.clear("#000000")
        dl.rect(0, 0, 8, 8, "#ff8800")
        dl.text(2, 20, "hi", "#ffffff")

    lm.initialize({})
    lm.canvas("scope", size=(48, 32), draw=draw)
    lm.start()
    try:
        frames = lm.present()
        assert "canvas0" in frames
        f = frames["canvas0"]
        assert f["frame"].shape == (32, 48, 4)
        assert (f["frame"][3, 3, :3] == (255, 136, 0)).all()
        assert seen["layout"]["framebufferSize"] == (48, 32)
    finally:
        lm.stop()
        lm.terminate()
