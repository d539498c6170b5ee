"""Superluminal API tests (headless): graph construction + realtime
loop, mirroring the reference's lm.plot/show flow (SURVEY.md §3.5).
"""

import threading
import time

import numpy as np
import pytest

import cyberether_tpu.superluminal as lm


@pytest.fixture(autouse=True)
def _clean():
    lm.terminate()
    yield
    lm.terminate()


def test_plot_validation():
    with pytest.raises(TypeError):
        lm.plot([1, 2, 3], lm.line)
    with pytest.raises(ValueError):
        lm.plot(np.zeros(8, np.complex64), lm.time)


def test_waterfall_graph_runs():
    buf = np.zeros(2048, np.complex64)
    buf[:] = np.exp(2j * np.pi * 0.1 * np.arange(2048))
    lm.plot(buf, lm.waterfall, domain=(lm.time, lm.frequency))
    lm.start()
    fg = lm.instance().flowgraphs["superluminal"]
    assert {"dti0", "spec0", "plot0"} <= set(fg.records)
    deadline = time.monotonic() + 10
    frames = {}
    while time.monotonic() < deadline:
        frames = lm.present()
        if frames:
            break
        time.sleep(0.05)
    assert "plot0" in frames
    assert frames["plot0"]["kind"] == "waterfall"
    assert frames["plot0"]["frame"].shape == (512, 2048, 4)
    lm.stop()


def test_realtime_updates_buffer():
    buf = np.zeros(1024, np.complex64)
    lm.plot(buf, lm.line, domain=(lm.time, lm.frequency),
            label="spectrum")
    done = threading.Event()

    def producer():
        for i in range(5):
            buf[:] = np.exp(2j * np.pi * (0.05 * (i + 1))
                            * np.arange(1024))
            lm.update()
            time.sleep(0.05)
        done.set()
        lm.stop()

    lm.realtime(producer)
    assert done.is_set()


def test_scatter_plot():
    buf = (np.ones(256) + 1j * np.ones(256)).astype(np.complex64)
    lm.plot(buf, lm.scatter)
    lm.start()
    fg = lm.instance().flowgraphs["superluminal"]
    assert fg.records["plot0"].type == "constellation"
    lm.stop()


def test_widgets_and_layout():
    assert lm.layout(2, 2, 1, 1, 1, 1) == [[0, 0], [0, 1]]
    lm.text("status", "ok")
    v = lm.slider("gain", 0.5, 0.0, 1.0)
    assert v == 0.5


def test_channel_sliced_waterfall_and_binding_aliases():
    """The interferometer example pattern (reference
    examples/superluminal/interferometer/interferometer.py): per-channel
    waterfalls sliced out of one shared buffer, plus the
    binding-level API names (superluminal.cc:133-177)."""
    import cyberether_tpu.superluminal as lm

    data = (np.random.rand(4, 256) + 1j * np.random.rand(4, 256)
            ).astype(np.complex64)
    lm.initialize({})
    for ch in range(2):
        lm.plot(data=data, type=lm.waterfall, channel_axis=0,
                channel_index=ch, label=f"w{ch}",
                mosaic=lm.mosaic_layout(1, 2, 1, 1, ch, 0),
                domain=(lm.time, lm.frequency))
    try:
        lm.start()
        assert lm.presenting()
        assert lm.poll_events(wait=True)
        fg = lm.instance().flowgraphs["superluminal"]
        for _ in range(3):
            assert fg.compute(timeout=10.0)
        frames = fg.present()
        assert len(frames) == 2
        for f in frames.values():
            assert f["frame"].shape[1] == 256
        assert lm.remote_room_id() == "local"
        assert "http" in lm.remote_invite_url()
    finally:
        lm.terminate()
