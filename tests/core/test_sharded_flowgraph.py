"""Mesh-sharded flowgraph execution: the same compiled graph program
partitioned over the 8-device virtual mesh must match single-device
results (batchAxis -> 'time', channelAxis -> 'channels')."""

import numpy as np
import pytest

from cyberether_tpu.core.flowgraph import Flowgraph
from cyberether_tpu.core.types import BlockState, DataType
from cyberether_tpu.parallel.mesh import make_mesh


def _build(fg, buf):
    fg.block_create("src", "dti", {
        "shape": list(buf.shape), "dataType": "CF32"})
    dti = fg.records["src"].build.modules["src/m"]
    dti.attach_buffer(buf)
    fg.block_create("sax", "signal_axes", {"axes": "batch=0,sample=1"},
                    {"buffer": "${graph.src.output.buffer}"})
    fg.block_create("fft", "fft", {},
                    {"signal": "${graph.sax.output.buffer}"})
    fg.block_create("amp", "amplitude", {},
                    {"signal": "${graph.fft.output.signal}"})
    return fg


def test_sharded_matches_single_device():
    rng = np.random.default_rng(11)
    buf = (rng.standard_normal((8, 256))
           + 1j * rng.standard_normal((8, 256))).astype(np.complex64)

    fg1 = Flowgraph()
    _build(fg1, buf)
    assert fg1.compute(timeout=5.0)
    ref = fg1.scheduler.output("amp.signal")
    fg1.stop()

    fg2 = Flowgraph()
    _build(fg2, buf)
    fg2.set_mesh(make_mesh(time=4, channels=2))
    assert fg2.compute(timeout=5.0)
    got = fg2.scheduler.output("amp.signal")
    fg2.stop()

    assert got.shape == (8, 256)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_mesh_toggle_recompiles():
    rng = np.random.default_rng(12)
    buf = (rng.standard_normal((8, 128))
           + 1j * rng.standard_normal((8, 128))).astype(np.complex64)
    fg = Flowgraph()
    _build(fg, buf)
    try:
        assert fg.compute(timeout=5.0)
        a = fg.scheduler.output("amp.signal")
        fg.set_mesh(make_mesh(time=8, channels=1))
        assert fg.compute(timeout=5.0)
        b = fg.scheduler.output("amp.signal")
        np.testing.assert_allclose(a, b, atol=1e-3)
    finally:
        fg.stop()
