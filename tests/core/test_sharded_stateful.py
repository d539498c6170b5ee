"""Mesh-sharded flowgraph depth (VERDICT r3 item 4): stateful modules
(state freeze across cycles), squelch PASS_FLAG validity, and the
YAML-driven channel/time-sharded channelizer — all through
``Flowgraph.set_mesh`` on the 8-device virtual mesh, matching
single-device results exactly.

The state-freeze ``jnp.where`` + boundary codec interacting with GSPMD
shardings is where multi-chip would break first; these tests pin it.
Reference cognate: scheduler device segments,
/root/reference/src/scheduler_synchronous.cc:698-748 (SURVEY §2.6 TPU
mapping).
"""

import numpy as np
import pytest

from cyberether_tpu.core.flowgraph import Flowgraph
from cyberether_tpu.parallel.mesh import make_mesh


def _iq(frames, lanes, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((frames, lanes))
            + 1j * rng.standard_normal((frames, lanes))) \
        .astype(np.complex64)


def _build_fm(fg, shape):
    fg.block_create("src", "dti", {"shape": list(shape),
                                   "dataType": "CF32"})
    fg.block_create("sax", "signal_axes", {"axes": "batch=0,sample=1"},
                    {"buffer": "${graph.src.output.buffer}"})
    fg.block_create("fm", "fm", {"mode": "narrow",
                                 "sampleRate": 240e3},
                    {"signal": "${graph.sax.output.buffer}"})
    return fg.records["src"].build.modules["src/m"]


def test_sharded_stateful_fm_matches_single_device():
    """fm carries a complex lag state across cycles; under the mesh the
    state freeze + boundary codec must reproduce the single-device
    stream bit-for-bit over multiple cycles with CHANGING input."""
    shape = (8, 512)
    bufs = [_iq(*shape, seed=s) for s in (1, 2, 3)]

    def run(mesh):
        fg = Flowgraph()
        dti = _build_fm(fg, shape)
        if mesh is not None:
            fg.set_mesh(mesh)
        outs = []
        try:
            for b in bufs:
                dti.attach_buffer(b)
                assert fg.compute(timeout=30.0)
                outs.append(np.asarray(
                    fg.scheduler.output("fm.signal")))
        finally:
            fg.stop()
        return outs

    ref = run(None)
    got = run(make_mesh(time=4, channels=2))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, atol=1e-5)


def test_sharded_squelch_pass_flag_freezes_state():
    """A closed squelch must (a) mark downstream outputs invalid and
    (b) leave downstream STATE untouched, under the mesh exactly as on
    a single device: a loud-quiet-loud input sequence must produce the
    same fm output stream as loud-loud with no quiet cycle between."""
    shape = (4, 256)
    loud1, loud2 = _iq(*shape, seed=10), _iq(*shape, seed=11)
    quiet = (_iq(*shape, seed=12) * 1e-6).astype(np.complex64)

    def _build_squelch(fg, shape):
        fg.block_create("src", "dti", {"shape": list(shape),
                                       "dataType": "CF32"})
        fg.block_create("sax", "signal_axes",
                        {"axes": "batch=0,sample=1"},
                        {"buffer": "${graph.src.output.buffer}"})
        fg.block_create("sq", "squelch", {"threshold": 0.5},
                        {"signal": "${graph.sax.output.buffer}"})
        fg.block_create("fm", "fm", {"mode": "narrow",
                                     "sampleRate": 240e3},
                        {"signal": "${graph.sq.output.signal}"})
        return fg.records["src"].build.modules["src/m"]

    def run(mesh, sequence):
        fg = Flowgraph()
        dti = _build_squelch(fg, shape)
        if mesh is not None:
            fg.set_mesh(mesh)
        outs = []
        try:
            for b in sequence:
                dti.attach_buffer(b)
                assert fg.compute(timeout=30.0)
                outs.append((
                    np.asarray(fg.scheduler.output("fm.signal")),
                    fg.scheduler.output_valid("fm.signal")))
        finally:
            fg.stop()
        return outs

    mesh = make_mesh(time=4, channels=2)
    ref = run(None, [loud1, loud2])
    got = run(mesh, [loud1, quiet, loud2])

    # quiet cycle: invalid output under the mesh
    assert got[1][1] is False or got[1][1] == 0
    # loud cycles: valid and bit-matching the no-quiet reference
    # (quiet cycle must not have advanced fm's lag state)
    assert got[0][1] and got[2][1]
    np.testing.assert_allclose(got[0][0], ref[0][0], atol=1e-5)
    np.testing.assert_allclose(got[2][0], ref[1][0], atol=1e-5)


CHAN_YAML = """
version: 2
title: sharded channelizer
graph:
  - name: src
    module: dti
    config: {shape: [2048, 64], dataType: CF32}
  - name: chan
    module: channelizer
    provider: pallas
    config: {tileM: 512}
    input: {buffer: '${graph.src.output.buffer}'}
"""


@pytest.mark.parametrize("mesh_shape", [(4, 2), (8, 1)])
def test_yaml_channelizer_sharded_matches_single(mesh_shape):
    """BASELINE's measured config as a FLOWGRAPH: the 64-ch fused
    channelizer sharded over the mesh 'time' axis with the ppermute
    halo exchange (ChannelizerFusedModule.apply_mesh), stateful across
    cycles, must match single-device exactly."""
    bufs = [_iq(2048, 64, seed=s) for s in (20, 21)]

    def run(mesh):
        fg = Flowgraph.from_yaml(CHAN_YAML)
        dti = fg.records["src"].build.modules["src/m"]
        if mesh is not None:
            fg.set_mesh(mesh)
        outs = []
        try:
            for b in bufs:
                dti.attach_buffer(b)
                assert fg.compute(timeout=60.0)
                outs.append(np.asarray(
                    fg.scheduler.output("chan.audio")))
        finally:
            fg.stop()
        return outs

    t, c = mesh_shape
    ref = run(None)
    got = run(make_mesh(time=t, channels=c))
    for r, g in zip(ref, got):
        assert g.shape == (2048 // 16, 64)
        np.testing.assert_allclose(g, r, atol=1e-5)


def test_sharded_burst_stateful_matches_sequential():
    """compute_burst through a meshed, stateful graph: the scan-carried
    state must thread identically to per-cycle dispatch."""
    shape = (8, 512)
    buf = _iq(*shape, seed=30)

    def run(burst):
        fg = Flowgraph()
        dti = _build_fm(fg, shape)
        fg.set_mesh(make_mesh(time=4, channels=2))
        try:
            dti.attach_buffer(buf)
            if burst:
                assert fg.compute(timeout=30.0)   # build + settle
                assert fg.scheduler.compute_burst(3, timeout=60.0) == 3
            else:
                for _ in range(4):
                    assert fg.compute(timeout=30.0)
            return np.asarray(fg.scheduler.output("fm.signal"))
        finally:
            fg.stop()

    np.testing.assert_allclose(run(True), run(False), atol=1e-5)


def test_checkpoint_resume_under_mesh(tmp_path):
    """save_checkpoint on a MESHED, stateful graph and resume on a
    fresh (also meshed) instance: the stream must continue exactly —
    GSPMD-sharded state must round-trip the pickle-free container."""
    shape = (8, 512)
    b1, b2 = _iq(*shape, seed=40), _iq(*shape, seed=41)
    mesh = make_mesh(time=4, channels=2)

    fg = Flowgraph()
    dti = _build_fm(fg, shape)
    fg.set_mesh(mesh)
    dti.attach_buffer(b1)
    assert fg.compute(timeout=30.0)
    path = str(tmp_path / "ckpt.zip")
    fg.save_checkpoint(path)
    fg.stop()

    # reference: uninterrupted 2-cycle run
    fg_ref = Flowgraph()
    dti_r = _build_fm(fg_ref, shape)
    fg_ref.set_mesh(mesh)
    dti_r.attach_buffer(b1)
    assert fg_ref.compute(timeout=30.0)
    dti_r.attach_buffer(b2)
    assert fg_ref.compute(timeout=30.0)
    want = np.asarray(fg_ref.scheduler.output("fm.signal"))
    fg_ref.stop()

    fg2 = Flowgraph.load_checkpoint(path)
    fg2.set_mesh(mesh)
    dti2 = fg2.records["src"].build.modules["src/m"]
    dti2.attach_buffer(b2)
    assert fg2.compute(timeout=30.0)
    got = np.asarray(fg2.scheduler.output("fm.signal"))
    fg2.stop()
    np.testing.assert_allclose(got, want, atol=1e-5)
