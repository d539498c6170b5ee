"""Complex boundary codec: complex64 must never cross an executable
boundary (the axon TPU backend rejects complex transfers AND complex
jit parameters).  These tests drive the REAL scheduler — settled
constants, tagged segment outputs, realified streaming state — and
check both the wire format and the numerics.
"""

import numpy as np
import scipy.signal

from cyberether_tpu import Flowgraph
from cyberether_tpu.core.scheduler import _is_tagged


def _dti_graph(buf, extra):
    fg = Flowgraph()
    fg.block_create("src", "dti", {"shape": list(buf.shape),
                                   "dataType": "F32"})
    fg.records["src"].build.modules["src/m"].attach_buffer(buf)
    extra(fg)
    return fg


def test_settled_complex_constants_are_host_numpy(rng):
    """window -> invert settles to host-side numpy complex (embedded as
    literals when segments trace), never a device complex array."""
    buf = rng.standard_normal((4, 128)).astype(np.float32)
    fg = _dti_graph(buf, lambda fg: fg.block_create(
        "spec", "spectrum_engine", {"enableScale": True},
        {"buffer": "${graph.src.output.buffer}"}))
    try:
        assert fg.compute(timeout=10.0)
        sched = fg.scheduler
        settled_complex = [k for k, v in sched._static_values.items()
                          if np.iscomplexobj(np.asarray(v))]
        assert settled_complex, "expected settled complex constants"
        for k in settled_complex:
            v = sched._static_values[k]
            assert isinstance(v, np.ndarray), \
                f"{k} settled as {type(v)}, want host numpy"
        out = sched.output("spec.buffer")
        assert out.shape == (4, 128)
        assert np.all(np.isfinite(out))
    finally:
        fg.stop()


def test_complex_segment_output_is_tagged_and_correct(rng):
    """A terminal complex link leaves the device program as tagged
    stacked-f32 planes; output() recombines to the np.fft result."""
    buf = rng.standard_normal((4, 64)).astype(np.float32)

    def extra(fg):
        fg.block_create("cast", "cast", {"outputType": "CF32"},
                        {"buffer": "${graph.src.output.buffer}"})
        fg.block_create("axes", "signal_axes", {"axes": "sample=1"},
                        {"buffer": "${graph.cast.output.buffer}"})
        fg.block_create("fft", "fft", {"forward": True},
                        {"signal": "${graph.axes.output.buffer}"})

    fg = _dti_graph(buf, extra)
    try:
        assert fg.compute(timeout=10.0)
        sched = fg.scheduler
        key = next(k for k in sched._latest
                   if k.startswith("fft/") and _is_tagged(
                       sched._latest[k]))
        planes = np.asarray(sched._latest[key]["__planes__"])
        assert planes.dtype == np.float32
        assert planes.shape == (2, 4, 64)
        out = sched.output("fft.signal")
        assert out.dtype == np.complex64
        np.testing.assert_allclose(out, np.fft.fft(buf, axis=1),
                                   rtol=1e-4, atol=1e-3)
    finally:
        fg.stop()


def test_complex_streaming_state_across_cycles(rng):
    """The filter block's overlap-add history (complex) crosses cycles
    in realified form; three streamed cycles must equal one lfilter
    over the concatenated stream."""
    n = 1024
    xs = [(rng.standard_normal(n) + 1j * rng.standard_normal(n)
           ).astype(np.complex64) for _ in range(3)]

    fg = Flowgraph()
    fg.block_create("src", "dti", {"shape": [n], "dataType": "CF32"})
    src = fg.records["src"].build.modules["src/m"]
    fg.block_create("flt", "filter",
                    {"sampleRate": 1.0, "bandwidth": 1.0,
                     "center": [0.0], "taps": 33},
                    {"signal": "${graph.src.output.buffer}"})
    try:
        outs = []
        for x in xs:
            src.attach_buffer(x)
            assert fg.compute(timeout=10.0)
            fg.scheduler.synchronize()
            outs.append(fg.scheduler.output("flt.buffer")[0])
        # complex state leaves really are stored realified (float32)
        st = fg.scheduler._state
        flat = [a for s in st.values()
                for a in __import__("jax").tree_util.tree_leaves(s)]
        assert flat and all(
            not np.issubdtype(a.dtype, np.complexfloating)
            for a in flat)

        from cyberether_tpu.ops import windowed_sinc_bandpass

        taps = windowed_sinc_bandpass(33, 1.0, 1.0, [0.0])[0]
        ref = scipy.signal.lfilter(taps, [1.0], np.concatenate(xs))
        got = np.concatenate(outs)
        np.testing.assert_allclose(got[: len(ref)], ref[: len(got)],
                                   atol=5e-3)
    finally:
        fg.stop()


def test_checkpoint_resume_continues_stream(rng, tmp_path):
    """save_checkpoint/load_checkpoint: a resumed graph must continue
    the stream exactly where the original left off (same filter
    history), matching an uninterrupted run."""
    n = 1024
    xs = [(rng.standard_normal(n) + 1j * rng.standard_normal(n)
           ).astype(np.complex64) for _ in range(4)]

    def mk():
        fg = Flowgraph()
        fg.block_create("src", "dti", {"shape": [n],
                                       "dataType": "CF32"})
        fg.block_create("flt", "filter",
                        {"sampleRate": 1.0, "bandwidth": 1.0,
                         "center": [0.0], "taps": 33},
                        {"signal": "${graph.src.output.buffer}"})
        return fg

    def run(fg, blocks):
        src = fg.records["src"].build.modules["src/m"]
        outs = []
        for x in blocks:
            src.attach_buffer(x)
            assert fg.compute(timeout=10.0)
            fg.scheduler.synchronize()
            outs.append(fg.scheduler.output("flt.buffer")[0])
        return outs

    # uninterrupted reference
    fg = mk()
    ref = run(fg, xs)
    fg.stop()

    # two cycles, checkpoint, resume in a NEW graph, two more cycles
    fg1 = mk()
    first = run(fg1, xs[:2])
    ckpt = str(tmp_path / "stream.ckpt")
    fg1.save_checkpoint(ckpt)
    fg1.stop()

    fg2 = Flowgraph.load_checkpoint(ckpt)
    rest = run(fg2, xs[2:])
    fg2.stop()

    got = np.concatenate(first + rest)
    np.testing.assert_allclose(got, np.concatenate(ref), atol=1e-5)

    # the container is pickle-free: a plain zip of YAML + JSON + npz
    # (np.load with allow_pickle=False), so loading untrusted files
    # never executes code
    import zipfile
    with zipfile.ZipFile(ckpt) as z:
        names = set(z.namelist())
        assert {"topology.yaml", "manifest.json", "state.npz"} <= names
        assert b"pickle" not in z.read("state.npz")[:200]


def test_compute_burst_matches_sequential(rng):
    """compute_burst(k): one scanned dispatch must equal k sequential
    compute() cycles — same sink deliveries per cycle, same final
    streaming state."""
    import jax as _jax

    from tests.support import synthetic

    synthetic.register()

    n = 512
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)

    def mk():
        fg = Flowgraph()
        fg.block_create("src", "dti", {"shape": [n],
                                       "dataType": "CF32"})
        fg.records["src"].build.modules["src/m"].attach_buffer(x)
        fg.block_create("flt", "filter",
                        {"sampleRate": 1.0, "bandwidth": 1.0,
                         "center": [0.0], "taps": 17},
                        {"signal": "${graph.src.output.buffer}"})
        fg.block_create("snk", "synth_sink", {},
                        {"in": "${graph.flt.output.buffer}"})
        return fg

    def sink(fg):
        return fg.records["snk"].build.modules["snk/m"]

    # sequential reference: 3 cycles of the same dti buffer
    fg1 = mk()
    fg1.start()
    for _ in range(3):
        assert fg1.compute(timeout=10.0)
    fg1.scheduler.synchronize()
    seq = list(sink(fg1).received)
    st_seq = fg1.scheduler.state_snapshot()
    fg1.stop()

    # burst: 3 cycles in one dispatch
    fg2 = mk()
    fg2.start()
    assert fg2.compute_burst(3, timeout=10.0) == 3
    fg2.scheduler.synchronize()
    burst = list(sink(fg2).received)
    st_burst = fg2.scheduler.state_snapshot()
    fg2.stop()

    assert len(burst) == len(seq) == 3
    for a, b in zip(burst, seq):
        np.testing.assert_allclose(a, b, atol=1e-5)
    for mname in st_seq:
        for la, lb in zip(
                _jax.tree_util.tree_leaves(st_seq[mname]),
                _jax.tree_util.tree_leaves(st_burst[mname])):
            np.testing.assert_allclose(np.asarray(la),
                                       np.asarray(lb), atol=1e-5)


def test_compute_burst_mixed_const_and_varying_sources(rng):
    """Burst h2d split: a version-stable source (dti) rides the cached
    single-buffer const path while a per-cycle-varying source is
    stacked — results must still match sequential compute()."""
    from tests.support import synthetic

    synthetic.register()
    synthetic.reset()

    n = 64
    const = rng.standard_normal(n).astype(np.float32)

    def mk():
        fg = Flowgraph()
        fg.block_create("cst", "dti", {"shape": [n],
                                       "dataType": "F32"})
        fg.records["cst"].build.modules["cst/m"].attach_buffer(const)
        fg.block_create("var", "synth_source", {"size": n})
        fg.block_create("mix", "synth_merge", {},
                        {"a": "${graph.cst.output.buffer}",
                         "b": "${graph.var.output.out}"})
        fg.block_create("snk", "synth_sink", {},
                        {"in": "${graph.mix.output.out}"})
        return fg

    def sink(fg):
        return fg.records["snk"].build.modules["snk/m"]

    fg1 = mk()
    fg1.start()
    for _ in range(4):
        assert fg1.compute(timeout=10.0)
    fg1.scheduler.synchronize()
    seq = list(sink(fg1).received)
    fg1.stop()

    synthetic.reset()
    fg2 = mk()
    fg2.start()
    assert fg2.compute_burst(4, timeout=10.0) == 4
    fg2.scheduler.synchronize()
    burst = list(sink(fg2).received)
    fg2.stop()

    assert len(burst) == len(seq) == 4
    # the varying source counts 1,2,3,4 — each cycle differs
    for i, (a, b) in enumerate(zip(burst, seq)):
        np.testing.assert_allclose(a, b, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a),
                                   const + float(i + 1), atol=1e-6)
