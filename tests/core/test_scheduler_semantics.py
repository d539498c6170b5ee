"""Scheduler-semantics tests mirroring the reference suite
(/root/reference/tests/core/runtime/scheduler.cc:308-869): static
settlement, skip propagation with state freezing, segment partition,
timing, and settings/env plumbing.
"""

import numpy as np
import pytest

from cyberether_tpu.core.scheduler import DeviceSegment, HostSegment
from cyberether_tpu.core.types import BlockState
from tests.support import synthetic

synthetic.register()


@pytest.fixture(autouse=True)
def _reset_synthetic():
    synthetic.reset()
    yield
    synthetic.reset()


def test_static_branch_settles(flowgraph):
    """window -> invert is fully static: evaluated once at build, not
    per cycle ("Scheduler settles fully static branches")."""
    fg = flowgraph
    fg.block_create("win", "window", {"size": 64})
    fg.block_create("inv", "invert", {},
                    {"signal": "${graph.win.output.window}"})
    sched = fg.scheduler
    sched._ensure_built()
    assert "win/m" in sched._settled
    assert "inv/m" in sched._settled
    # settled graphs have no runnable segments
    assert sched._segments == []
    out = sched.output("inv.signal")
    assert out is not None and out.shape == (64,)


def test_stateful_consumer_of_static_not_settled(flowgraph):
    fg = flowgraph
    fg.block_create("win", "window", {"size": 16})
    fg.block_create("st", "synth_stateful", {},
                    {"in": "${graph.win.output.window}"})
    sched = fg.scheduler
    sched._ensure_built()
    assert "win/m" in sched._settled
    assert "st/m" not in sched._settled


def test_segment_partition_host_device_host(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 8})
    fg.block_create("p", "synth_pass", {},
                    {"in": "${graph.src.output.out}"})
    fg.block_create("sink", "synth_sink", {},
                    {"in": "${graph.p.output.out}"})
    sched = fg.scheduler
    sched._ensure_built()
    kinds = [type(s).__name__ for s in sched._segments]
    assert kinds == ["HostSegment", "DeviceSegment", "HostSegment"]


def test_device_modules_fuse_into_one_segment(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 8})
    for i in range(5):
        prev = "src.out" if i == 0 else f"p{i-1}.out"
        fg.block_create(f"p{i}", "synth_pass", {},
                        {"in": f"${{graph.{prev.split('.')[0]}.output."
                               f"{prev.split('.')[1]}}}"})
    sched = fg.scheduler
    sched._ensure_built()
    dev = [s for s in sched._segments if isinstance(s, DeviceSegment)]
    assert len(dev) == 1
    assert len(dev[0].modules) == 5


def test_skip_freezes_downstream_state(flowgraph):
    """A failing squelch must freeze downstream stateful modules —
    the compiled-graph analog of SKIP propagation."""
    fg = flowgraph
    fg.block_create("gen", "signal_generator", {
        "signalType": "dc", "amplitude": 0.01, "bufferSize": 16})
    fg.block_create("sq", "squelch", {"threshold": 0.5},
                    {"signal": "${graph.gen.output.signal}"})
    fg.block_create("st", "synth_stateful", {},
                    {"in": "${graph.sq.output.signal}"})
    sched = fg.scheduler
    for _ in range(3):
        assert fg.compute(timeout=5.0)
    count = float(np.asarray(sched._state["st/m"]["count"]))
    assert count == 0.0           # never advanced
    assert not sched.output_valid("st.out")
    # open the squelch: state starts advancing
    fg.block_reconfigure("sq", {"threshold": 0.001})
    for _ in range(2):
        assert fg.compute(timeout=5.0)
    count = float(np.asarray(sched._state["st/m"]["count"]))
    assert count == 2.0
    assert sched.output_valid("st.out")


def test_state_preserved_across_unrelated_mutation(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 8})
    fg.block_create("st", "synth_stateful", {},
                    {"in": "${graph.src.output.out}"})
    for _ in range(3):
        assert fg.compute(timeout=5.0)
    sched = fg.scheduler
    assert float(np.asarray(sched._state["st/m"]["count"])) == 3.0
    # adding an unrelated block rebuilds the schedule but keeps state
    fg.block_create("other", "synth_source", {"size": 4})
    assert fg.compute(timeout=5.0)
    assert float(np.asarray(sched._state["st/m"]["count"])) == 4.0


def test_timings_recorded(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 8})
    fg.block_create("p", "synth_pass", {},
                    {"in": "${graph.src.output.out}"})
    assert fg.compute(timeout=5.0)
    timings = fg.scheduler.timings()
    assert any(t.cycles >= 1 for t in timings.values())


def test_env_key_triggers_incomplete_retry(flowgraph):
    """Environment-key visibility changes retry incomplete blocks (the
    reference's docs/metadata.md elastic pattern)."""
    fg = flowgraph
    fg.block_create("p", "synth_pass", {},
                    {"in": "${graph.missing.output.out}"})
    assert fg.block_state("p") == BlockState.INCOMPLETE
    fg.block_create("missing", "synth_source", {"size": 8})
    assert fg.block_state("p") == BlockState.COMPLETE


def test_settings_roundtrip(tmp_path):
    from cyberether_tpu.core.settings import Settings

    s = Settings(path=str(tmp_path / "settings.yaml"))
    assert s["remotePort"] == 8765
    s.set("remotePort", 9000)
    s2 = Settings(path=str(tmp_path / "settings.yaml"))
    assert s2["remotePort"] == 9000
    s2.set("logLevel", "DEBUG", persist=False)
    assert s2["logLevel"] == "DEBUG"


def test_inference_jax_model(flowgraph):
    from cyberether_tpu.blocks.ml import register_jax_model
    from cyberether_tpu.core.tensor import TensorSpec
    from cyberether_tpu.core.types import DataType

    import jax.numpy as jnp

    register_jax_model(
        "double",
        lambda ins: {"output": ins["input"] * 2.0},
        lambda specs: {"output": specs["input"]})
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 8})
    fg.block_create("ml", "onnx_inference",
                    {"modelPath": "jax:double"},
                    {"input": "${graph.src.output.out}"})
    assert fg.block_state("ml") == BlockState.COMPLETE, \
        fg.block_error("ml")
    assert fg.compute(timeout=5.0)
    out = fg.scheduler.output("ml.output")
    np.testing.assert_allclose(out, np.full(8, 2.0))


def test_runtime_failure_isolates_block(flowgraph):
    """Runtime compute failure: block -> Errored with diagnostics,
    downstream -> Incomplete, rest of the graph keeps running
    (flowgraph.cc:1059-1176)."""
    fg = flowgraph
    fg.block_create("gen", "signal_generator", {"bufferSize": 8})
    code = ("count = [0]\n"
            "def compute(ctx):\n"
            "    count[0] += 1\n"
            "    if count[0] >= 2:\n"
            "        raise RuntimeError('boom at cycle 2')\n"
            "    ctx.outputs['out'][:] = 1.0\n")
    fg.block_create("py", "python", {
        "code": code, "inputs": ["inp"], "outputs": ["out:F32:[8]"]},
        {"inp": "${graph.gen.output.signal}"})
    fg.block_create("down", "duplicate", {},
                    {"buffer": "${graph.py.output.out}"})
    fg.block_create("healthy", "duplicate", {},
                    {"buffer": "${graph.gen.output.signal}"})
    assert fg.compute(timeout=5.0)          # cycle 1 fine
    assert not fg.compute(timeout=5.0)      # cycle 2 fails, isolates
    assert fg.block_state("py") == BlockState.ERRORED
    assert "boom" in fg.block_error("py")
    assert fg.block_state("down") == BlockState.INCOMPLETE
    # healthy branch keeps computing after the rebuild
    assert fg.block_state("healthy") == BlockState.COMPLETE
    assert fg.compute(timeout=5.0)
    assert fg.scheduler.output("healthy.buffer") is not None


def test_live_mutation_during_rebuild_not_lost():
    """A block_create that lands WHILE the compute thread is mid-
    rebuild must not be lost: _build_locked used to clear the dirty
    flag unconditionally, swallowing the invalidate — an added
    throttled branch then never entered the topo and never presented
    (round-3 regression found via the delta-streaming test)."""
    import time

    from cyberether_tpu.core.instance import Instance

    for _ in range(2):   # the race fired reliably on the 2nd instance
        inst = Instance(headless=True)
        fg = inst.flowgraph_create("main")
        fg.block_create("gen", "signal_generator",
                        {"signalType": "cosine",
                         "signalDataType": "CF32",
                         "bufferSize": 512})
        fg.block_create("spec", "spectrum_engine",
                        {"enableScale": True},
                        {"buffer": "${graph.gen.output.signal}"})
        inst.start()
        # mutate the LIVE graph: races the compute thread's rebuild
        fg.block_create("gate", "throttle", {"intervalMs": 20.0},
                        {"buffer": "${graph.spec.output.buffer}"})
        fg.block_create("wf", "waterfall", {"height": 64},
                        {"signal": "${graph.gate.output.buffer}"})
        deadline = time.monotonic() + 15
        seen = False
        while time.monotonic() < deadline and not seen:
            seen = "wf" in fg.present()
            time.sleep(0.05)
        inst.stop()
        assert seen, "live-added block never entered the schedule"


def test_profile_attribution_sums_to_segment_totals():
    """VERDICT r3 weak 6: per-node profile numbers must agree with the
    fused segment totals users also see — isolated re-jit times are
    normalized per segment (relative attribution, exact sums)."""
    from cyberether_tpu.core.flowgraph import Flowgraph

    fg = Flowgraph()
    fg.block_create("sg", "signal_generator", {
        "signalType": "cosine", "signalDataType": "CF32",
        "sampleRate": 1e6, "frequency": 1e5, "bufferSize": 2048})
    fg.block_create("spec", "spectrum_engine", {"enableScale": True},
                    {"buffer": "${graph.sg.output.signal}"})
    try:
        for _ in range(4):
            assert fg.compute(timeout=30.0)
        prof = fg.scheduler.profile(iters=2)
        assert prof
        for seg in fg.scheduler._segments:
            mods = [m for m in getattr(seg, "modules", [])
                    if m in prof]
            if not mods or seg.timing.avg_ms <= 0:
                continue
            s = sum(prof[m] for m in mods)
            assert abs(s - seg.timing.avg_ms) < 1e-6 * max(
                1.0, seg.timing.avg_ms), (s, seg.timing.avg_ms)
        raw = fg.scheduler.profile(iters=2, normalize=False)
        assert set(raw) == set(prof)
    finally:
        fg.stop()


def test_long_run_no_structural_growth():
    """Soak: hundreds of cycles plus live view twiddling must not grow
    the scheduler's retained structures (leak-class regression —
    _latest/_valid/_metrics/h2d cache are keyed by port, not cycle)."""
    from cyberether_tpu.core.flowgraph import Flowgraph

    fg = Flowgraph()
    fg.block_create("sg", "signal_generator", {
        "signalType": "cosine", "signalDataType": "CF32",
        "sampleRate": 1e6, "frequency": 1e5, "bufferSize": 1024})
    fg.block_create("spec", "spectrum_engine", {"enableScale": True},
                    {"buffer": "${graph.sg.output.signal}"})
    fg.block_create("wf", "waterfall", {"height": 64},
                    {"signal": "${graph.spec.output.buffer}"})
    try:
        for _ in range(10):
            assert fg.compute(timeout=30.0)
        fg.present()
        sched = fg.scheduler
        sizes = (len(sched._latest), len(sched._valid),
                 len(sched._metrics), len(sched._h2d_cache),
                 len(sched._flag_cache), len(sched._state))
        for i in range(300):
            assert fg.compute(timeout=30.0)
            if i % 50 == 0:
                fg.present()
                fg.block_set_view("wf", {"zoom": 1.0 + (i % 3)})
        fg.present()
        after = (len(sched._latest), len(sched._valid),
                 len(sched._metrics), len(sched._h2d_cache),
                 len(sched._flag_cache), len(sched._state))
        assert after == sizes, (sizes, after)
    finally:
        fg.stop()


def test_profile_keeps_device_arrays_on_device(monkeypatch):
    """profile() must not round-trip device-resident link values
    through the host: np.asarray of a complex intermediate is
    UNIMPLEMENTED on the axon TPU backend (and a ~25 ms fetch for
    everything else).  Spy on to_device: it may only ever see
    host-side values."""
    import jax

    from cyberether_tpu.core.flowgraph import Flowgraph
    from cyberether_tpu.utils import xfer

    seen = []
    real = xfer.to_device

    def spy(v):
        seen.append(type(v))
        assert not isinstance(v, jax.Array), \
            "profile() sent a device array through to_device"
        return real(v)

    fg = Flowgraph()
    fg.block_create("sg", "signal_generator", {
        "signalType": "cosine", "signalDataType": "CF32",
        "sampleRate": 1e6, "frequency": 1e5, "bufferSize": 2048})
    fg.block_create("spec", "spectrum_engine", {"enableScale": True},
                    {"buffer": "${graph.sg.output.signal}"})
    try:
        for _ in range(2):
            assert fg.compute(timeout=30.0)
        monkeypatch.setattr(xfer, "to_device", spy)
        assert fg.scheduler.profile(iters=1)
    finally:
        fg.stop()


def test_gated_stateless_module_not_settled(flowgraph):
    """A STATELESS module that emits PASS_FLAG (squelch) must NOT be
    settled even over static inputs — settlement drops the gate and
    forces downstream validity True (r5 review finding)."""
    fg = flowgraph
    fg.block_create("win", "window", {"size": 64})
    # window amplitudes are <= 1; threshold far above -> gate FAILS
    fg.block_create("sq", "squelch", {"threshold": 1e6},
                    {"signal": "${graph.win.output.window}"})
    sched = fg.scheduler
    sched._ensure_built()
    assert "win/m" in sched._settled
    assert "sq/m" not in sched._settled
    assert fg.compute(timeout=30.0)
    # the gate evaluated False: squelch output is INVALID
    v = sched._valid.get("sq/m:signal")
    assert v is not None and not bool(np.asarray(v))
    # and the squelch's power metric is still published
    assert "sq/m" in sched.metrics()
