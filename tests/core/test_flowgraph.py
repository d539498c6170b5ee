"""Flowgraph graph-semantics tests.

Mirrors the reference suites tests/core/flowgraph/{api,execution,
mutation,state}.cc and tests/core/runtime/scheduler.cc: lifecycle,
error isolation, incomplete retry, downstream propagation, rollback,
topo order, diamond execution, cycle rejection, skip propagation.
"""

import numpy as np
import pytest

from cyberether_tpu.core.types import BlockState, GraphError
from tests.support import synthetic

synthetic.register()


@pytest.fixture(autouse=True)
def _reset_faults():
    synthetic.reset()
    yield
    synthetic.reset()


def _sink_mod(fg, name):
    rec = fg.records[name]
    return rec.build.modules[f"{name}/m"]


def test_linear_chain_runs(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 4})
    fg.block_create("p1", "synth_pass", {}, {"in": "${graph.src.output.out}"})
    fg.block_create("sink", "synth_sink", {}, {"in": "${graph.p1.output.out}"})
    assert fg.compute(timeout=5.0)
    sink = _sink_mod(fg, "sink")
    assert len(sink.received) == 1
    np.testing.assert_allclose(sink.received[0], np.full(4, 2.0))


def test_diamond_executes_once_per_cycle(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 4})
    fg.block_create("a", "synth_pass", {}, {"in": "${graph.src.output.out}"})
    fg.block_create("b", "synth_pass", {}, {"in": "${graph.src.output.out}"})
    fg.block_create("m", "synth_merge", {}, {"a": "${graph.a.output.out}",
                                             "b": "${graph.b.output.out}"})
    fg.block_create("sink", "synth_sink", {}, {"in": "${graph.m.output.out}"})
    assert fg.compute(timeout=5.0)
    sink = _sink_mod(fg, "sink")
    # src produced 1.0; each pass adds 1 -> 2; merge sums -> 4
    np.testing.assert_allclose(sink.received[0], np.full(4, 4.0))
    assert synthetic.COUNTS["src/m"] == 1


def test_cycle_rejected(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 4})
    fg.block_create("p1", "synth_pass", {}, {"in": "${graph.src.output.out}"})
    # create a cycle by reconnecting p1's input to its own downstream
    fg.block_create("p2", "synth_pass", {}, {"in": "${graph.p1.output.out}"})
    with pytest.raises(GraphError):
        fg.block_connect("p1", "in", "${graph.p2.output.out}")
        fg.compute(timeout=1.0)


def test_unresolved_input_is_incomplete(flowgraph):
    fg = flowgraph
    fg.block_create("p1", "synth_pass", {},
                    {"in": "${graph.missing.output.out}"})
    assert fg.block_state("p1") == BlockState.INCOMPLETE


def test_incomplete_retry_on_producer_arrival(flowgraph):
    fg = flowgraph
    fg.block_create("p1", "synth_pass", {},
                    {"in": "${graph.src.output.out}"})
    assert fg.block_state("p1") == BlockState.INCOMPLETE
    fg.block_create("src", "synth_source", {"size": 4})
    assert fg.block_state("p1") == BlockState.COMPLETE


def test_unwired_block_is_incomplete_then_connects(flowgraph):
    """A block dropped with no input links waits (Incomplete) and
    completes when connected — editor drop-then-wire flow
    (flowgraph.cc:1177 retryIncompleteBlocks)."""
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 4})
    fg.block_create("p1", "synth_pass", {})          # no inputs yet
    assert fg.block_state("p1") == BlockState.INCOMPLETE
    assert "waiting" in fg.block_error("p1")
    fg.block_connect("p1", "in", "${graph.src.output.out}")
    assert fg.block_state("p1") == BlockState.COMPLETE
    assert fg.compute(timeout=5.0)


def test_fault_isolates_block_and_downstream(flowgraph):
    fg = flowgraph
    synthetic.FAULTS["bad/m"] = "create"
    fg.block_create("src", "synth_source", {"size": 4})
    fg.block_create("bad", "synth_pass", {},
                    {"in": "${graph.src.output.out}"})
    fg.block_create("down", "synth_pass", {},
                    {"in": "${graph.bad.output.out}"})
    fg.block_create("ok", "synth_pass", {},
                    {"in": "${graph.src.output.out}"})
    assert fg.block_state("bad") == BlockState.ERRORED
    assert "injected fault" in fg.block_error("bad")
    assert fg.block_state("down") == BlockState.INCOMPLETE
    assert fg.block_state("ok") == BlockState.COMPLETE
    # healthy branch still computes
    assert fg.compute(timeout=5.0)


def test_fault_recovery_via_retry(flowgraph):
    fg = flowgraph
    synthetic.FAULTS["bad/m"] = "create"
    fg.block_create("src", "synth_source", {"size": 4})
    fg.block_create("bad", "synth_pass", {},
                    {"in": "${graph.src.output.out}"})
    assert fg.block_state("bad") == BlockState.ERRORED
    synthetic.reset()
    fg.block_reconfigure("bad", {})
    assert fg.block_state("bad") == BlockState.COMPLETE


def test_reconfigure_rollback_on_failure(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 4})
    assert fg.block_state("src") == BlockState.COMPLETE
    with pytest.raises(Exception):
        fg.block_reconfigure("src", {"size": "not-a-number"})
    assert fg.block_state("src") == BlockState.COMPLETE
    assert fg.records["src"].raw_config == {"size": 4}


def test_destroy_propagates_downstream(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 4})
    fg.block_create("p1", "synth_pass", {}, {"in": "${graph.src.output.out}"})
    fg.block_destroy("src")
    assert fg.block_state("p1") == BlockState.INCOMPLETE
    assert "src" not in fg.records


def test_stateful_state_advances(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 4})
    fg.block_create("st", "synth_stateful", {},
                    {"in": "${graph.src.output.out}"})
    fg.block_create("sink", "synth_sink", {}, {"in": "${graph.st.output.out}"})
    for _ in range(3):
        assert fg.compute(timeout=5.0)
    sink = _sink_mod(fg, "sink")
    # cycle k: src produces k, stateful adds its count k -> 2k
    np.testing.assert_allclose(sink.received[2], np.full(4, 6.0))


def test_duplicate_name_rejected(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 4})
    with pytest.raises(GraphError):
        fg.block_create("src", "synth_source", {"size": 4})


def test_unknown_block_type_rejected(flowgraph):
    with pytest.raises(GraphError):
        flowgraph.block_create("x", "does_not_exist")


def test_view_snapshot(flowgraph):
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 4})
    v = fg.view()
    assert v["blocks"]["src"]["state"] == "complete"
    assert v["blocks"]["src"]["outputs"]["out"]["shape"] == [4]


def test_environment_kv_and_timestamps(flowgraph):
    env = flowgraph.environment
    env.set("freq", 100e6)
    assert env.get("freq") == 100e6
    assert env.timestamp("freq") is not None
    assert "freq" in env.keys()
    seen = []
    env.subscribe(lambda k, v: seen.append((k, v)))
    env.set("rate", 2e6)
    assert seen == [("rate", 2e6)]


def test_retry_errored_blocks_recovers_runtime_failures():
    """Transient runtime failures (device hiccups) are recoverable:
    retry_errored_blocks flips errored blocks back through the normal
    retry pass (VERDICT r3 — a dropped remote-compile response must
    not permanently kill a valid block)."""
    from cyberether_tpu import Flowgraph
    from cyberether_tpu.core.types import BlockState

    fg = Flowgraph()
    fg.block_create("gen", "signal_generator",
                    {"signalType": "cosine", "bufferSize": 256})
    fg.block_create("amp", "amplitude", {},
                    {"signal": "${graph.gen.output.signal}"})
    assert fg.compute(timeout=30.0)
    # simulate a runtime compute failure (the scheduler's isolation
    # path): owner errored, downstream incomplete
    fg.mark_modules_errored(["gen/m"], "transient backend failure")
    assert fg.block_state("gen") is BlockState.ERRORED
    assert fg.block_state("amp") is BlockState.INCOMPLETE
    fg.retry_errored_blocks()
    assert fg.block_state("gen") is BlockState.COMPLETE
    assert fg.block_state("amp") is BlockState.COMPLETE
    assert fg.compute(timeout=30.0)
    fg.stop()


def test_view_params_persist_through_yaml():
    """Live view updates (zoom/offset via block_set_view) land in
    raw_config and therefore survive YAML export -> import."""
    from cyberether_tpu import Flowgraph

    fg = Flowgraph()
    fg.block_create("gen", "signal_generator",
                    {"signalType": "cosine", "bufferSize": 256})
    fg.block_create("wf", "waterfall", {"height": 64},
                    {"signal": "${graph.gen.output.signal}"})
    assert fg.compute(timeout=30.0)
    fg.block_set_view("wf", {"zoom": 8.0, "offset": 32})
    text = fg.to_yaml()
    fg.stop()
    fg2 = Flowgraph.from_yaml(text)
    assert fg2.records["wf"].raw_config["zoom"] == 8.0
    assert fg2.records["wf"].raw_config["offset"] == 32
    fg2.stop()


def test_downstream_recreate_is_topological(flowgraph):
    """Reconfiguring a producer rebuilds transitive consumers
    producer-first — insertion order would re-resolve a consumer
    against an intermediate producer's STALE build and leave it
    COMPLETE with stale specs (r5 review finding, repro-confirmed)."""
    fg = flowgraph
    # create the SINK first so insertion order is [sink, p, src]
    fg.block_create("sink", "synth_pass", {},
                    {"in": "${graph.p.output.out}"})
    fg.block_create("p", "synth_pass", {},
                    {"in": "${graph.src.output.out}"})
    fg.block_create("src", "synth_source", {"size": 4})
    assert fg.block_state("sink") is BlockState.COMPLETE

    fg.block_reconfigure("src", {"size": 8})
    assert fg.block_state("sink") is BlockState.COMPLETE
    sink_spec = fg.records["sink"].build.modules["sink/m"] \
        .input_specs["in"]
    assert sink_spec.shape == (8,), sink_spec.shape


def test_unexpected_exception_isolates_to_block(flowgraph):
    """A non-Validation exception from block construction must mark
    the block ERRORED, not escape (r5 review finding)."""
    from cyberether_tpu.core.module import Module
    from cyberether_tpu.core.registry import (register_block,
                                              register_module,
                                              registry)
    from cyberether_tpu.core.block import simple_block
    from cyberether_tpu.core.params import Schema
    from cyberether_tpu.core.tensor import TensorSpec
    from cyberether_tpu.core.types import DataType

    if not registry.has_block("boom"):
        @register_module
        class BoomModule(Module):
            module_type = "boom"
            input_ports = ()
            output_ports = ("out",)
            schema = Schema()

            def create(self):
                raise ZeroDivisionError("kapow")
                return {"out": TensorSpec((4,), DataType.F32)}

            def apply(self, inputs, state):
                return {"out": None}, state

        register_block(simple_block("boom"))

    fg = flowgraph
    rec = fg.block_create("b", "boom", {})
    assert rec.state is BlockState.ERRORED
    assert "ZeroDivisionError" in rec.error


def test_block_name_validation(flowgraph):
    """Names with '/' or '.' silently break error isolation and link
    resolution — rejected at create (r5 review finding)."""
    fg = flowgraph
    for bad in ("iq/src", "my.src", "a b", "x${y}"):
        with pytest.raises(GraphError, match="invalid block name"):
            fg.block_create(bad, "synth_source", {"size": 4})


def test_bad_link_shorthand_raises_at_connect(flowgraph):
    """A dotted port in the 'X.Y' shorthand can never match the link
    regex — block_connect must fail loudly instead of leaving the
    consumer permanently INCOMPLETE (r5 review finding)."""
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 4})
    fg.block_create("c", "synth_pass", {})
    with pytest.raises(GraphError, match="invalid link"):
        fg.block_connect("c", "in", "src.out.x")


def test_reconfigure_noop_skips_rebuild(flowgraph):
    """Re-sending an identical config to a COMPLETE block must not
    tear down and rebuild it (r5 review finding: a spammy UI client
    forced multi-second recompiles for no-ops)."""
    fg = flowgraph
    fg.block_create("src", "synth_source", {"size": 4})
    fg.block_create("p1", "synth_pass", {},
                    {"in": "${graph.src.output.out}"})
    build_before = fg.records["p1"].build
    fg.block_reconfigure("src", {"size": 4})     # identical
    assert fg.records["p1"].build is build_before
    fg.block_reconfigure("src", {"size": 8})     # real change
    assert fg.records["p1"].build is not build_before
