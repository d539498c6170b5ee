"""Scheduler honors per-block `device:` when partitioning segments
(VERDICT r1 item 3; reference partitions by (device, runtime) —
/root/reference/src/scheduler_synchronous.cc:698-748).

A graph mixing `device: cpu` and `device: tpu` JAX blocks must compile
into (at least) two device segments — one per backend — with the CPU
segment explicitly placed on the cpu backend, and still produce the
same numbers as an unpartitioned graph.
"""

import numpy as np
import pytest

from cyberether_tpu import Flowgraph
from cyberether_tpu.core.scheduler import DeviceSegment


def _mk(device_mid):
    fg = Flowgraph()
    fg.block_create("src", "dti", {"shape": [64], "dataType": "F32"})
    fg.block_create("a", "multiply_constant", {"constant": 2.0},
                    {"factor": "${graph.src.output.buffer}"},
                    device="tpu")
    fg.block_create("b", "multiply_constant", {"constant": 3.0},
                    {"factor": "${graph.a.output.product}"},
                    device=device_mid)
    fg.block_create("c", "multiply_constant", {"constant": 5.0},
                    {"factor": "${graph.b.output.product}"},
                    device="tpu")
    return fg


def test_mixed_device_graph_partitions_by_device(rng):
    x = rng.standard_normal(64).astype(np.float32)

    fg = _mk("cpu")
    try:
        fg.records["src"].build.modules["src/m"].attach_buffer(x)
        assert fg.compute(timeout=10.0)
        fg.scheduler.synchronize()
        segs = [s for s in fg.scheduler._segments
                if isinstance(s, DeviceSegment)]
        devkeys = [s.devkey for s in segs]
        # tpu -> cpu -> tpu: three device segments, alternating keys
        assert devkeys.count("cpu") == 1
        assert devkeys.count("accel") == 2
        cpu_seg = next(s for s in segs if s.devkey == "cpu")
        assert cpu_seg.modules == ["b/m"]
        # placement: explicit device only when the default backend is
        # not already the cpu (tests force the cpu platform, so the
        # cpu segment needs no explicit placement here)
        import jax
        if jax.default_backend() != "cpu":
            assert cpu_seg.device0 is not None
            assert cpu_seg.device0.platform == "cpu"
        out = np.asarray(fg.scheduler.output("c.product"))
        np.testing.assert_allclose(out, x * 30.0, rtol=1e-6)
    finally:
        fg.stop()


def test_mixed_device_matches_single_device(rng):
    x = rng.standard_normal(64).astype(np.float32)
    outs = {}
    for dev in ("tpu", "cpu"):
        fg = _mk(dev)
        try:
            fg.records["src"].build.modules["src/m"].attach_buffer(x)
            assert fg.compute(timeout=10.0)
            fg.scheduler.synchronize()
            outs[dev] = np.asarray(fg.scheduler.output("c.product"))
        finally:
            fg.stop()
    np.testing.assert_allclose(outs["cpu"], outs["tpu"], rtol=1e-6)


def test_single_device_graph_stays_fused(rng):
    """No regression: an all-default graph still compiles into ONE
    device segment (fusion is the whole point of the compiler)."""
    fg = Flowgraph()
    fg.block_create("src", "dti", {"shape": [64], "dataType": "F32"})
    fg.block_create("a", "multiply_constant", {"constant": 2.0},
                    {"factor": "${graph.src.output.buffer}"})
    fg.block_create("b", "multiply_constant", {"constant": 3.0},
                    {"factor": "${graph.a.output.product}"})
    try:
        x = rng.standard_normal(64).astype(np.float32)
        fg.records["src"].build.modules["src/m"].attach_buffer(x)
        assert fg.compute(timeout=10.0)
        segs = [s for s in fg.scheduler._segments
                if isinstance(s, DeviceSegment)]
        assert len(segs) == 1
    finally:
        fg.stop()


def test_burst_feeds_per_cycle_values_across_segments(rng):
    """compute_burst across a device-segment boundary: a STATEFUL
    upstream accel segment produces different values each cycle; the
    downstream `device: cpu` segment must see each cycle's value, not
    the upstream's pre-burst output broadcast k times (r5 review
    finding)."""
    def build():
        fg = Flowgraph()
        # device-side stateful source: the phase accumulator makes
        # every cycle's output genuinely different
        fg.block_create("gen", "signal_generator",
                        {"signalType": "cosine",
                         "signalDataType": "F32",
                         "sampleRate": 1e6, "frequency": 12345.0,
                         "bufferSize": 256}, device="tpu")
        fg.block_create("c", "multiply_constant", {"constant": 2.0},
                        {"factor": "${graph.gen.output.signal}"},
                        device="cpu")
        return fg

    fg_seq, fg_burst = build(), build()
    try:
        # sequential truth: 4 cycles
        for _ in range(4):
            assert fg_seq.compute(timeout=30.0)
        ref = np.asarray(fg_seq.scheduler.output("c.product"))

        assert fg_burst.compute(timeout=30.0)      # cycle 1
        assert fg_burst.scheduler.compute_burst(3, timeout=60.0) == 3
        got = np.asarray(fg_burst.scheduler.output("c.product"))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
        # non-vacuous: the source really changes between cycles
        fg2 = build()
        try:
            assert fg2.compute(timeout=30.0)
            first = np.asarray(fg2.scheduler.output("c.product"))
        finally:
            fg2.stop()
        assert not np.allclose(first, ref, rtol=1e-6, atol=1e-6)
    finally:
        fg_seq.stop()
        fg_burst.stop()


def test_complex_link_across_device_segments(rng):
    """A complex link from an accel segment into a `device: cpu`
    segment crosses as tagged planes and must recombine on entry (r5
    review finding: the consumer traced over a raw dict)."""
    buf = (rng.standard_normal(64)
           + 1j * rng.standard_normal(64)).astype(np.complex64)
    fg = Flowgraph()
    fg.block_create("src", "dti", {"shape": [64],
                                   "dataType": "CF32"})
    fg.records["src"].build.modules["src/m"].attach_buffer(buf)
    fg.block_create("g", "agc", {},
                    {"signal": "${graph.src.output.buffer}"},
                    device="tpu")
    fg.block_create("c", "amplitude", {},
                    {"signal": "${graph.g.output.signal}"},
                    device="cpu")
    try:
        assert fg.compute(timeout=30.0)
        bad = {b: fg.block_error(b) for b in fg.records
               if fg.block_state(b).value != "complete"}
        assert not bad, bad
        out = np.asarray(fg.scheduler.output("c.signal"))
        assert out.dtype == np.float32 and out.shape == (64,)
        assert np.isfinite(out).all()
        # burst path too
        assert fg.scheduler.compute_burst(2, timeout=60.0) == 2
    finally:
        fg.stop()
