"""psk_demod tests: loop convergence on clean QPSK/BPSK streams."""

import numpy as np
import pytest

from cyberether_tpu.core.types import ValidationError
from cyberether_tpu.testing import TestContext


def _qpsk_symbols(rng, n):
    bits = rng.integers(0, 4, n)
    return np.exp(1j * (np.pi / 4 + bits * np.pi / 2)) \
        .astype(np.complex64)


def _upsample(symbols, sps):
    """Rectangular pulse shaping (adequate for loop tests)."""
    return np.repeat(symbols, sps).astype(np.complex64)


def test_psk_validation():
    with pytest.raises(ValidationError):
        TestContext("psk_demod", {"pskType": "16qam"}) \
            .set_input("signal", np.zeros(64, np.complex64)).run()
    with pytest.raises(ValidationError):
        TestContext("psk_demod", {"sampleRate": 1e6,
                                  "symbolRate": 2e6}) \
            .set_input("signal", np.zeros(64, np.complex64)).run()


def test_psk_output_shape_and_rate():
    ctx = TestContext("psk_demod", {"sampleRate": 4e6,
                                    "symbolRate": 1e6})
    ctx.set_input("signal", np.zeros(256, np.complex64))
    spec = ctx.output_spec("signal")
    assert spec.shape == (64,)
    assert spec.attr("sampleRate") == 1e6


def test_psk_qpsk_convergence(rng):
    sps = 4
    nsym_per_block = 64
    ctx = TestContext("psk_demod",
                      {"pskType": "qpsk", "sampleRate": 4e6,
                       "symbolRate": 1e6,
                       "frequencyLoopBandwidth": 0.05,
                       "timingLoopBandwidth": 0.05})
    all_out = []
    # stream several blocks; after convergence symbols should sit near
    # the unit circle QPSK points
    for it in range(8):
        syms = _qpsk_symbols(rng, nsym_per_block)
        block = _upsample(syms, sps)
        if it == 0:
            ctx.set_input("signal", block)
        else:
            ctx._inputs["signal"] = block
        ctx.run()
        if ctx.passed:
            all_out.append(ctx.output("signal").copy())
    assert len(all_out) >= 4
    tail = np.concatenate(all_out[2:])
    # decision distance: recovered symbols near constellation points
    ang = np.angle(tail)
    # distance to the nearest diagonal constellation point pi/4 + k*pi/2
    dist = np.abs(np.remainder(ang, np.pi / 2) - np.pi / 4)
    assert np.median(dist) < 0.25
    mags = np.abs(tail)
    assert 0.7 < np.median(mags) < 1.3


def test_psk_bpsk_convergence(rng):
    sps = 4
    ctx = TestContext("psk_demod",
                      {"pskType": "bpsk", "sampleRate": 4e6,
                       "symbolRate": 1e6})
    outs = []
    for it in range(8):
        syms = (2.0 * rng.integers(0, 2, 64) - 1.0).astype(np.complex64)
        block = _upsample(syms, sps)
        if it == 0:
            ctx.set_input("signal", block)
        else:
            ctx._inputs["signal"] = block
        ctx.run()
        if ctx.passed:
            outs.append(ctx.output("signal").copy())
    tail = np.concatenate(outs[2:])
    # BPSK: real-axis concentration
    assert np.median(np.abs(tail.imag)) < 0.3


def test_psk_8psk_convergence(rng):
    """8PSK loop lock (reference module_tests.cc 8psk sections):
    recovered symbols concentrate on the 8 constellation angles."""
    sps = 4
    ctx = TestContext("psk_demod",
                      {"pskType": "8psk", "sampleRate": 4e6,
                       "symbolRate": 1e6,
                       "frequencyLoopBandwidth": 0.03,
                       "timingLoopBandwidth": 0.03})
    outs = []
    for it in range(10):
        bits = rng.integers(0, 8, 64)
        syms = np.exp(1j * bits * np.pi / 4).astype(np.complex64)
        block = _upsample(syms, sps)
        if it == 0:
            ctx.set_input("signal", block)
        else:
            ctx._inputs["signal"] = block
        ctx.run()
        if ctx.passed:
            outs.append(ctx.output("signal").copy())
    tail = np.concatenate(outs[3:])
    ang = np.angle(tail)
    dist = np.abs(np.remainder(ang + np.pi / 8, np.pi / 4)
                  - np.pi / 8)
    assert np.median(dist) < 0.2
    assert 0.7 < np.median(np.abs(tail)) < 1.3


def test_psk_frequency_offset_tracking(rng):
    """Costas loop pulls in a small carrier offset (reference
    frequency-offset sections): the frequencyError metric converges to
    the per-sample offset and the constellation tightens."""
    sps = 4
    f_off = 0.002                     # rad/sample carrier offset
    ctx = TestContext("psk_demod",
                      {"pskType": "qpsk", "sampleRate": 4e6,
                       "symbolRate": 1e6,
                       "frequencyLoopBandwidth": 0.08,
                       "timingLoopBandwidth": 0.05})
    n = 0
    freqs = []
    outs = []
    for it in range(14):
        syms = _qpsk_symbols(rng, 64)
        block = _upsample(syms, sps)
        rot = np.exp(1j * f_off * (n + np.arange(block.size)))
        n += block.size
        block = (block * rot).astype(np.complex64)
        if it == 0:
            ctx.set_input("signal", block)
        else:
            ctx._inputs["signal"] = block
        ctx.run()
        freqs.append(float(ctx.metrics["frequencyError"]))
        if ctx.passed:
            outs.append(ctx.output("signal").copy())
    # the loop's frequency register tracks ~sps * f_off per symbol
    assert abs(freqs[-1] - f_off * sps) < 0.5 * f_off * sps
    tail = np.concatenate(outs[len(outs) // 2:])
    dist = np.abs(np.remainder(np.angle(tail), np.pi / 2) - np.pi / 4)
    assert np.median(dist) < 0.3


def test_psk_reconfigure_preserves_stream():
    """block_reconfigure through the real flowgraph path (reference
    reconfigure sections): loop retuning keeps the block complete and
    the graph running."""
    from cyberether_tpu.core.flowgraph import Flowgraph

    rng = np.random.default_rng(5)
    buf = _upsample(_qpsk_symbols(rng, 64), 4)
    fg = Flowgraph()
    fg.block_create("src", "dti",
                    {"shape": [int(buf.size)], "dataType": "CF32"})
    fg.records["src"].build.modules["src/m"].attach_buffer(buf)
    fg.block_create("psk", "psk_demod",
                    {"pskType": "qpsk", "sampleRate": 4e6,
                     "symbolRate": 1e6},
                    {"signal": "${graph.src.output.buffer}"})
    try:
        assert fg.compute(timeout=60.0)
        fg.block_reconfigure("psk", {
            "pskType": "qpsk", "sampleRate": 4e6,
            "symbolRate": 1e6, "frequencyLoopBandwidth": 0.1})
        assert fg.block_state("psk").value == "complete"
        assert fg.compute(timeout=60.0)
    finally:
        fg.stop()
