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
