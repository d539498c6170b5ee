"""Remote SDR driver (SoapyRemote cognate): a soapy block streaming
through the TCP remote driver matches the local test-tone driver."""

import numpy as np
import pytest

from cyberether_tpu import Flowgraph
from cyberether_tpu.io.remote_sdr import (RemoteSdrDevice,
                                          RemoteSdrServer)


def test_remote_device_roundtrip():
    server = RemoteSdrServer(host="127.0.0.1").start()
    try:
        dev = RemoteSdrDevice({
            "deviceString": f"remote=127.0.0.1:{server.port},"
                            "driver=test",
            "sampleRate": 1e6})
        a = dev.read(4096)
        b = dev.read(4096)
        assert a.shape == (4096,) and a.dtype == np.complex64
        # phase-continuous stream (the server holds driver state)
        assert not np.allclose(a, b)
        dev.close()
    finally:
        server.stop()


def test_remote_matches_local_driver():
    from cyberether_tpu.blocks.io import _TestToneDriver

    server = RemoteSdrServer(host="127.0.0.1").start()
    try:
        dev = RemoteSdrDevice({
            "deviceString": f"remote=127.0.0.1:{server.port},"
                            "driver=test",
            "sampleRate": 1e6})
        local = _TestToneDriver({"sampleRate": 1e6})
        got = np.concatenate([dev.read(1000), dev.read(1000)])
        want = np.concatenate([local.read(1000), local.read(1000)])
        np.testing.assert_allclose(got, want, atol=1e-6)
        dev.close()
    finally:
        server.stop()


def test_soapy_block_over_remote_driver():
    server = RemoteSdrServer(host="127.0.0.1").start()
    fg = Flowgraph()
    try:
        fg.block_create("sdr", "soapy", {
            "deviceString": f"remote=127.0.0.1:{server.port},"
                            "driver=test",
            "sampleRate": 1e6, "numberOfBatches": 1,
            "numberOfTimeSamples": 2048})
        fg.block_create("amp", "amplitude",
                        {}, {"signal": "${graph.sdr.output.signal}"})
        out = None
        for _ in range(100):
            fg.compute(timeout=10.0)
            out = fg.scheduler.output("amp.signal")
            if out is not None:
                break
        assert out is not None, \
            {b: fg.block_error(b) for b in fg.records}
        out = np.asarray(out)
        assert out.size >= 2048 and np.isfinite(out).all()
    finally:
        fg.stop()
        server.stop()


@pytest.mark.parametrize("wire", ["cf32", "cs16", "cs8"])
def test_wire_formats_roundtrip(wire):
    """CS8/CS16 wire formats (the SoapyRemote bandwidth modes): the
    server quantizes, the client decodes through the native
    converters; tone fidelity survives at the format's LSB."""
    from cyberether_tpu.io.remote_sdr import (RemoteSdrDevice,
                                              RemoteSdrServer)

    server = RemoteSdrServer(host="127.0.0.1").start()
    try:
        d = RemoteSdrDevice({
            "deviceString": f"remote=127.0.0.1:{server.port},"
                            f"driver=test,wire={wire}",
            "sampleRate": 1e6, "frequency": 1e5})
        iq = d.read(4096)
        d.close()
    finally:
        server.stop()
    assert iq is not None and iq.dtype == np.complex64
    assert iq.size == 4096
    # the test driver emits a unit-amplitude tone: quantization noise
    # bounded by ~1 LSB of the wire format
    assert np.abs(np.abs(iq).max() - np.abs(iq).mean()) < 0.5
    spec = np.abs(np.fft.fft(iq))
    peak = spec.max()
    floor = np.median(spec)
    assert peak > 100 * max(floor, 1e-12)   # tone still dominant
    # the test tone carries noise slightly above unit amplitude; the
    # quantized formats clamp at 1.0 so everything stays bounded
    assert np.all(np.abs(iq.real) <= 1.1)


def test_wire_format_rejected():
    from cyberether_tpu.io.remote_sdr import _parse_remote

    with pytest.raises(ValueError, match="wire"):
        _parse_remote("remote=h:1,wire=nope")
