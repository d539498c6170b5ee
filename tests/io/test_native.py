"""Native runtime library tests (ring buffer + IQ file readahead),
mirroring the reference's circular_buffer suite
(/root/reference/tests/core/tools/circular_buffer.cc).
"""

import os
import threading

import numpy as np
import pytest

from cyberether_tpu.io import native
from cyberether_tpu.io.ringbuffer import CircularBuffer

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_ring_put_get_roundtrip(rng):
    ring = native.NativeRing(1024, np.complex64)
    data = (rng.standard_normal(256)
            + 1j * rng.standard_normal(256)).astype(np.complex64)
    ring.put(data)
    assert ring.occupancy == 256
    out = ring.get(256)
    np.testing.assert_array_equal(out, data)
    assert ring.occupancy == 0
    assert ring.get(1) is None


def test_ring_wraparound(rng):
    ring = native.NativeRing(100, np.float32)
    for i in range(10):
        ring.put(np.full(30, i, np.float32))
        got = ring.get(30)
        np.testing.assert_array_equal(got, np.full(30, i, np.float32))


def test_ring_overflow_drops_oldest():
    ring = native.NativeRing(100, np.float32)
    ring.put(np.arange(80, dtype=np.float32))
    ring.put(np.arange(80, 160, dtype=np.float32))
    assert ring.overflows >= 1
    assert ring.occupancy == 100
    out = ring.get(100)
    np.testing.assert_array_equal(out, np.arange(60, 160,
                                                 dtype=np.float32))


def test_ring_blocking_wait():
    ring = native.NativeRing(1 << 12, np.float32)
    result = {}

    def consumer():
        result["ok"] = ring.wait_for_size(100, timeout=5.0)
        result["data"] = ring.get(100)

    t = threading.Thread(target=consumer)
    t.start()
    ring.put(np.arange(100, dtype=np.float32))
    t.join(timeout=5.0)
    assert result["ok"]
    np.testing.assert_array_equal(result["data"],
                                  np.arange(100, dtype=np.float32))


def test_ring_wait_timeout():
    ring = native.NativeRing(64, np.float32)
    assert not ring.wait_for_size(10, timeout=0.05)


def test_ring_close_unblocks():
    ring = native.NativeRing(64, np.float32)
    done = threading.Event()

    def consumer():
        ring.wait_for_size(10, timeout=10.0)
        done.set()

    t = threading.Thread(target=consumer)
    t.start()
    ring.close()
    t.join(timeout=2.0)
    assert done.is_set()


def test_iq_file_reader(tmp_path, rng):
    data = (rng.standard_normal(10000)
            + 1j * rng.standard_normal(10000)).astype(np.complex64)
    path = str(tmp_path / "capture.iq")
    data.tofile(path)
    f = native.NativeIqFile(path, np.complex64, loop=True)
    assert f.file_size == data.nbytes
    got = f.read(4096, timeout=5.0)
    np.testing.assert_array_equal(got, data[:4096])
    got2 = f.read(4096, timeout=5.0)
    np.testing.assert_array_equal(got2, data[4096:8192])
    # loop wraps around
    got3 = f.read(4096, timeout=5.0)
    np.testing.assert_array_equal(got3[:1808], data[8192:])
    np.testing.assert_array_equal(got3[1808:], data[:2288])
    f.close()


def test_python_fallback_ring_same_semantics(rng):
    """The pure-python CircularBuffer must match native behavior."""
    ring = CircularBuffer(100, np.float32)
    ring.put(np.arange(80, dtype=np.float32))
    ring.put(np.arange(80, 160, dtype=np.float32))
    assert ring.overflows >= 1
    assert ring.occupancy == 100
    out = ring.get(100)
    np.testing.assert_array_equal(out, np.arange(60, 160,
                                                 dtype=np.float32))
