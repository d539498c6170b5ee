"""Circular sample buffer decoupling hardware ingest from compute.

Reference: ``Tools::CircularBuffer`` with blocking ``waitForSize`` and
overflow policies (/root/reference/include/jetstream/tools/circular_buffer.hh:12-30)
— the piece that lets a SoapySDR driver thread run free while
``hasPendingCompute`` paces the graph.

A native C++ lock-free SPSC implementation lives in ``native/``
(:mod:`cyberether_tpu.io.native`); this Python class is the always-
available fallback with identical semantics, operating on contiguous
numpy blocks.
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np


def make_ring(capacity: int, dtype=np.complex64):
    """Return the native lock-free ring when the toolchain built it,
    else the pure-Python fallback (identical semantics)."""
    try:
        from cyberether_tpu.io import native

        if native.available():
            return native.NativeRing(capacity, dtype)
    except Exception:
        pass
    return CircularBuffer(capacity, dtype)


class CircularBuffer:
    """Thread-safe byte/sample ring over a numpy array.

    Overflow policy matches the reference default: old data is dropped
    (producer never blocks), an ``overflows`` counter is kept.
    """

    def __init__(self, capacity: int, dtype=np.complex64):
        self._buf = np.zeros(int(capacity), dtype=dtype)
        self._capacity = int(capacity)
        self._head = 0           # write index
        self._occupancy = 0
        self._lock = threading.Lock()
        self._data_ready = threading.Condition(self._lock)
        self.overflows = 0
        self._closed = False

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def occupancy(self) -> int:
        with self._lock:
            return self._occupancy

    def reset(self) -> None:
        with self._lock:
            self._head = 0
            self._occupancy = 0
            self.overflows = 0

    def close(self) -> None:
        with self._data_ready:
            self._closed = True
            self._data_ready.notify_all()

    def put(self, data: np.ndarray) -> None:
        data = np.ascontiguousarray(data).ravel()
        n = data.size
        with self._data_ready:
            if n >= self._capacity:
                data = data[-self._capacity:]
                n = data.size
            end = self._head + n
            if end <= self._capacity:
                self._buf[self._head:end] = data
            else:
                first = self._capacity - self._head
                self._buf[self._head:] = data[:first]
                self._buf[:end - self._capacity] = data[first:]
            self._head = end % self._capacity
            new_occ = self._occupancy + n
            if new_occ > self._capacity:
                self.overflows += 1
                new_occ = self._capacity
            self._occupancy = new_occ
            self._data_ready.notify_all()

    def wait_for_size(self, n: int, timeout: Optional[float] = None) -> bool:
        """Block until at least ``n`` samples are available."""
        with self._data_ready:
            return self._data_ready.wait_for(
                lambda: self._occupancy >= n or self._closed, timeout) \
                and not self._closed

    def get(self, n: int) -> Optional[np.ndarray]:
        """Pop exactly ``n`` samples (oldest first) or None if starved."""
        with self._lock:
            if self._occupancy < n:
                return None
            start = (self._head - self._occupancy) % self._capacity
            end = start + n
            if end <= self._capacity:
                out = self._buf[start:end].copy()
            else:
                out = np.concatenate(
                    [self._buf[start:], self._buf[:end - self._capacity]])
            self._occupancy -= n
            return out
