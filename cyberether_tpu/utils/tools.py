"""Concurrency utilities.

Reference: Tools::Snapshot (lock-free published snapshot,
include/jetstream/tools/snapshot.hh:14-25) used for cross-thread metric
reads, and Tools::Juggler (buffer pool) used to recycle frame buffers
(include/jetstream/tools/).
"""

from __future__ import annotations

import threading
from collections import deque
from typing import Any, Callable, Deque, Generic, List, Optional, TypeVar

T = TypeVar("T")


class Snapshot(Generic[T]):
    """Single-writer / many-reader published value.  Python reference
    assignment is atomic, so publish/get are lock-free; a version
    counter lets readers detect updates."""

    def __init__(self, initial: Optional[T] = None):
        self._cell = (0, initial)

    def publish(self, value: T) -> None:
        version, _ = self._cell
        self._cell = (version + 1, value)

    def get(self) -> Optional[T]:
        return self._cell[1]

    @property
    def version(self) -> int:
        return self._cell[0]


class Juggler(Generic[T]):
    """Fixed-size buffer pool: producers ``acquire`` a recycled object
    (or a freshly built one up to ``capacity``), consumers ``release``
    it back.  Keeps steady-state streaming allocation-free."""

    def __init__(self, factory: Callable[[], T], capacity: int = 4):
        self._factory = factory
        self._capacity = capacity
        self._free: Deque[T] = deque()
        self._outstanding = 0
        self._lock = threading.Lock()
        self._returned = threading.Condition(self._lock)

    def acquire(self, timeout: Optional[float] = None) -> Optional[T]:
        with self._returned:
            if not self._free and self._outstanding < self._capacity:
                self._outstanding += 1
                return self._factory()
            if not self._free:
                if not self._returned.wait_for(lambda: self._free,
                                               timeout):
                    return None
            self._outstanding += 1
            return self._free.popleft()

    def release(self, obj: T) -> None:
        with self._returned:
            self._outstanding -= 1
            self._free.append(obj)
            self._returned.notify()

    @property
    def outstanding(self) -> int:
        with self._lock:
            return self._outstanding
