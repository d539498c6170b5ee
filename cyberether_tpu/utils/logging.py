"""Leveled logger — the JST_TRACE/DEBUG/INFO/WARN/ERROR/FATAL analog
(/root/reference/include/jetstream/logger.hh:24-45, src/logger.cc):
runtime level, sink redirection, and last-warning/error capture reused as
block diagnostics in UIs.
"""

from __future__ import annotations

import collections
import logging
import os
import sys
import threading
import time as _time
from typing import Dict, List, Optional

_LAST = {"warning": "", "error": ""}
_LAST_LOCK = threading.Lock()
#: ring of recent records for the editor's log panel (the reference
#: keeps a scrollback sink the debug window renders)
_RING: "collections.deque" = collections.deque(maxlen=500)


class _CaptureHandler(logging.Handler):
    def emit(self, record: logging.LogRecord) -> None:
        with _LAST_LOCK:
            _RING.append({"ts": _time.time(),
                          "level": record.levelname,
                          "name": record.name,
                          "msg": record.getMessage()})
        if record.levelno >= logging.ERROR:
            key = "error"
        elif record.levelno >= logging.WARNING:
            key = "warning"
        else:
            return
        with _LAST_LOCK:
            _LAST[key] = record.getMessage()


_root = logging.getLogger("cyberether")
_root.addHandler(_CaptureHandler())
if not any(isinstance(h, logging.StreamHandler) for h in _root.handlers):
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname).1s [%(name)s] %(message)s", "%H:%M:%S"))
    _root.addHandler(h)
_root.setLevel(os.environ.get("CYBERETHER_LOG", "WARNING").upper())


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(f"cyberether.{name}")


def set_level(level: "int | str") -> None:
    _root.setLevel(level if isinstance(level, int) else level.upper())


def last_warning() -> str:
    with _LAST_LOCK:
        return _LAST["warning"]


def last_error() -> str:
    with _LAST_LOCK:
        return _LAST["error"]


def recent_records(n: int = 200) -> List[Dict]:
    """Last ``n`` captured records (oldest first) — feeds the editor's
    log panel text grid."""
    with _LAST_LOCK:
        items = list(_RING)
    return items[-n:]
