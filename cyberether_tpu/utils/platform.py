"""Platform utilities.

Reference: src/platform/ — paths (XDG dirs), persistent storage,
file locks, processes.  The pieces that survive the move to Python.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import subprocess
from typing import Iterator, List, Optional


def data_dir() -> str:
    base = os.environ.get("XDG_DATA_HOME",
                          os.path.expanduser("~/.local/share"))
    path = os.path.join(base, "cyberether_tpu")
    os.makedirs(path, exist_ok=True)
    return path


def cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.expanduser("~/.cache"))
    path = os.path.join(base, "cyberether_tpu")
    os.makedirs(path, exist_ok=True)
    return path


@contextlib.contextmanager
def file_lock(path: str, blocking: bool = True) -> Iterator[bool]:
    """Advisory exclusive lock (src/platform/file_lock.cc).  Yields
    True if the lock was acquired."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    got = False
    try:
        flags = fcntl.LOCK_EX | (0 if blocking else fcntl.LOCK_NB)
        try:
            fcntl.flock(fd, flags)
            got = True
        except OSError:
            got = False
        yield got
    finally:
        if got:
            fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def run_process(argv: List[str], timeout: Optional[float] = None
                ) -> subprocess.CompletedProcess:
    """Spawn a child process (src/platform/process.cc)."""
    return subprocess.run(argv, capture_output=True, text=True,
                          timeout=timeout)


def fetch_url(url: str, timeout: float = 10.0) -> bytes:
    """HTTP(S) fetch (src/platform/url.cc)."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.read()
