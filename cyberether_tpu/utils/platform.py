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


def has_display() -> bool:
    """True when a windowing system is reachable (native dialogs make
    sense); headless deployments return False."""
    return bool(os.environ.get("DISPLAY")
                or os.environ.get("WAYLAND_DISPLAY"))


def _tk_dialog(kind: str, **kw) -> Optional[str]:
    import tkinter
    from tkinter import filedialog

    root = tkinter.Tk()
    root.withdraw()
    try:
        fn = {"open": filedialog.askopenfilename,
              "save": filedialog.asksaveasfilename,
              "dir": filedialog.askdirectory}[kind]
        out = fn(**kw)
        return out or None
    finally:
        root.destroy()


def pick_file(save: bool = False, title: str = "",
              initial: str = "") -> Optional[str]:
    """Native file picker (src/platform/dialogs.cc).  Uses the OS
    toolkit when a display exists; returns None headless (callers fall
    back to their text/config path — e.g. the CLI and web UI take
    paths directly)."""
    if not has_display():
        return None
    try:
        return _tk_dialog("save" if save else "open", title=title,
                          initialdir=initial or None)
    except Exception:
        return None


def pick_directory(title: str = "",
                   initial: str = "") -> Optional[str]:
    """Native directory picker; None when headless/unavailable."""
    if not has_display():
        return None
    try:
        return _tk_dialog("dir", title=title,
                          initialdir=initial or None)
    except Exception:
        return None
