"""ctypes bindings to the native runtime library (native/ceruntime.cc).

The library is built on demand with the repo's Makefile (g++); when the
toolchain or build is unavailable everything degrades to the pure-
Python implementations, so the framework never hard-requires the .so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from cyberether_tpu.utils.logging import get_logger

log = get_logger("native")

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
# CYBERETHER_NATIVE_DIR: prebuilt-library location for installed/
# containerized deployments (the Dockerfile builds native/ at image
# build time and points this at it)
_NATIVE_DIR = os.environ.get("CYBERETHER_NATIVE_DIR",
                             os.path.join(_ROOT, "native"))
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libceruntime.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _build_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "ceruntime.cc")
        stale = (os.path.exists(src) and os.path.exists(_SO_PATH)
                 and os.path.getmtime(src) > os.path.getmtime(_SO_PATH))
        if (not os.path.exists(_SO_PATH) or stale) \
                and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True,
                               timeout=120)
            except Exception as e:
                log.warning("native build failed: %s", e)
                if not os.path.exists(_SO_PATH):
                    return None
        if not os.path.exists(_SO_PATH):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            log.warning("native load failed: %s", e)
            return None
        _declare(lib)
        _lib = lib
        return _lib


def _declare(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.ce_ring_create.restype = c.c_void_p
    lib.ce_ring_create.argtypes = [c.c_size_t]
    lib.ce_ring_destroy.argtypes = [c.c_void_p]
    lib.ce_ring_occupancy.restype = c.c_size_t
    lib.ce_ring_occupancy.argtypes = [c.c_void_p]
    lib.ce_ring_overflows.restype = c.c_uint64
    lib.ce_ring_overflows.argtypes = [c.c_void_p]
    lib.ce_ring_close.argtypes = [c.c_void_p]
    lib.ce_ring_reset.argtypes = [c.c_void_p]
    lib.ce_ring_put.argtypes = [c.c_void_p, c.c_char_p, c.c_size_t]
    lib.ce_ring_wait_for_size.restype = c.c_int
    lib.ce_ring_wait_for_size.argtypes = [c.c_void_p, c.c_size_t,
                                          c.c_double]
    lib.ce_ring_get.restype = c.c_int
    lib.ce_ring_get.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t]
    lib.ce_file_open.restype = c.c_void_p
    lib.ce_file_open.argtypes = [c.c_char_p, c.c_size_t, c.c_size_t,
                                 c.c_int]
    lib.ce_file_read.restype = c.c_int
    lib.ce_file_read.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t,
                                 c.c_double]
    lib.ce_file_size.restype = c.c_uint64
    lib.ce_file_size.argtypes = [c.c_void_p]
    lib.ce_file_position.restype = c.c_uint64
    lib.ce_file_position.argtypes = [c.c_void_p]
    lib.ce_file_close.argtypes = [c.c_void_p]
    lib.ce_monotonic.restype = c.c_double
    lib.ce_precise_sleep.argtypes = [c.c_double]
    try:      # round-4 symbols — tolerate an older prebuilt library
        lib.ce_colormap.argtypes = [c.c_void_p, c.c_void_p,
                                    c.c_size_t, c.c_void_p, c.c_int]
        lib.ce_ci8_to_f32.argtypes = [c.c_void_p, c.c_void_p,
                                      c.c_size_t]
        lib.ce_ci16_to_f32.argtypes = [c.c_void_p, c.c_void_p,
                                       c.c_size_t]
        lib.ce_f32_to_s16.argtypes = [c.c_void_p, c.c_void_p,
                                      c.c_size_t]
    except AttributeError:   # pragma: no cover
        log.warning("native library predates the format kernels")


def available() -> bool:
    return load() is not None


class NativeRing:
    """Native SPSC ring over sample elements of a given numpy dtype."""

    def __init__(self, capacity: int, dtype=np.complex64):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._dtype = np.dtype(dtype)
        self._capacity = int(capacity)
        self._h = self._lib.ce_ring_create(
            self._capacity * self._dtype.itemsize)
        if not self._h:
            raise MemoryError("ce_ring_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h and self._lib is not None:
            self._lib.ce_ring_destroy(h)
            self._h = None

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def occupancy(self) -> int:
        return self._lib.ce_ring_occupancy(self._h) \
            // self._dtype.itemsize

    @property
    def overflows(self) -> int:
        return int(self._lib.ce_ring_overflows(self._h))

    def reset(self) -> None:
        self._lib.ce_ring_reset(self._h)

    def close(self) -> None:
        self._lib.ce_ring_close(self._h)

    def put(self, data: np.ndarray) -> None:
        data = np.ascontiguousarray(data, dtype=self._dtype).ravel()
        self._lib.ce_ring_put(self._h, data.tobytes(), data.nbytes)

    def wait_for_size(self, n: int,
                      timeout: Optional[float] = None) -> bool:
        t = -1.0 if timeout is None else float(timeout)
        return bool(self._lib.ce_ring_wait_for_size(
            self._h, n * self._dtype.itemsize, t))

    def get(self, n: int) -> Optional[np.ndarray]:
        out = np.empty(n, self._dtype)
        ok = self._lib.ce_ring_get(
            self._h, out.ctypes.data_as(ctypes.c_void_p),
            n * self._dtype.itemsize)
        return out if ok else None


class NativeIqFile:
    """Readahead-buffered raw IQ file reader."""

    def __init__(self, path: str, dtype=np.complex64,
                 buffer_samples: int = 1 << 20,
                 chunk_samples: int = 1 << 16, loop: bool = True):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._dtype = np.dtype(dtype)
        self._h = self._lib.ce_file_open(
            path.encode(), buffer_samples * self._dtype.itemsize,
            chunk_samples * self._dtype.itemsize, int(loop))
        if not self._h:
            raise FileNotFoundError(path)

    def read(self, n: int, timeout: float = 1.0) -> Optional[np.ndarray]:
        out = np.empty(n, self._dtype)
        ok = self._lib.ce_file_read(
            self._h, out.ctypes.data_as(ctypes.c_void_p),
            n * self._dtype.itemsize, float(timeout))
        return out if ok else None

    @property
    def file_size(self) -> int:
        return int(self._lib.ce_file_size(self._h))

    @property
    def position(self) -> int:
        return int(self._lib.ce_file_position(self._h))

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.ce_file_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# hot host-path kernels (numpy fallbacks when the lib is unavailable)
# ---------------------------------------------------------------------------
def colormap_rgba(norm: np.ndarray, lut: np.ndarray) -> Optional[np.ndarray]:
    """Native turbo-LUT rasterization: [0,1] float32 array -> RGBA8.
    Returns None when the native lib is unavailable (caller falls back
    to numpy).  The per-present-tick cognate of the reference's
    in-shader turbo LUT (visualization/lineplot/module_impl.cc)."""
    lib = load()
    if lib is None or not hasattr(lib, "ce_colormap"):
        return None
    src = np.ascontiguousarray(norm, np.float32)
    lut8 = np.ascontiguousarray(lut, np.uint8)
    out = np.empty(src.shape + (4,), np.uint8)
    lib.ce_colormap(src.ctypes.data_as(ctypes.c_void_p),
                    out.ctypes.data_as(ctypes.c_void_p),
                    src.size,
                    lut8.ctypes.data_as(ctypes.c_void_p),
                    int(lut8.shape[0]))
    return out


def ci8_to_cf32(raw: np.ndarray) -> np.ndarray:
    """Interleaved signed-8 IQ -> complex64 (scale 1/127); native when
    available, numpy otherwise.  SDR CS8 ingest converter."""
    raw = np.ascontiguousarray(raw, np.int8)
    n = raw.size // 2
    raw = raw[:2 * n]          # tolerate a truncated trailing byte
    lib = load()
    if lib is None or not hasattr(lib, "ce_ci8_to_f32"):
        f = raw.astype(np.float32) * np.float32(1.0 / 127.0)
        return (f[0::2] + 1j * f[1::2]).astype(np.complex64)
    out = np.empty(2 * n, np.float32)
    lib.ce_ci8_to_f32(raw.ctypes.data_as(ctypes.c_void_p),
                      out.ctypes.data_as(ctypes.c_void_p), n)
    return out.view(np.complex64)


def ci16_to_cf32(raw: np.ndarray) -> np.ndarray:
    """Interleaved signed-16 IQ -> complex64 (scale 1/32767)."""
    raw = np.ascontiguousarray(raw, np.int16)
    n = raw.size // 2
    raw = raw[:2 * n]          # tolerate a truncated trailing sample
    lib = load()
    if lib is None or not hasattr(lib, "ce_ci16_to_f32"):
        f = raw.astype(np.float32) * np.float32(1.0 / 32767.0)
        return (f[0::2] + 1j * f[1::2]).astype(np.complex64)
    out = np.empty(2 * n, np.float32)
    lib.ce_ci16_to_f32(raw.ctypes.data_as(ctypes.c_void_p),
                       out.ctypes.data_as(ctypes.c_void_p), n)
    return out.view(np.complex64)


def f32_to_s16(pcm: np.ndarray) -> np.ndarray:
    """float32 PCM -> clamped int16 (audio players)."""
    pcm = np.ascontiguousarray(pcm, np.float32)
    lib = load()
    if lib is None or not hasattr(lib, "ce_f32_to_s16"):
        return np.clip(pcm * 32767.0, -32768, 32767).astype(np.int16)
    out = np.empty(pcm.shape, np.int16)
    lib.ce_f32_to_s16(pcm.ctypes.data_as(ctypes.c_void_p),
                      out.ctypes.data_as(ctypes.c_void_p), pcm.size)
    return out
