"""SoapySDR hardware binding via ctypes.

The reference links SoapySDR natively (io/soapy module + vendored
subprojects).  Here the C API (libSoapySDR.so) is bound with ctypes at
runtime when present; without hardware/library the soapy block's
``test`` driver provides a synthetic stream instead.

Covers the subset the soapy module needs: device open from kwargs
string, RX stream setup (CF32), sample rate / frequency / AGC control,
and blocking reads.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Any, Dict, Optional

import numpy as np

from cyberether_tpu.utils.logging import get_logger

log = get_logger("soapysdr")

_SOAPY_SDR_RX = 1
_SOAPY_SDR_CF32 = b"CF32"


def _load_lib() -> Optional[ctypes.CDLL]:
    for name in ("SoapySDR", "libSoapySDR.so.0.8", "libSoapySDR.so"):
        path = ctypes.util.find_library(name) \
            if not name.startswith("lib") else name
        if path is None:
            continue
        try:
            return ctypes.CDLL(path)
        except OSError:
            continue
    return None


class SoapyDevice:
    """RX streaming device compatible with the soapy module's driver
    protocol (read(n) -> complex64 array | None, realtime flag)."""

    realtime = False   # hardware paces itself

    def __init__(self, cfg: Dict[str, Any]):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libSoapySDR not found")
        self._lib = lib
        self._declare(lib)

        args = str(cfg.get("deviceString", ""))
        self._dev = lib.SoapySDRDevice_makeStrArgs(args.encode())
        if not self._dev:
            raise RuntimeError(
                f"SoapySDRDevice_make failed for '{args}'")
        rate = float(cfg.get("sampleRate", 2e6))
        freq = float(cfg.get("frequency", 100e6))
        lib.SoapySDRDevice_setSampleRate(self._dev, _SOAPY_SDR_RX, 0,
                                         ctypes.c_double(rate))
        lib.SoapySDRDevice_setFrequency(self._dev, _SOAPY_SDR_RX, 0,
                                        ctypes.c_double(freq), None)
        if bool(cfg.get("automaticGain", True)):
            lib.SoapySDRDevice_setGainMode(self._dev, _SOAPY_SDR_RX, 0,
                                           True)
        self._stream = lib.SoapySDRDevice_setupStream(
            self._dev, _SOAPY_SDR_RX, _SOAPY_SDR_CF32, None, 0, None)
        if not self._stream:
            raise RuntimeError("SoapySDRDevice_setupStream failed")
        lib.SoapySDRDevice_activateStream(self._dev, self._stream, 0,
                                          0, 0)

    @staticmethod
    def _declare(lib: ctypes.CDLL) -> None:
        c = ctypes
        lib.SoapySDRDevice_makeStrArgs.restype = c.c_void_p
        lib.SoapySDRDevice_makeStrArgs.argtypes = [c.c_char_p]
        lib.SoapySDRDevice_setSampleRate.argtypes = [
            c.c_void_p, c.c_int, c.c_size_t, c.c_double]
        lib.SoapySDRDevice_setFrequency.argtypes = [
            c.c_void_p, c.c_int, c.c_size_t, c.c_double, c.c_void_p]
        lib.SoapySDRDevice_setGainMode.argtypes = [
            c.c_void_p, c.c_int, c.c_size_t, c.c_bool]
        lib.SoapySDRDevice_setupStream.restype = c.c_void_p
        lib.SoapySDRDevice_setupStream.argtypes = [
            c.c_void_p, c.c_int, c.c_char_p, c.c_void_p, c.c_size_t,
            c.c_void_p]
        lib.SoapySDRDevice_activateStream.argtypes = [
            c.c_void_p, c.c_void_p, c.c_int, c.c_longlong, c.c_size_t]
        lib.SoapySDRDevice_readStream.restype = c.c_int
        lib.SoapySDRDevice_readStream.argtypes = [
            c.c_void_p, c.c_void_p, c.POINTER(c.c_void_p), c.c_size_t,
            c.POINTER(c.c_int), c.POINTER(c.c_longlong), c.c_long]
        lib.SoapySDRDevice_deactivateStream.argtypes = [
            c.c_void_p, c.c_void_p, c.c_int, c.c_longlong]
        lib.SoapySDRDevice_closeStream.argtypes = [c.c_void_p,
                                                   c.c_void_p]
        lib.SoapySDRDevice_unmake.argtypes = [c.c_void_p]

    def read(self, n: int) -> Optional[np.ndarray]:
        out = np.empty(n, np.complex64)
        flags = ctypes.c_int(0)
        time_ns = ctypes.c_longlong(0)
        buf = ctypes.c_void_p(out.ctypes.data)
        got = self._lib.SoapySDRDevice_readStream(
            self._dev, self._stream, ctypes.byref(buf), n,
            ctypes.byref(flags), ctypes.byref(time_ns), 100000)
        if got <= 0:
            return None
        return out[:got]

    def close(self) -> None:
        if getattr(self, "_stream", None):
            self._lib.SoapySDRDevice_deactivateStream(
                self._dev, self._stream, 0, 0)
            self._lib.SoapySDRDevice_closeStream(self._dev, self._stream)
            self._stream = None
        if getattr(self, "_dev", None):
            self._lib.SoapySDRDevice_unmake(self._dev)
            self._dev = None
