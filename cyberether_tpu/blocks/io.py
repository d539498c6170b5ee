"""io/ domain — sources and sinks (host runtime).

Reference: /root/reference/src/domains/io/ — audio (miniaudio sink with
resampler), file_reader (raw IQ source), file_writer, soapy (SoapySDR
driver thread + CircularBuffer), websocket.

Host modules pace the compute loop (``host_poll`` is the
``hasPendingCompute`` analog); data crosses to the device via the
scheduler's device_put of polled outputs.
"""

from __future__ import annotations

import os
import threading
from fractions import Fraction
from typing import Any, Dict, Optional

import numpy as np

from cyberether_tpu.core.block import simple_block
from cyberether_tpu.core.module import Module
from cyberether_tpu.core.params import Field, Schema
from cyberether_tpu.core.registry import register_block, register_module
from cyberether_tpu.core.tensor import SignalAxes, TensorSpec
from cyberether_tpu.core.types import DataType, Device, Runtime, Taint, \
    ValidationError
from cyberether_tpu.io.ringbuffer import CircularBuffer, make_ring
from cyberether_tpu.utils.logging import get_logger

log = get_logger("io")


# ---------------------------------------------------------------------------
# file_reader (io/file_reader) — raw IQ file source
# ---------------------------------------------------------------------------
@register_module
class FileReaderModule(Module):
    module_type = "file_reader"
    device = Device.CPU
    runtime = Runtime.HOST
    taints = Taint.HOST_SOURCE
    output_ports = ("signal",)
    schema = Schema(
        Field("filepath", "str", ""),
        Field("fileFormat", "str", "raw"),
        Field("dataType", "dtype", DataType.CF32),
        Field("batchSize", "int", 8192),
        Field("loop", "bool", True),
        Field("playing", "bool", True),
        Field("sampleRate", "float", 0.0),   # optional metadata
        Field("throttle", "bool", False))    # pace to sampleRate realtime

    def validate(self) -> None:
        if self.config["fileFormat"] != "raw":
            raise ValidationError(
                f"unsupported file format '{self.config['fileFormat']}'")
        if int(self.config["batchSize"]) == 0:
            raise ValidationError("batch size cannot be zero")
        if not self.config["filepath"]:
            raise ValidationError("file path is empty")
        if not os.path.exists(self.config["filepath"]):
            raise ValidationError(
                f"file '{self.config['filepath']}' does not exist")

    def create(self) -> Dict[str, TensorSpec]:
        attrs: Dict[str, Any] = {}
        if float(self.config["sampleRate"]):
            attrs["sampleRate"] = float(self.config["sampleRate"])
        return {"signal": TensorSpec(
            (int(self.config["batchSize"]),),
            DataType.parse(self.config["dataType"]), Device.CPU,
            SignalAxes(sample=0), attrs)}

    def host_start(self) -> None:
        self._np_dtype = DataType.parse(self.config["dataType"]).np_dtype
        self._batch = int(self.config["batchSize"])
        self._bytes_per_batch = self._batch * self._np_dtype.itemsize
        self.file_size = os.path.getsize(self.config["filepath"])
        self.position = 0
        self._file = None
        self._native = None
        # prefer the native readahead reader (native/ceruntime.cc)
        try:
            from cyberether_tpu.io.native import NativeIqFile, available

            if available():
                self._native = NativeIqFile(
                    self.config["filepath"], self._np_dtype,
                    buffer_samples=max(self._batch * 8, 1 << 16),
                    chunk_samples=max(self._batch, 1 << 14),
                    loop=bool(self.config["loop"]))
        except Exception:
            self._native = None
        if self._native is None:
            self._file = open(self.config["filepath"], "rb")

    def host_stop(self) -> None:
        if getattr(self, "_native", None) is not None:
            self._native.close()
            self._native = None
        f = getattr(self, "_file", None)
        if f is not None:
            f.close()
            self._file = None

    def host_poll(self) -> Optional[Dict[str, np.ndarray]]:
        if not self.config["playing"]:
            return None
        if self._native is not None:
            data = self._native.read(self._batch, timeout=0.05)
            if data is None:
                return None
            self.position = self._native.position
            return {"signal": data}
        if self._file is None:
            return None
        raw = self._file.read(self._bytes_per_batch)
        if len(raw) < self._bytes_per_batch:
            if not self.config["loop"]:
                return None
            self._file.seek(0)
            raw += self._file.read(self._bytes_per_batch - len(raw))
            if len(raw) < self._bytes_per_batch:
                return None
        self.position = self._file.tell()
        return {"signal": np.frombuffer(raw, dtype=self._np_dtype)}


# ---------------------------------------------------------------------------
# file_writer (io/file_writer) — raw capture sink
# ---------------------------------------------------------------------------
@register_module
class FileWriterModule(Module):
    module_type = "file_writer"
    device = Device.CPU
    runtime = Runtime.HOST
    taints = Taint.HOST_SINK
    input_ports = ("buffer",)
    schema = Schema(
        Field("filepath", "str", ""),
        Field("fileFormat", "str", "raw"),
        Field("overwrite", "bool", False),
        Field("recording", "bool", False))

    def validate(self) -> None:
        if self.config["fileFormat"] != "raw":
            raise ValidationError(
                f"unsupported file format '{self.config['fileFormat']}'")

    def create(self) -> Dict[str, TensorSpec]:
        return {}

    def host_start(self) -> None:
        self._file = None
        self.bytes_written = 0
        if self.config["recording"] and self.config["filepath"]:
            self._open()

    def _open(self) -> None:
        path = self.config["filepath"]
        if os.path.exists(path) and not self.config["overwrite"]:
            raise ValidationError(f"refusing to overwrite '{path}'")
        self._file = open(path, "wb")

    def host_stop(self) -> None:
        if getattr(self, "_file", None) is not None:
            self._file.close()
            self._file = None

    def host_consume(self, outputs: Dict[str, np.ndarray],
                     valid: bool) -> None:
        if not valid or not self.config["recording"]:
            return
        if self._file is None:
            if not self.config["filepath"]:
                return
            self._open()
        data = np.ascontiguousarray(outputs["buffer"])
        self._file.write(data.tobytes())
        self.bytes_written += data.nbytes


# ---------------------------------------------------------------------------
# soapy (io/soapy) — SDR source.  A driver thread fills a CircularBuffer;
# host_poll blocks on wait_for_size (the reference's hasPendingCompute,
# soapy/module_impl_native_cpu.cc:39-56).  The SoapySDR C API is bound
# via ctypes when present; otherwise the "test:" driver generates a
# deterministic tone and "" errors like a missing device.
# ---------------------------------------------------------------------------
@register_module
class SoapyModule(Module):
    module_type = "soapy"
    device = Device.CPU
    runtime = Runtime.HOST
    taints = Taint.HOST_SOURCE
    output_ports = ("signal",)
    schema = Schema(
        Field("deviceString", "str", ""),
        Field("streamString", "str", ""),
        Field("hintString", "str", ""),
        Field("frequency", "float", 96.9e6),
        Field("frequencyStep", "float", 1e6),
        Field("sampleRate", "float", 2.0e6),
        Field("automaticGain", "bool", True),
        Field("numberOfBatches", "int", 8),
        Field("numberOfTimeSamples", "int", 8192),
        Field("bufferMultiplier", "int", 4))

    def validate(self) -> None:
        if int(self.config["numberOfBatches"]) == 0 or \
                int(self.config["numberOfTimeSamples"]) == 0:
            raise ValidationError("batches/time samples cannot be zero")

    def create(self) -> Dict[str, TensorSpec]:
        nb = int(self.config["numberOfBatches"])
        ns = int(self.config["numberOfTimeSamples"])
        return {"signal": TensorSpec(
            (nb, ns), DataType.CF32, Device.CPU,
            SignalAxes(batch=0, sample=1),
            {"sampleRate": float(self.config["sampleRate"]),
             "frequency": float(self.config["frequency"])})}

    def host_start(self) -> None:
        nb = int(self.config["numberOfBatches"])
        ns = int(self.config["numberOfTimeSamples"])
        mult = max(int(self.config["bufferMultiplier"]), 2)
        self._block = nb * ns
        self._ring = make_ring(self._block * mult, np.complex64)
        self._stop = threading.Event()
        self._driver_error: Optional[str] = None
        self._thread = threading.Thread(
            target=self._driver_loop, name=f"soapy-{self.name}",
            daemon=True)
        self._thread.start()

    def host_stop(self) -> None:
        if getattr(self, "_stop", None) is not None:
            self._stop.set()
        ring = getattr(self, "_ring", None)
        if ring is not None:
            ring.close()
        t = getattr(self, "_thread", None)
        if t is not None and t.is_alive():
            t.join(timeout=2.0)

    # -- driver thread ------------------------------------------------------
    def _driver_loop(self) -> None:
        try:
            driver = _open_sdr(self.config)
        except Exception as e:
            self._driver_error = str(e)
            log.error("soapy driver failed: %s", e)
            return
        import time as _t

        chunk = max(self._block // 8, 1024)
        period = chunk / float(self.config["sampleRate"])
        while not self._stop.is_set():
            data = driver.read(chunk)
            if data is None:
                _t.sleep(0.001)
                continue
            self._ring.put(data)
            if driver.realtime:
                _t.sleep(period)
        driver.close()

    def host_poll(self) -> Optional[Dict[str, np.ndarray]]:
        if self._driver_error:
            return None
        if not self._ring.wait_for_size(self._block, timeout=0.05):
            return None
        data = self._ring.get(self._block)
        if data is None:
            return None
        nb = int(self.config["numberOfBatches"])
        ns = int(self.config["numberOfTimeSamples"])
        return {"signal": data.reshape(nb, ns)}

    def host_wait(self, timeout: float) -> None:
        """Scheduler wait hook: block in the ring (the reference's
        CircularBuffer::waitForSize) instead of spinning."""
        self._ring.wait_for_size(self._block, timeout=timeout)


class _TestToneDriver:
    """Deterministic synthetic SDR for tests/benches: complex tone at
    (frequency mod sampleRate/8) + small noise."""

    realtime = False

    def __init__(self, cfg: Dict[str, Any]):
        self._sr = float(cfg["sampleRate"])
        self._f = self._sr / 8.0
        self._phase = 0.0
        self._rng = np.random.default_rng(12345)

    def read(self, n: int) -> np.ndarray:
        t = np.arange(n)
        ph = self._phase + 2 * np.pi * self._f / self._sr * t
        self._phase = float((ph[-1] + 2 * np.pi * self._f / self._sr)
                            % (2 * np.pi))
        sig = np.exp(1j * ph).astype(np.complex64)
        sig += (self._rng.standard_normal(n) +
                1j * self._rng.standard_normal(n)).astype(np.complex64) \
            * 0.01
        return sig

    def close(self) -> None:
        pass


def _open_sdr(cfg: Dict[str, Any]):
    ds = str(cfg.get("deviceString", ""))
    if ds.startswith("test") or ds == "":
        return _TestToneDriver(cfg)
    if ds.startswith("remote="):
        # network-attached SDR (the SoapyRemote capability,
        # /root/reference/subprojects/soapyremote.wrap)
        from cyberether_tpu.io.remote_sdr import RemoteSdrDevice

        return RemoteSdrDevice(cfg)
    try:
        from cyberether_tpu.io.soapysdr import SoapyDevice

        return SoapyDevice(cfg)
    except Exception as e:
        raise RuntimeError(f"no SDR driver for '{ds}': {e}")


# ---------------------------------------------------------------------------
# websocket (io/websocket) — network IQ source
# ---------------------------------------------------------------------------
@register_module
class WebsocketModule(Module):
    module_type = "websocket"
    device = Device.CPU
    runtime = Runtime.HOST
    taints = Taint.HOST_SOURCE
    output_ports = ("signal",)
    schema = Schema(
        Field("url", "str", "ws://localhost:8765"),
        Field("dataType", "dtype", DataType.CF32),
        Field("numberOfBatches", "int", 8),
        Field("numberOfTimeSamples", "int", 8192),
        Field("bufferMultiplier", "int", 4))

    def create(self) -> Dict[str, TensorSpec]:
        nb = int(self.config["numberOfBatches"])
        ns = int(self.config["numberOfTimeSamples"])
        return {"signal": TensorSpec(
            (nb, ns), DataType.parse(self.config["dataType"]), Device.CPU,
            SignalAxes(batch=0, sample=1))}

    def host_start(self) -> None:
        nb = int(self.config["numberOfBatches"])
        ns = int(self.config["numberOfTimeSamples"])
        self._block = nb * ns
        dt = DataType.parse(self.config["dataType"]).np_dtype
        self._np_dtype = dt
        mult = max(int(self.config["bufferMultiplier"]), 2)
        self._ring = make_ring(self._block * mult, dt)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._ws_loop,
                                        name=f"ws-{self.name}", daemon=True)
        self._thread.start()

    def host_stop(self) -> None:
        if getattr(self, "_stop", None) is not None:
            self._stop.set()
        if getattr(self, "_ring", None) is not None:
            self._ring.close()
        t = getattr(self, "_thread", None)
        if t is not None and t.is_alive():
            t.join(timeout=2.0)

    def _ws_loop(self) -> None:
        import asyncio

        async def run() -> None:
            import websockets

            url = self.config["url"]
            while not self._stop.is_set():
                try:
                    async with websockets.connect(url,
                                                  max_size=None) as ws:
                        while not self._stop.is_set():
                            msg = await asyncio.wait_for(ws.recv(),
                                                         timeout=0.5)
                            if isinstance(msg, bytes):
                                self._ring.put(
                                    np.frombuffer(msg,
                                                  dtype=self._np_dtype))
                except Exception:
                    if self._stop.is_set():
                        return
                    await asyncio.sleep(0.5)

        try:
            asyncio.run(run())
        except Exception:   # pragma: no cover
            log.exception("websocket loop died")

    def host_poll(self) -> Optional[Dict[str, np.ndarray]]:
        if not self._ring.wait_for_size(self._block, timeout=0.05):
            return None
        data = self._ring.get(self._block)
        if data is None:
            return None
        nb = int(self.config["numberOfBatches"])
        ns = int(self.config["numberOfTimeSamples"])
        return {"signal": data.reshape(nb, ns)}

    def host_wait(self, timeout: float) -> None:
        self._ring.wait_for_size(self._block, timeout=timeout)


# ---------------------------------------------------------------------------
# audio (io/audio) — speaker sink with internal polyphase resampler
# (reference uses miniaudio, io/audio/module_impl.cc:11,72-80).  Playback
# backends: 'null' (collect only) and 'process' (pipe to `aplay`-style
# command when configured).  The resampler runs host-side with scipy.
# ---------------------------------------------------------------------------
@register_module
class AudioModule(Module):
    module_type = "audio"
    device = Device.CPU
    runtime = Runtime.HOST
    # SURFACE: the sink also presents its PCM stream to the remote
    # server, which ships it over the binary WS to the editor client
    # (browser WebAudio) — the in-image route for audio to reach a
    # user (reference plays through embedded miniaudio,
    # io/audio/module_impl.cc:72-80; no audio device exists here)
    taints = Taint.HOST_SINK | Taint.SURFACE
    input_ports = ("buffer",)
    schema = Schema(
        Field("deviceName", "str", "Default"),
        Field("inSampleRate", "float", 48e3),
        Field("outSampleRate", "float", 48e3),
        Field("volume", "float", 1.0))

    def create(self) -> Dict[str, TensorSpec]:
        return {}

    def host_start(self) -> None:
        self._resample = None
        fin = float(self.config["inSampleRate"])
        fout = float(self.config["outSampleRate"])
        if fin != fout and fin > 0 and fout > 0:
            frac = Fraction(int(round(fout)), int(round(fin))).limit_denominator(1 << 16)
            self._resample = (frac.numerator, frac.denominator)
        self.samples_out = 0
        self._sink_ring = CircularBuffer(1 << 20, np.float32)
        # separate ring for the WS/WebAudio stream so present() and
        # take() (tests, playback pump) never steal each other's data
        self._stream_ring = CircularBuffer(1 << 20, np.float32)
        # playback backend: deviceName 'process:<cmd>' pipes float32
        # samples into a player command (e.g. 'process:aplay -f
        # FLOAT_LE -r {rate} -c 1'); 'Default' collects only (no audio
        # device in this image)
        self._player = None
        dev = str(self.config["deviceName"])
        if dev.startswith("process:"):
            import shlex
            import subprocess

            cmd = dev[len("process:"):].format(
                rate=int(float(self.config["outSampleRate"])))
            self._player = subprocess.Popen(
                cmd, shell=True, stdin=subprocess.PIPE,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    def host_stop(self) -> None:
        player = getattr(self, "_player", None)
        if player is not None:
            try:
                player.stdin.close()
                player.wait(timeout=2.0)
            except Exception:
                player.kill()
            self._player = None

    def host_consume(self, outputs: Dict[str, np.ndarray],
                     valid: bool) -> None:
        if not valid:
            return
        data = np.asarray(outputs["buffer"], dtype=np.float32).ravel()
        if self._resample is not None:
            from scipy.signal import resample_poly

            up, down = self._resample
            data = resample_poly(data, up, down).astype(np.float32)
        data = data * float(self.config["volume"])
        self._sink_ring.put(data)
        self._stream_ring.put(data)
        self.samples_out += data.size
        if self._player is not None:
            try:
                self._player.stdin.write(
                    data.astype(np.float32).tobytes())
                self._player.stdin.flush()
            except (BrokenPipeError, ValueError):
                self._player = None

    def take(self, n: int) -> Optional[np.ndarray]:
        """Fetch resampled audio (testing / playback pump)."""
        return self._sink_ring.get(n)

    _STREAM_CHUNK = 1 << 15     # <= 32768 samples per WS frame

    def present_data(self, outputs, state):
        """Drain pending PCM for the remote stream: the server encodes
        it as a kind="audio" binary frame (f32 payload) and the editor
        client schedules it through WebAudio.

        ``seq`` counts samples DRAINED (not produced): every chunk
        gets a distinct, monotone fingerprint, so the server's dirty
        tracking can never discard an already-drained chunk (a chunk
        is destructively consumed here — dropping it would be an
        audible gap).  The stream is single-listener: each present
        pass drains the ring once, so a second WS client would receive
        interleaved segments rather than a copy."""
        ring = getattr(self, "_stream_ring", None)
        if ring is None:
            return None
        n = min(ring.occupancy, self._STREAM_CHUNK)
        if n == 0:
            return None
        pcm = ring.get(n)
        if pcm is None:
            return None
        self._streamed = getattr(self, "_streamed", 0) + int(pcm.size)
        return {"kind": "audio", "pcm": pcm,
                "rate": float(self.config["outSampleRate"]),
                "seq": int(self._streamed)}


for _type in ("file_reader", "file_writer", "soapy", "websocket", "audio"):
    register_block(simple_block(_type))
