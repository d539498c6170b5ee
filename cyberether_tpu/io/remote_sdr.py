"""Remote SDR driver: network transparency for SDR sources.

Reference cognate: the vendored SoapyRemote stack
(/root/reference/subprojects/soapyremote.wrap) — CyberEther reaches
network-attached SDRs through SoapySDR's remote device driver.  Here
the same capability is a small length-framed TCP protocol:

- ``RemoteSdrServer`` runs next to the hardware: it opens a local
  driver (real SoapySDR, or the deterministic test tone) per client
  and streams IQ on demand.
- ``RemoteSdrDevice`` is the client-side driver; the soapy block
  selects it with ``deviceString: "remote=host:port[,driver=...]"``
  and everything downstream (ring buffer, pacing, flowgraph) is
  unchanged — network SDRs are indistinguishable from local ones.

Wire format (all little-endian):

  client -> server:  u32 len | JSON request
      {"cmd": "config", "sampleRate": .., "frequency": .., ...}
      {"cmd": "read", "n": <samples>}
      {"cmd": "close"}
  server -> client:  u32 len | JSON header [| payload]
      config -> {"ok": true, "sampleRate": ..}
      read   -> {"ok": true, "n": <got>} + n complex64 (8n bytes)
      error  -> {"ok": false, "error": "..."}
"""

from __future__ import annotations

import json
import socket
import struct
import threading
from typing import Any, Dict, Optional, Tuple

import numpy as np

from cyberether_tpu.utils.logging import get_logger

log = get_logger("remote_sdr")

_MAX_MSG = 1 << 20          # control messages; IQ rides the payload
_MAX_READ = 1 << 24         # 16 Msamp per read request

#: wire formats (SoapyRemote's CS8/CS16 bandwidth modes): bytes per
#: complex sample on the wire
_WIRE_FORMATS = {"cf32": 8, "cs16": 4, "cs8": 2}


def _encode_wire(data: np.ndarray, wire: str) -> bytes:
    """complex64 -> wire bytes (cs8/cs16 quantize to +-127/+-32767 —
    quarter/half the network bandwidth of cf32, the reason SoapyRemote
    ships these formats)."""
    if wire == "cf32":
        return data.tobytes()
    f = data.view(np.float32)
    if wire == "cs16":
        return np.clip(f * 32767.0, -32768,
                       32767).astype(np.int16).tobytes()
    return np.clip(f * 127.0, -128, 127).astype(np.int8).tobytes()


def _decode_wire(raw: bytes, wire: str) -> np.ndarray:
    """wire bytes -> complex64, through the native converters
    (native/ceruntime.cc ce_ci8_to_f32 / ce_ci16_to_f32) when the
    library is available."""
    if wire == "cf32":
        return np.frombuffer(raw, np.complex64).copy()
    from cyberether_tpu.io.native import ci16_to_cf32, ci8_to_cf32

    if wire == "cs16":
        return ci16_to_cf32(np.frombuffer(raw, np.int16))
    return ci8_to_cf32(np.frombuffer(raw, np.int8))


def _send_msg(sock: socket.socket, obj: Dict[str, Any],
              payload: bytes = b"") -> None:
    data = json.dumps(obj).encode()
    sock.sendall(struct.pack("<I", len(data)) + data + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("remote SDR peer closed")
        buf.extend(chunk)
    return bytes(buf)


def _recv_msg(sock: socket.socket) -> Dict[str, Any]:
    (ln,) = struct.unpack("<I", _recv_exact(sock, 4))
    if ln > _MAX_MSG:
        raise ConnectionError(f"oversized control message ({ln} B)")
    return json.loads(_recv_exact(sock, ln))


class RemoteSdrServer:
    """Serve local SDR drivers to remote clients (one driver per
    connection; the driver type comes from the client's config).

    Trust model: binds loopback by default; pass ``host="0.0.0.0"``
    explicitly (e.g. ``sdr-server --host``) to serve a LAN, ideally
    with ``token`` set — clients then append ``token=<secret>`` to the
    deviceString (mirrors the web server's ``_check_token``).  Nested
    ``remote=`` driver specs are rejected server-side so a client
    cannot make this server dial arbitrary hosts."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 token: str = ""):
        self.token = token
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(4)
        self.port = self._sock.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop,
                                        name="remote-sdr", daemon=True)

    def start(self) -> "RemoteSdrServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass
        self._thread.join(timeout=3.0)

    # ------------------------------------------------------------------
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, addr = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve_client,
                             args=(conn, addr), daemon=True).start()

    def _serve_client(self, conn: socket.socket, addr) -> None:
        from cyberether_tpu.blocks.io import _open_sdr

        driver = None
        wire = "cf32"
        try:
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            while not self._stop.is_set():
                req = _recv_msg(conn)
                cmd = req.get("cmd")
                if cmd == "config":
                    cfg = dict(req)
                    cfg.pop("cmd")
                    if self.token and cfg.pop("token", None) != \
                            self.token:
                        _send_msg(conn, {"ok": False,
                                         "error": "bad or missing "
                                                  "token"})
                        return
                    # the server side strips the remote= prefix: the
                    # nested driver spec selects local hardware only —
                    # a nested remote= would make this server dial
                    # arbitrary hosts on a client's behalf (SSRF)
                    spec = str(cfg.get("driver", "test"))
                    if "remote=" in spec:
                        _send_msg(conn, {"ok": False,
                                         "error": "nested remote= "
                                                  "driver rejected"})
                        return
                    cfg["deviceString"] = spec
                    wire = str(cfg.pop("wireFormat", "cf32"))
                    if wire not in _WIRE_FORMATS:
                        _send_msg(conn, {"ok": False,
                                         "error": f"unknown wire "
                                                  f"format '{wire}'"})
                        return
                    if driver is not None:
                        driver.close()
                    driver = _open_sdr(cfg)
                    _send_msg(conn, {
                        "ok": True,
                        "sampleRate": float(cfg.get("sampleRate", 2e6)),
                        "wireFormat": wire,
                        "realtime": bool(getattr(driver, "realtime",
                                                 False))})
                elif cmd == "read":
                    n = int(req.get("n", 0))
                    if driver is None or not (0 < n <= _MAX_READ):
                        _send_msg(conn, {"ok": False,
                                         "error": "bad read"})
                        continue
                    data = driver.read(n)
                    if data is None:
                        _send_msg(conn, {"ok": True, "n": 0})
                        continue
                    data = np.ascontiguousarray(data,
                                                np.complex64)
                    _send_msg(conn, {"ok": True, "n": int(data.size)},
                              _encode_wire(data, wire))
                elif cmd == "close":
                    _send_msg(conn, {"ok": True})
                    return
                else:
                    _send_msg(conn, {"ok": False,
                                     "error": f"unknown cmd {cmd}"})
        except (ConnectionError, OSError, json.JSONDecodeError):
            pass
        finally:
            if driver is not None:
                try:
                    driver.close()
                except Exception:
                    pass
            try:
                conn.close()
            except OSError:
                pass


def _parse_remote(device_string: str
                  ) -> Tuple[str, int, str, str, str]:
    """'remote=host:port[,driver=<spec>][,token=<secret>]
    [,wire=cf32|cs16|cs8]' -> (host, port, driver, token, wire)."""
    parts = dict(
        kv.split("=", 1) if "=" in kv else (kv, "")
        for kv in device_string.split(","))
    target = parts.get("remote", "")
    if ":" not in target:
        raise ValueError(
            f"remote deviceString needs remote=host:port "
            f"(got '{device_string}')")
    host, port = target.rsplit(":", 1)
    wire = parts.get("wire", "cf32")
    if wire not in _WIRE_FORMATS:
        raise ValueError(f"unknown wire format '{wire}' "
                         f"(cf32/cs16/cs8)")
    return (host, int(port), parts.get("driver", "test"),
            parts.get("token", ""), wire)


class RemoteSdrDevice:
    """Client-side driver: read(n) pulls IQ over TCP.  Pacing follows
    the remote end (realtime=True means the server's driver paces and
    the local loop must not add its own sleep)."""

    def __init__(self, cfg: Dict[str, Any]):
        host, port, driver, token, wire = _parse_remote(
            str(cfg["deviceString"]))
        self._wire = wire
        self._sock = socket.create_connection((host, port), timeout=10)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._lock = threading.Lock()
        req = {"cmd": "config", "driver": driver,
               "wireFormat": wire}
        if token:
            req["token"] = token
        for key in ("sampleRate", "frequency", "automaticGain",
                    "batchSize", "bufferMultiplier"):
            if key in cfg:
                req[key] = cfg[key]
        _send_msg(self._sock, req)
        resp = _recv_msg(self._sock)
        if not resp.get("ok"):
            raise RuntimeError(
                f"remote SDR config failed: {resp.get('error')}")
        # a non-realtime remote driver (e.g. the test tone) produces as
        # fast as asked; the network round trip already paces, so the
        # local loop treats the stream as hardware-paced either way
        self.realtime = False

    def read(self, n: int) -> Optional[np.ndarray]:
        with self._lock:
            _send_msg(self._sock, {"cmd": "read", "n": int(n)})
            resp = _recv_msg(self._sock)
            if not resp.get("ok"):
                raise RuntimeError(
                    f"remote read failed: {resp.get('error')}")
            got = int(resp.get("n", 0))
            if got == 0:
                return None
            raw = _recv_exact(self._sock,
                              _WIRE_FORMATS[self._wire] * got)
        return _decode_wire(raw, self._wire)

    def close(self) -> None:
        try:
            with self._lock:
                _send_msg(self._sock, {"cmd": "close"})
                _recv_msg(self._sock)
        except (ConnectionError, OSError):
            pass
        finally:
            try:
                self._sock.close()
            except OSError:
                pass
