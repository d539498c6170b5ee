"""Mode-S / ADS-B demodulation and decoding (pure numpy, vectorized).

The reference wraps libmodes
(/root/reference/src/domains/dsp/adsb/ + subprojects libmodes).  This is
a from-scratch decoder for the same capability: 2 MS/s magnitude
stream -> preamble detection -> 112-bit PPM demod -> CRC-24 check ->
DF17 field decode (callsign, CPR position, velocity) -> aircraft table.

Signal layout at 2 MS/s (2 samples per µs):
- preamble 8 µs: pulses at 0, 1, 3.5, 4.5 µs  (samples 0, 2, 7, 9)
- data: 112 bits x 1 µs PPM (first-half high = 1)
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

MODES_LONG_BITS = 112
MODES_SHORT_BITS = 56
PREAMBLE_SAMPLES = 16
LONG_SAMPLES = PREAMBLE_SAMPLES + MODES_LONG_BITS * 2  # 240

_CRC_POLY = 0xFFF409


def _make_crc_table() -> np.ndarray:
    table = np.zeros(256, np.uint32)
    for i in range(256):
        crc = i << 16
        for _ in range(8):
            crc <<= 1
            if crc & 0x1000000:
                crc ^= _CRC_POLY
        table[i] = crc & 0xFFFFFF
    return table


_CRC_TABLE = _make_crc_table()


def crc24(msg_bytes: np.ndarray) -> int:
    """Mode-S CRC-24 over all message bytes; 0 for a valid DF17 frame
    (parity included)."""
    crc = 0
    for b in msg_bytes:
        crc = (((crc << 8) & 0xFFFFFF)
               ^ int(_CRC_TABLE[((crc >> 16) ^ int(b)) & 0xFF]))
    return crc & 0xFFFFFF


def attach_crc(payload_bytes: bytes) -> bytes:
    """Append the 24-bit parity so crc24(full) == 0 (frame builder for
    tests/benchmarks)."""
    crc = 0
    for b in payload_bytes:
        crc = (((crc << 8) & 0xFFFFFF)
               ^ int(_CRC_TABLE[((crc >> 16) ^ b) & 0xFF]))
    return payload_bytes + bytes([(crc >> 16) & 0xFF, (crc >> 8) & 0xFF,
                                  crc & 0xFF])


# ---------------------------------------------------------------------------
# demodulation
# ---------------------------------------------------------------------------
def detect_preambles(mag: np.ndarray, threshold: float = 2.0
                     ) -> np.ndarray:
    """Candidate frame-start indices.  A valid preamble has high pulses
    at samples {0,2,7,9} and low between {4,5,11,12,13,14}."""
    n = len(mag)
    if n < LONG_SAMPLES:
        return np.empty(0, np.int64)
    m = mag[:n - LONG_SAMPLES + 1]
    hi = (mag[0:len(m)] + mag[2:len(m) + 2]
          + mag[7:len(m) + 7] + mag[9:len(m) + 9])
    lo = (mag[4:len(m) + 4] + mag[5:len(m) + 5] + mag[11:len(m) + 11]
          + mag[12:len(m) + 12] + mag[13:len(m) + 13]
          + mag[14:len(m) + 14])
    score = hi / (lo + 1e-9)
    cand = np.flatnonzero(
        (score > threshold)
        & (mag[0:len(m)] > mag[1:len(m) + 1])
        & (mag[2:len(m) + 2] > mag[3:len(m) + 3]))
    if cand.size == 0:
        return cand
    # non-maximum suppression within a preamble width
    keep: List[int] = []
    last = -PREAMBLE_SAMPLES
    for idx in cand:
        if idx - last >= PREAMBLE_SAMPLES:
            keep.append(int(idx))
            last = idx
        elif score[idx] > score[last]:
            keep[-1] = int(idx)
            last = idx
    return np.asarray(keep, np.int64)


def demod_frames(mag: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """PPM-demod 112-bit frames at each start; (n_frames, 14) uint8."""
    if starts.size == 0:
        return np.empty((0, 14), np.uint8)
    offs = PREAMBLE_SAMPLES + 2 * np.arange(MODES_LONG_BITS)
    first = mag[starts[:, None] + offs[None, :]]
    second = mag[starts[:, None] + offs[None, :] + 1]
    bits = (first > second).astype(np.uint8)      # (F, 112)
    return np.packbits(bits, axis=1)              # (F, 14)


# ---------------------------------------------------------------------------
# DF17 decode
# ---------------------------------------------------------------------------
_CALLSIGN_CHARS = (
    "#ABCDEFGHIJKLMNOPQRSTUVWXYZ##### ###############0123456789######")


@dataclass
class Aircraft:
    icao: str
    callsign: str = ""
    altitude_ft: Optional[float] = None
    lat: Optional[float] = None
    lon: Optional[float] = None
    speed_kt: Optional[float] = None
    heading_deg: Optional[float] = None
    vertical_rate_fpm: Optional[float] = None
    messages: int = 0
    last_seen: float = 0.0
    _cpr: Dict[int, Tuple[int, int, float]] = field(default_factory=dict)


def _bits(msg: np.ndarray, start: int, length: int) -> int:
    """Extract integer from bit offset within a 112-bit message."""
    v = 0
    for i in range(start, start + length):
        byte = msg[i // 8]
        v = (v << 1) | ((int(byte) >> (7 - (i % 8))) & 1)
    return v


def _nl(lat: float) -> int:
    """CPR longitude zone count NL(lat)."""
    if lat == 0:
        return 59
    if abs(lat) >= 87:
        return 1 if abs(lat) == 90 else 2
    nz = 15
    a = 1 - np.cos(np.pi / (2 * nz))
    b = np.cos(np.pi / 180.0 * abs(lat)) ** 2
    return int(np.floor(2 * np.pi /
                        np.arccos(1 - a / b)))


def decode_cpr(even: Tuple[int, int], odd: Tuple[int, int],
               odd_is_newer: bool) -> Optional[Tuple[float, float]]:
    """Globally-unambiguous CPR decode from an even/odd frame pair."""
    lat_even, lon_even = even
    lat_odd, lon_odd = odd
    dlat_even = 360.0 / 60
    dlat_odd = 360.0 / 59
    scale = 2 ** 17
    j = int(np.floor(59 * lat_even / scale - 60 * lat_odd / scale + 0.5))
    rlat_even = dlat_even * ((j % 60) + lat_even / scale)
    rlat_odd = dlat_odd * ((j % 59) + lat_odd / scale)
    if rlat_even >= 270:
        rlat_even -= 360
    if rlat_odd >= 270:
        rlat_odd -= 360
    if _nl(rlat_even) != _nl(rlat_odd):
        return None
    if odd_is_newer:
        rlat, lon_cpr, odd_flag = rlat_odd, lon_odd, 1
    else:
        rlat, lon_cpr, odd_flag = rlat_even, lon_even, 0
    nl = _nl(rlat)
    ni = max(nl - odd_flag, 1)
    m = int(np.floor(lon_even / scale * (nl - 1)
                     - lon_odd / scale * nl + 0.5))
    lon = (360.0 / ni) * ((m % ni) + lon_cpr / scale)
    if lon >= 180:
        lon -= 360
    return rlat, lon


class ModeSDecoder:
    """Stateful decoder: feeds magnitude blocks, maintains an aircraft
    table (the geomap/flight-tracker data source)."""

    def __init__(self, expire_s: float = 60.0):
        self.aircraft: Dict[str, Aircraft] = {}
        self.stats = {"preambles": 0, "crc_ok": 0, "decoded": 0}
        self._tail = np.zeros(0, np.float32)
        self._expire_s = expire_s

    def feed(self, mag: np.ndarray, now: Optional[float] = None
             ) -> List[Aircraft]:
        now = time.time() if now is None else now
        buf = np.concatenate([self._tail, mag.astype(np.float32)])
        starts = detect_preambles(buf)
        self.stats["preambles"] += int(starts.size)
        updated: List[Aircraft] = []
        if starts.size:
            frames = demod_frames(buf, starts)
            for msg in frames:
                if (int(msg[0]) >> 3) != 17:    # DF17 extended squitter
                    continue
                if crc24(msg) != 0:
                    continue
                self.stats["crc_ok"] += 1
                ac = self._decode_df17(msg, now)
                if ac is not None:
                    updated.append(ac)
        keep = max(len(buf) - LONG_SAMPLES + 1, 0)
        self._tail = buf[keep:]
        self._expire(now)
        return updated

    # ------------------------------------------------------------------
    def _decode_df17(self, msg: np.ndarray, now: float
                     ) -> Optional[Aircraft]:
        icao = f"{_bits(msg, 8, 24):06X}"
        ac = self.aircraft.setdefault(icao, Aircraft(icao=icao))
        ac.messages += 1
        ac.last_seen = now
        tc = _bits(msg, 32, 5)
        if 1 <= tc <= 4:          # identification
            cs = "".join(_CALLSIGN_CHARS[_bits(msg, 40 + 6 * i, 6)]
                         for i in range(8))
            ac.callsign = cs.replace("#", "").strip()
        elif 9 <= tc <= 18:       # airborne position
            alt_code = _bits(msg, 40, 12)
            q = (alt_code >> 4) & 1
            if q:
                n = ((alt_code >> 5) << 4) | (alt_code & 0xF)
                ac.altitude_ft = n * 25 - 1000
            odd = _bits(msg, 53, 1)
            lat_cpr = _bits(msg, 54, 17)
            lon_cpr = _bits(msg, 71, 17)
            ac._cpr[odd] = (lat_cpr, lon_cpr, now)
            if 0 in ac._cpr and 1 in ac._cpr and \
                    abs(ac._cpr[0][2] - ac._cpr[1][2]) < 10.0:
                pos = decode_cpr(ac._cpr[0][:2], ac._cpr[1][:2],
                                 ac._cpr[1][2] > ac._cpr[0][2])
                if pos is not None:
                    ac.lat, ac.lon = pos
        elif tc == 19:            # velocity
            st = _bits(msg, 37, 3)
            if st in (1, 2):
                s_ew = _bits(msg, 45, 1)
                v_ew = _bits(msg, 46, 10) - 1
                s_ns = _bits(msg, 56, 1)
                v_ns = _bits(msg, 57, 10) - 1
                if v_ew >= 0 and v_ns >= 0:
                    vx = -v_ew if s_ew else v_ew
                    vy = -v_ns if s_ns else v_ns
                    ac.speed_kt = float(np.hypot(vx, vy))
                    ac.heading_deg = float(
                        (np.degrees(np.arctan2(vx, vy))) % 360)
                s_vr = _bits(msg, 68, 1)
                vr = _bits(msg, 69, 9) - 1
                if vr >= 0:
                    ac.vertical_rate_fpm = float(
                        (-vr if s_vr else vr) * 64)
        self.stats["decoded"] += 1
        return ac

    def _expire(self, now: float) -> None:
        dead = [k for k, a in self.aircraft.items()
                if now - a.last_seen > self._expire_s]
        for k in dead:
            del self.aircraft[k]


# ---------------------------------------------------------------------------
# frame synthesis (for tests and benchmarks)
# ---------------------------------------------------------------------------
def build_df17(icao: int, tc: int, me_tail_bits: int) -> bytes:
    """Build a DF17 frame: DF=17/CA=5, icao, 56-bit ME (tc in the top 5
    bits, remaining 51 bits given), + CRC."""
    me = (tc << 51) | (me_tail_bits & ((1 << 51) - 1))
    payload = bytes([0x8D,
                     (icao >> 16) & 0xFF, (icao >> 8) & 0xFF,
                     icao & 0xFF]) + me.to_bytes(7, "big")
    return attach_crc(payload)


def modulate(frame: bytes, sps2: bool = True) -> np.ndarray:
    """Render a frame as a 2 MS/s magnitude burst (preamble + PPM)."""
    bits = np.unpackbits(np.frombuffer(frame, np.uint8))
    sig = np.zeros(LONG_SAMPLES, np.float32)
    for s in (0, 2, 7, 9):
        sig[s] = 1.0
    for i, b in enumerate(bits):
        base = PREAMBLE_SAMPLES + 2 * i
        sig[base + (0 if b else 1)] = 1.0
    return sig
