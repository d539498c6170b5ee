"""Minimal QR code encoder (byte mode, EC level M, versions 1-10).

Replaces the reference's vendored qrencode, used by the remote
supervisor to print invite URLs as terminal QR codes
(/root/reference/src/instance_remote_supervisor.cc, qrencode.wrap).

Implements ISO/IEC 18004 byte-mode encoding: data codewords +
Reed-Solomon EC over GF(256), function patterns, zig-zag placement,
mask evaluation, and format info (BCH 15,5).  No external deps.
"""

from __future__ import annotations

from typing import List

import numpy as np

# (total codewords, EC codewords per block, group1 blocks, group1 data
#  codewords, group2 blocks, group2 data codewords) for EC level M
_VERSIONS_M = {
    1: (26, 10, 1, 16, 0, 0),
    2: (44, 16, 1, 28, 0, 0),
    3: (70, 26, 1, 44, 0, 0),
    4: (100, 18, 2, 32, 0, 0),
    5: (134, 24, 2, 43, 0, 0),
    6: (172, 16, 4, 27, 0, 0),
    7: (196, 18, 4, 31, 0, 0),
    8: (242, 22, 2, 38, 2, 39),
    9: (292, 22, 3, 36, 2, 37),
    10: (346, 26, 4, 43, 1, 44),
}

_ALIGN = {
    1: [], 2: [6, 18], 3: [6, 22], 4: [6, 26], 5: [6, 30],
    6: [6, 34], 7: [6, 22, 38], 8: [6, 24, 42], 9: [6, 26, 46],
    10: [6, 28, 50],
}

# GF(256) tables, generator 0x11d
_EXP = np.zeros(512, np.int32)
_LOG = np.zeros(256, np.int32)
_x = 1
for _i in range(255):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x <<= 1
    if _x & 0x100:
        _x ^= 0x11d
_EXP[255:510] = _EXP[:255]


def _gf_mul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return int(_EXP[_LOG[a] + _LOG[b]])


def _rs_generator(n: int) -> List[int]:
    g = [1]
    for i in range(n):
        ng = [0] * (len(g) + 1)
        for j, c in enumerate(g):
            ng[j] ^= _gf_mul(c, int(_EXP[i]))
            ng[j + 1] ^= c
        g = ng
    return g[::-1]      # descending powers: g[0] is the (monic) lead


def rs_ec(data: List[int], n_ec: int) -> List[int]:
    """Reed-Solomon EC codewords for ``data``."""
    gen = _rs_generator(n_ec)
    rem = [0] * n_ec
    for d in data:
        factor = d ^ rem[0]
        rem = rem[1:] + [0]
        for j in range(n_ec):
            rem[j] ^= _gf_mul(gen[j + 1], factor)
    return rem


def _bits(value: int, length: int) -> List[int]:
    return [(value >> (length - 1 - i)) & 1 for i in range(length)]


def _encode_codewords(payload: bytes, version: int) -> List[int]:
    total, n_ec, g1, d1, g2, d2 = _VERSIONS_M[version]
    n_data = g1 * d1 + g2 * d2
    cci = 8 if version <= 9 else 16
    bits = _bits(0b0100, 4) + _bits(len(payload), cci)
    for b in payload:
        bits += _bits(b, 8)
    cap = n_data * 8
    if len(bits) > cap:
        raise ValueError("payload too long for version")
    bits += [0] * min(4, cap - len(bits))          # terminator
    while len(bits) % 8:
        bits.append(0)
    data = [int("".join(map(str, bits[i:i + 8])), 2)
            for i in range(0, len(bits), 8)]
    pad = (0xEC, 0x11)
    i = 0
    while len(data) < n_data:
        data.append(pad[i % 2])
        i += 1
    # split into blocks, compute EC, interleave
    blocks, pos = [], 0
    for _ in range(g1):
        blocks.append(data[pos:pos + d1])
        pos += d1
    for _ in range(g2):
        blocks.append(data[pos:pos + d2])
        pos += d2
    ecs = [rs_ec(b, n_ec) for b in blocks]
    out: List[int] = []
    for i in range(max(len(b) for b in blocks)):
        for b in blocks:
            if i < len(b):
                out.append(b[i])
    for i in range(n_ec):
        for e in ecs:
            out.append(e[i])
    assert len(out) == total, (len(out), total)
    return out


def _function_mask(version: int) -> np.ndarray:
    """True where modules are function patterns (not data)."""
    size = 17 + 4 * version
    f = np.zeros((size, size), bool)
    for r, c in ((0, 0), (0, size - 7), (size - 7, 0)):
        f[max(r - 1, 0):r + 8, max(c - 1, 0):c + 8] = True
    f[6, :] = True
    f[:, 6] = True
    for cy in _ALIGN[version]:
        for cx in _ALIGN[version]:
            if (cy < 9 and cx < 9) or (cy < 9 and cx > size - 10) \
                    or (cy > size - 10 and cx < 9):
                continue          # overlaps a finder pattern
            f[cy - 2:cy + 3, cx - 2:cx + 3] = True
    # format info areas
    f[8, :9] = True
    f[:9, 8] = True
    f[8, size - 8:] = True
    f[size - 8:, 8] = True
    if version >= 7:                  # version info blocks
        f[size - 11:size - 8, :6] = True
        f[:6, size - 11:size - 8] = True
    return f


def _draw_function_patterns(m: np.ndarray, version: int) -> None:
    size = m.shape[0]

    def finder(r, c):
        m[r:r + 7, c:c + 7] = 1
        m[r + 1:r + 6, c + 1:c + 6] = 0
        m[r + 2:r + 5, c + 2:c + 5] = 1

    finder(0, 0)
    finder(0, size - 7)
    finder(size - 7, 0)
    for i in range(8, size - 8):
        m[6, i] = m[i, 6] = (i + 1) % 2
    for cy in _ALIGN[version]:
        for cx in _ALIGN[version]:
            if (cy < 9 and cx < 9) or (cy < 9 and cx > size - 10) \
                    or (cy > size - 10 and cx < 9):
                continue
            m[cy - 2:cy + 3, cx - 2:cx + 3] = 1
            m[cy - 1:cy + 2, cx - 1:cx + 2] = 0
            m[cy, cx] = 1
    m[size - 8, 8] = 1                       # dark module
    if version >= 7:
        # version info: 6 data bits + BCH(18,6), generator 0x1f25
        val = version << 12
        for i in range(17, 11, -1):
            if val & (1 << i):
                val ^= 0x1f25 << (i - 12)
        vbits = (version << 12) | val
        for i in range(18):
            b = (vbits >> i) & 1
            m[size - 11 + i % 3, i // 3] = b
            m[i // 3, size - 11 + i % 3] = b


_MASKS = [
    lambda r, c: (r + c) % 2 == 0,
    lambda r, c: r % 2 == 0,
    lambda r, c: c % 3 == 0,
    lambda r, c: (r + c) % 3 == 0,
    lambda r, c: (r // 2 + c // 3) % 2 == 0,
    lambda r, c: (r * c) % 2 + (r * c) % 3 == 0,
    lambda r, c: ((r * c) % 2 + (r * c) % 3) % 2 == 0,
    lambda r, c: ((r + c) % 2 + (r * c) % 3) % 2 == 0,
]


def _format_bits(mask: int) -> List[int]:
    """EC level M (0b00) + mask, BCH(15,5) + fixed XOR."""
    data = (0b00 << 3) | mask
    val = data << 10
    gen = 0b10100110111
    for i in range(14, 9, -1):
        if val & (1 << i):
            val ^= gen << (i - 10)
    bits = (data << 10) | val
    bits ^= 0b101010000010010
    return _bits(bits, 15)


def _place_data(m: np.ndarray, func: np.ndarray,
                codewords: List[int]) -> None:
    size = m.shape[0]
    bits = []
    for cw in codewords:
        bits += _bits(cw, 8)
    # remainder bits
    bits += [0] * 8
    idx = 0
    col = size - 1
    upward = True
    while col > 0:
        if col == 6:
            col -= 1
        rows = range(size - 1, -1, -1) if upward else range(size)
        for r in rows:
            for c in (col, col - 1):
                if not func[r, c] and idx < len(bits):
                    m[r, c] = bits[idx]
                    idx += 1
        upward = not upward
        col -= 2


def _apply_format(m: np.ndarray, mask: int) -> None:
    size = m.shape[0]
    fb = _format_bits(mask)
    coords_a = [(8, 0), (8, 1), (8, 2), (8, 3), (8, 4), (8, 5), (8, 7),
                (8, 8), (7, 8), (5, 8), (4, 8), (3, 8), (2, 8), (1, 8),
                (0, 8)]
    coords_b = [(size - 1, 8), (size - 2, 8), (size - 3, 8),
                (size - 4, 8), (size - 5, 8), (size - 6, 8),
                (size - 7, 8), (8, size - 8), (8, size - 7),
                (8, size - 6), (8, size - 5), (8, size - 4),
                (8, size - 3), (8, size - 2), (8, size - 1)]
    for (r, c), b in zip(coords_a, fb):
        m[r, c] = b
    for (r, c), b in zip(coords_b, fb):
        m[r, c] = b


def _penalty(m: np.ndarray) -> int:
    size = m.shape[0]
    pen = 0
    for grid in (m, m.T):
        for row in grid:
            run = 1
            for i in range(1, size):
                if row[i] == row[i - 1]:
                    run += 1
                else:
                    if run >= 5:
                        pen += 3 + run - 5
                    run = 1
            if run >= 5:
                pen += 3 + run - 5
    blocks = (m[:-1, :-1] == m[1:, :-1]) & (m[:-1, :-1] == m[:-1, 1:]) \
        & (m[:-1, :-1] == m[1:, 1:])
    pen += 3 * int(blocks.sum())
    pat = np.array([1, 0, 1, 1, 1, 0, 1, 0, 0, 0, 0], np.int8)
    for grid in (m, m.T):
        for row in grid:
            s = row.astype(np.int8)
            for i in range(size - 10):
                if np.array_equal(s[i:i + 11], pat) or \
                        np.array_equal(s[i:i + 11], pat[::-1]):
                    pen += 40
    dark = int(m.sum())
    k = abs(dark * 100 // (size * size) - 50) // 5
    pen += 10 * k
    return pen


def qr_matrix(text: str) -> np.ndarray:
    """Encode ``text`` -> boolean module matrix (True = dark)."""
    payload = text.encode("utf-8")
    version = None
    for v, (total, n_ec, g1, d1, g2, d2) in _VERSIONS_M.items():
        cci = 8 if v <= 9 else 16
        if (g1 * d1 + g2 * d2) * 8 >= 4 + cci + 8 * len(payload):
            version = v
            break
    if version is None:
        raise ValueError("payload too long (max version 10, EC M)")
    codewords = _encode_codewords(payload, version)
    size = 17 + 4 * version
    func = _function_mask(version)
    base = np.zeros((size, size), np.uint8)
    _draw_function_patterns(base, version)
    _place_data(base, func, codewords)
    best, best_pen = None, None
    for mask in range(8):
        m = base.copy()
        rr, cc = np.meshgrid(np.arange(size), np.arange(size),
                             indexing="ij")
        sel = np.vectorize(_MASKS[mask])(rr, cc) & ~func
        m[sel] ^= 1
        _apply_format(m, mask)
        p = _penalty(m)
        if best_pen is None or p < best_pen:
            best, best_pen = m, p
    return best.astype(bool)


def qr_terminal(text: str, invert: bool = False) -> str:
    """Render as unicode half-block text (2 modules per character
    row), with a quiet zone — scannable straight off the terminal."""
    m = qr_matrix(text)
    size = m.shape[0]
    q = 2
    full = np.zeros((size + 2 * q, size + 2 * q), bool)
    full[q:q + size, q:q + size] = m
    if not invert:
        full = ~full
    if full.shape[0] % 2:
        full = np.vstack([full, np.zeros((1, full.shape[1]), bool)
                          if invert else
                          np.ones((1, full.shape[1]), bool)])
    chars = {(True, True): "█", (True, False): "▀",
             (False, True): "▄", (False, False): " "}
    lines = []
    for r in range(0, full.shape[0], 2):
        lines.append("".join(chars[(bool(full[r, c]),
                                    bool(full[r + 1, c]))]
                             for c in range(full.shape[1])))
    return "\n".join(lines)
