"""QR encoder (utils/qr.py) — structural invariants plus a true
round-trip through OpenCV's detector when available.

Reference cognate: vendored qrencode used by the remote supervisor
(/root/reference/src/instance_remote_supervisor.cc).
"""

import numpy as np
import pytest

from cyberether_tpu.utils.qr import (_EXP, _LOG, qr_matrix, qr_terminal,
                                     rs_ec)


def _gf_mul(a, b):
    if a == 0 or b == 0:
        return 0
    return int(_EXP[_LOG[a] + _LOG[b]])


def _poly_eval(poly, x):
    acc = 0
    for c in poly:
        acc = _gf_mul(acc, x) ^ c
    return acc


def test_rs_codeword_roots():
    """data||ec must evaluate to zero at the generator roots a^0..a^n-1
    — the defining Reed-Solomon property, independent of the encoder's
    internals."""
    rng = np.random.default_rng(0)
    data = [int(v) for v in rng.integers(0, 256, 30)]
    n_ec = 18
    cw = data + rs_ec(data, n_ec)
    for i in range(n_ec):
        assert _poly_eval(cw, int(_EXP[i])) == 0, i


@pytest.mark.parametrize("text,size", [
    ("A", 21),                          # version 1
    ("hello world 123", 25),            # version 2
    ("x" * 70, 37),                     # version 5, two EC blocks
    ("x" * 120, 45),                    # version 7, version-info blocks
    ("z" * 200, 57),                    # version 10, 16-bit char count
])
def test_qr_matrix_structure(text, size):
    m = qr_matrix(text)
    assert m.shape == (size, size)
    # finder patterns: 7x7 ring at three corners
    for r, c in ((0, 0), (0, size - 7), (size - 7, 0)):
        assert m[r:r + 7, c:c + 7].sum() == 33  # 49-16 light ring
    # timing pattern alternates
    assert all(m[6, i] == ((i + 1) % 2) for i in range(8, size - 8))
    assert bool(m[size - 8, 8])                  # dark module


def test_qr_roundtrip_opencv():
    cv2 = pytest.importorskip("cv2")
    det = cv2.QRCodeDetector()
    for text in ("A", "http://10.0.0.1:8765/?token=s3cret",
                 "x" * 120, "z" * 200):
        m = qr_matrix(text)
        img = np.kron(
            np.pad(np.where(m, 0, 255).astype(np.uint8), 4,
                   constant_values=255), np.ones((8, 8), np.uint8))
        data, _, _ = det.detectAndDecode(img)
        if data != text:   # cv2 is flaky on crisp synthetic images
            data, _, _ = det.detectAndDecode(
                cv2.GaussianBlur(img, (5, 5), 0))
        assert data == text


def test_qr_terminal_render():
    s = qr_terminal("hi")
    lines = s.splitlines()
    assert len(lines) >= (21 + 4) // 2
    assert all(len(line) == 21 + 4 for line in lines)
    assert set("".join(lines)) <= set(" ▀▄█")


def test_qr_too_long():
    with pytest.raises(ValueError):
        qr_matrix("q" * 500)


def test_supervisor_banner_and_status():
    import io

    from cyberether_tpu import Instance
    from cyberether_tpu.remote.supervisor import Supervisor

    class FakeServer:
        port = 8765
        token = "tok"
        _clients = set()

    inst = Instance(headless=True)
    try:
        buf = io.StringIO()
        sup = Supervisor(inst, FakeServer(), out=buf)
        sup.print_banner()
        text = buf.getvalue()
        assert "invite: http://" in text
        assert "?token=tok" in text
        assert "█" in text or "▀" in text       # QR module blocks
        line = sup.status_line()
        assert "clients:0" in line
    finally:
        inst.stop()
