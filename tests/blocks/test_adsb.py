"""Mode-S/ADS-B decoder tests with synthesized DF17 frames."""

import numpy as np
import pytest

from cyberether_tpu.ops import modes


def _noise(n, rng, level=0.02):
    return (level * np.abs(rng.standard_normal(n))).astype(np.float32)


def _embed(frames, gap, rng):
    parts = [_noise(gap, rng)]
    for f in frames:
        parts.append(modes.modulate(f))
        parts.append(_noise(gap, rng))
    return np.concatenate(parts)


def test_crc_roundtrip():
    frame = modes.build_df17(0xABCDEF, 1, 0)
    assert len(frame) == 14
    assert modes.crc24(np.frombuffer(frame, np.uint8)) == 0
    corrupted = bytearray(frame)
    corrupted[5] ^= 0x10
    assert modes.crc24(np.frombuffer(bytes(corrupted), np.uint8)) != 0


def test_preamble_detection_and_demod(rng):
    frame = modes.build_df17(0x4840D6, 4, 0x1234567890)
    sig = _embed([frame], 500, rng)
    starts = modes.detect_preambles(sig)
    assert starts.size >= 1
    decoded = modes.demod_frames(sig, starts)
    raw = np.frombuffer(frame, np.uint8)
    assert any(np.array_equal(d, raw) for d in decoded)


def test_callsign_decode(rng):
    # callsign "ABC123  ": chars via 6-bit alphabet
    chars = [1, 2, 3, 48 + 1, 48 + 2, 48 + 3, 32, 32]
    me_tail = 0
    for c in chars:
        me_tail = (me_tail << 6) | c
    # ME: tc(5) + ca(3) + 48 bits callsign = 56; our build_df17 packs
    # tc in top 5 bits of 56 -> tail is 51 bits: ca(3) + 48 callsign
    frame = modes.build_df17(0x4840D6, 4, me_tail)
    dec = modes.ModeSDecoder()
    updated = dec.feed(_embed([frame], 400,
                              np.random.default_rng(7)))
    assert updated
    ac = dec.aircraft["4840D6"]
    assert ac.callsign == "ABC123"
    assert ac.messages == 1


def test_velocity_decode(rng):
    # TC19 subtype 1: groundspeed east 100 kt, north 200 kt
    st = 1
    v_ew, v_ns = 100 + 1, 200 + 1
    tail = (st << 48) | (0 << 45 - 37) \
        if False else None
    # layout (bit offsets within 112): tc:32-37, st:37-40, ic+res:40-45,
    # s_ew:45, v_ew:46-56, s_ns:56, v_ns:57-67, vr stuff after
    me_tail = 0
    me_tail |= st << (51 - 3)                       # bits 37-40
    me_tail |= 0 << (51 - 8 - 1) | (v_ew << (51 - 8 - 1 - 10))
    me_tail |= 0 << (51 - 19 - 1) | (v_ns << (51 - 19 - 1 - 10))
    frame = modes.build_df17(0xA1B2C3, 19, me_tail)
    dec = modes.ModeSDecoder()
    dec.feed(_embed([frame], 300, np.random.default_rng(3)))
    ac = dec.aircraft.get("A1B2C3")
    assert ac is not None
    assert ac.speed_kt == pytest.approx(np.hypot(100, 200), rel=1e-3)
    assert ac.heading_deg == pytest.approx(
        np.degrees(np.arctan2(100, 200)), rel=1e-2)


def test_cpr_position_pair(rng):
    """Even+odd CPR frames for a known position decode to ~ the truth
    (CPR decode reference values: lat 52.2572, lon 3.91937 for the
    classic example pair)."""
    # classic mode-s.org example: even (93000, 51372), odd (74158, 50194)
    pos = modes.decode_cpr((93000, 51372), (74158, 50194),
                           odd_is_newer=False)
    assert pos is not None
    lat, lon = pos
    assert lat == pytest.approx(52.2572, abs=1e-3)
    assert lon == pytest.approx(3.91937, abs=1e-3)


def test_adsb_block_pipeline(rng, tmp_path):
    """adsb block consumes an IQ stream carrying a DF17 burst."""
    from cyberether_tpu.core.flowgraph import Flowgraph

    frame = modes.build_df17(0x4840D6, 4, 0x0E378E64D8)
    mag = _embed([frame] * 3, 2000, rng)
    iq = (mag * np.exp(1j * 0.3 * np.arange(len(mag)))).astype(
        np.complex64)
    pad = (-len(iq)) % 4096
    iq = np.concatenate([iq, np.zeros(pad, np.complex64)])
    path = str(tmp_path / "adsb.iq")
    iq.tofile(path)
    yaml_text = f"""
version: 2
graph:
  - name: src
    module: file_reader
    config: {{filepath: "{path}", batchSize: 4096, dataType: CF32,
              sampleRate: 2000000, loop: false}}
  - name: dec
    module: adsb
    input: {{signal: '${{graph.src.output.signal}}'}}
"""
    fg = Flowgraph.from_yaml(yaml_text)
    try:
        for _ in range(len(iq) // 4096):
            fg.compute(timeout=2.0)
        frames = fg.present()
        assert "dec" in frames
        data = frames["dec"]
        assert data["kind"] == "map"
        assert data["stats"]["crc_ok"] >= 3
        assert any(a["icao"] == "4840D6" for a in data["aircraft"])
    finally:
        fg.stop()


def test_map_render():
    from cyberether_tpu.blocks.adsb import _render_map

    img = _render_map([
        {"icao": "A", "lat": 52.0, "lon": 4.0, "heading_deg": 90.0},
        {"icao": "B", "lat": 52.5, "lon": 4.5, "heading_deg": None},
        {"icao": "C", "lat": None, "lon": None, "heading_deg": None},
    ])
    assert img.shape == (256, 256, 4)
    # aircraft pixels drawn in green
    assert (img[..., 1] == 250).any()
