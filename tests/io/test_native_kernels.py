"""Native host-path kernels (native/ceruntime.cc round-4 additions):
colormap rasterizer + fixed-point format converters, checked against
the numpy fallbacks bit-for-bit."""

import numpy as np
import pytest

from cyberether_tpu.io import native


def test_colormap_matches_numpy():
    from cyberether_tpu.viz.colormaps import _LUT256, apply_colormap

    rng = np.random.default_rng(0)
    norm = rng.uniform(-0.2, 1.2, (64, 257)).astype(np.float32)
    norm[0, 0] = np.nan
    norm[0, 1] = np.inf
    norm[0, 2] = -np.inf
    got = apply_colormap(norm)     # native when available
    # numpy reference (the documented fallback semantics)
    idx = np.clip((np.nan_to_num(norm, nan=0.0, posinf=1.0,
                                 neginf=0.0)
                   * 255).astype(np.int32), 0, 255)
    rgb = _LUT256[idx]
    ref = np.concatenate(
        [rgb, np.full(rgb.shape[:-1] + (1,), 255, np.uint8)], axis=-1)
    assert got.shape == ref.shape and got.dtype == np.uint8
    np.testing.assert_array_equal(got, ref)


def test_native_colormap_actually_used():
    if not native.available():
        pytest.skip("native lib unavailable")
    from cyberether_tpu.viz.colormaps import _LUT256

    out = native.colormap_rgba(
        np.linspace(0, 1, 256, dtype=np.float32), _LUT256)
    assert out is not None
    np.testing.assert_array_equal(out[..., :3], _LUT256)
    assert np.all(out[..., 3] == 255)


def test_ci8_ci16_converters():
    rng = np.random.default_rng(1)
    raw8 = rng.integers(-127, 128, 4096, dtype=np.int8)
    got8 = native.ci8_to_cf32(raw8)
    ref8 = (raw8[0::2] / 127.0 + 1j * raw8[1::2] / 127.0) \
        .astype(np.complex64)
    np.testing.assert_allclose(got8, ref8, atol=1e-7)

    raw16 = rng.integers(-32767, 32768, 4096, dtype=np.int16)
    got16 = native.ci16_to_cf32(raw16)
    ref16 = (raw16[0::2] / 32767.0 + 1j * raw16[1::2] / 32767.0) \
        .astype(np.complex64)
    np.testing.assert_allclose(got16, ref16, atol=1e-7)


def test_f32_to_s16_clamps():
    pcm = np.asarray([0.0, 0.5, 1.0, -1.0, 1.5, -1.5, 1e-5],
                     np.float32)
    got = native.f32_to_s16(pcm)
    assert got.dtype == np.int16
    assert got[2] == 32767 and got[3] == -32767
    assert got[4] == 32767 and got[5] == -32768
    assert abs(int(got[1]) - 16384) <= 1


def test_ci8_odd_size_tolerated():
    """A truncated capture (odd byte count) drops the trailing half
    sample in BOTH the native and fallback paths."""
    raw = np.arange(-3, 4, dtype=np.int8)   # 7 elements -> 3 pairs
    out = native.ci8_to_cf32(raw)
    assert out.size == 3
    out16 = native.ci16_to_cf32(np.arange(5, dtype=np.int16))
    assert out16.size == 2


def test_audio_stream_seq_distinct_per_chunk():
    """present_data chunks are destructively drained: every chunk must
    carry a DISTINCT monotone seq so the server's dirty tracking can
    never discard one (review finding: a backlog > one chunk under the
    old samples_out stamp produced duplicate fingerprints and audible
    gaps)."""
    from cyberether_tpu.blocks.io import AudioModule
    from cyberether_tpu.core.tensor import TensorSpec
    from cyberether_tpu.core.types import DataType, Device

    mod = AudioModule(
        "a", {"inSampleRate": 8000.0, "outSampleRate": 8000.0},
        {"buffer": TensorSpec((4096,), DataType.F32, Device.CPU)})
    mod.host_start()
    pcm = np.random.default_rng(0).standard_normal(100_000) \
        .astype(np.float32)
    mod.host_consume({"buffer": pcm}, True)   # backlog >> one chunk
    seqs = []
    while True:
        d = mod.present_data({}, None)
        if d is None:
            break
        seqs.append(d["seq"])
        assert d["pcm"].size > 0
    assert len(seqs) >= 3                      # several chunks drained
    assert len(set(seqs)) == len(seqs)         # all distinct
    assert seqs == sorted(seqs)                # monotone
