"""Numeric tests for the dsp domain, mirroring the reference's module
tests (analytic golden values; tolerances follow
/root/reference/src/domains/dsp/fft/module_tests.cc:83-89 — 1e-3 dB
bins, 1e-2 roundtrip, 1e-4 real transforms).
"""

import numpy as np
import pytest
import scipy.fftpack
import scipy.signal

from cyberether_tpu.core.tensor import SignalAxes
from cyberether_tpu.testing import TestContext


# ---------------------------------------------------------------------------
# window
# ---------------------------------------------------------------------------
def test_window_blackman():
    ctx = TestContext("window", {"size": 64}).run()
    w = ctx.output("window")
    n = np.arange(64)
    ref = 0.42 - 0.5 * np.cos(2 * np.pi * n / 63) \
        + 0.08 * np.cos(4 * np.pi * n / 63)
    np.testing.assert_allclose(w.real, ref, atol=1e-6)
    np.testing.assert_allclose(w.imag, 0.0)


def test_window_single_tap():
    ctx = TestContext("window", {"size": 1}).run()
    np.testing.assert_allclose(ctx.output("window"), [1.0 + 0j])


# ---------------------------------------------------------------------------
# fft — pocketfft conventions (unnormalized both directions)
# ---------------------------------------------------------------------------
def test_fft_c2c_forward_dc_bin(rng):
    x = np.ones(128, np.complex64)
    out = TestContext("fft", {"forward": True}).set_input("signal", x) \
        .run().output("signal")
    assert abs(out[0] - 128.0) < 1e-3
    np.testing.assert_allclose(np.abs(out[1:]), 0, atol=1e-3)


def test_fft_c2c_known_sinusoid():
    n = 256
    k = 16
    x = np.exp(2j * np.pi * k * np.arange(n) / n).astype(np.complex64)
    out = TestContext("fft", {"forward": True}).set_input("signal", x) \
        .run().output("signal")
    assert abs(out[k] - n) < 1e-2
    mask = np.ones(n, bool)
    mask[k] = False
    np.testing.assert_allclose(np.abs(out[mask]), 0, atol=1e-2)


def test_fft_c2c_roundtrip_unnormalized(rng):
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)
         ).astype(np.complex64)
    f = TestContext("fft", {"forward": True}).set_input("signal", x) \
        .run().output("signal")
    b = TestContext("fft", {"forward": False}).set_input("signal", f) \
        .run().output("signal")
    np.testing.assert_allclose(b, x * 512, atol=1e-2)


def test_fft_r2c_complex_output(rng):
    x = rng.standard_normal(128).astype(np.float32)
    out = TestContext("fft", {"forward": True, "complexOutput": True}) \
        .set_input("signal", x).run().output("signal")
    assert out.shape == (65,)
    np.testing.assert_allclose(out, np.fft.rfft(x), atol=1e-3)


def test_fft_r2r_fftpack_packing(rng):
    x = rng.standard_normal(64).astype(np.float32)
    out = TestContext("fft", {"forward": True, "complexOutput": False}) \
        .set_input("signal", x).run().output("signal")
    assert out.dtype == np.float32 and out.shape == (64,)
    ref = scipy.fftpack.rfft(x)   # FFTPACK halfcomplex packing
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_fft_r2r_backward(rng):
    x = rng.standard_normal(64).astype(np.float32)
    fwd = scipy.fftpack.rfft(x).astype(np.float32)
    out = TestContext("fft", {"forward": False, "complexOutput": False}) \
        .set_input("signal", fwd).run().output("signal")
    np.testing.assert_allclose(out, x * 64, atol=1e-2)


def test_fft_batched_axis(rng):
    x = (rng.standard_normal((4, 64)) + 1j * rng.standard_normal((4, 64))
         ).astype(np.complex64)
    out = TestContext("fft", {"forward": True}).set_input("signal", x) \
        .run().output("signal")
    np.testing.assert_allclose(out, np.fft.fft(x, axis=1), atol=1e-2)


# ---------------------------------------------------------------------------
# amplitude
# ---------------------------------------------------------------------------
def test_amplitude_db_with_normalization(rng):
    n = 128
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    out = TestContext("amplitude").set_input("signal", x).run() \
        .output("signal")
    ref = 20 * np.log10(np.abs(x)) + 20 * np.log10(1.0 / n)
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_amplitude_zero_is_neg_inf():
    x = np.zeros(8, np.complex64)
    out = TestContext("amplitude").set_input("signal", x).run() \
        .output("signal")
    assert np.all(np.isneginf(out))


def test_amplitude_real_input(rng):
    x = rng.standard_normal(64).astype(np.float32)
    out = TestContext("amplitude").set_input("signal", x).run() \
        .output("signal")
    ref = 20 * np.log10(np.abs(x)) + 20 * np.log10(1.0 / 64)
    np.testing.assert_allclose(out, ref, atol=1e-3)


# ---------------------------------------------------------------------------
# invert — (-1)^n spectrum inversion
# ---------------------------------------------------------------------------
def test_invert_even_length(rng):
    x = (rng.standard_normal(64) + 1j * rng.standard_normal(64)
         ).astype(np.complex64)
    out = TestContext("invert").set_input("signal", x).run() \
        .output("signal")
    ref = x * np.where(np.arange(64) % 2 == 0, 1, -1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_invert_odd_length(rng):
    n = 63
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    out = TestContext("invert").set_input("signal", x).run() \
        .output("signal")
    phase = 2.0 * np.pi * (n // 2) * np.arange(n) / n
    ref = x * np.exp(1j * phase)
    np.testing.assert_allclose(out, ref, atol=1e-4)


# ---------------------------------------------------------------------------
# agc — tiled RMS with slew-limited linear interpolation
# ---------------------------------------------------------------------------
def _agc_reference(x, tile, ref=1.0, eps=1e-12, gmin=0.01, gmax=100.0,
                   gchg=4.0):
    n = len(x)
    ntiles = 1 + (n - 1) // tile
    out = np.empty_like(x)

    def calc(t):
        s = t * tile
        ln = min(tile, n - s)
        mp = np.mean(np.abs(x[s:s + ln]) ** 2)
        return np.clip(ref / np.sqrt(mp + eps), gmin, gmax)

    start = calc(0)
    for t in range(ntiles):
        s = t * tile
        ln = min(tile, n - s)
        if t + 1 < ntiles:
            raw = calc(t + 1)
            lo = max(gmin, start / gchg)
            hi = gmax if start > gmax / gchg else start * gchg
            end = np.clip(raw, lo, hi)
        else:
            end = start
        step = (end - start) / ln
        for i in range(ln):
            out[s + i] = x[s + i] * (start + step * i)
        start = end
    return out


def test_agc_matches_reference_semantics(rng):
    x = (0.1 * (rng.standard_normal(300) + 1j * rng.standard_normal(300))
         ).astype(np.complex64)
    out = TestContext("agc", {"tileSize": 128}).set_input("signal", x) \
        .run().output("signal")
    ref = _agc_reference(x.astype(np.complex128), 128)
    np.testing.assert_allclose(out, ref.astype(np.complex64), rtol=1e-3,
                               atol=1e-5)


def test_agc_normalizes_rms(rng):
    x = (0.01 * (rng.standard_normal(4096) + 1j *
                 rng.standard_normal(4096))).astype(np.complex64)
    out = TestContext("agc", {"tileSize": 4096}).set_input("signal", x) \
        .run().output("signal")
    rms = np.sqrt(np.mean(np.abs(out) ** 2))
    assert 0.5 < rms < 2.0


# ---------------------------------------------------------------------------
# am — envelope + DC blocker (out[n] = env[n]-env[n-1]+a*out[n-1])
# ---------------------------------------------------------------------------
def test_am_dc_blocker_matches_loop(rng):
    n = 500
    t = np.arange(n)
    msg = np.sin(2 * np.pi * 5 * t / n)
    carrier = np.exp(2j * np.pi * 50 * t / n)
    x = ((1.0 + 0.5 * msg) * carrier).astype(np.complex64)
    out = TestContext("am", {"dcAlpha": 0.995}).set_input("signal", x) \
        .run().output("signal")
    env = np.abs(x)
    ref = np.empty(n, np.float32)
    prev_env, prev_out = 0.0, 0.0
    for i in range(n):
        ref[i] = env[i] - prev_env + 0.995 * prev_out
        prev_env, prev_out = env[i], ref[i]
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_am_state_continuity(rng):
    x = (np.exp(2j * np.pi * 0.1 * np.arange(64))).astype(np.complex64)
    ctx = TestContext("am", {})
    ctx.set_input("signal", x)
    out1 = ctx.run().output("signal").copy()
    out2 = ctx.run().output("signal")
    # second run starts from carried state -> different first sample
    assert not np.allclose(out1[0], out2[0])


# ---------------------------------------------------------------------------
# fm — quadrature discriminator
# ---------------------------------------------------------------------------
def test_fm_narrow_recovers_tone():
    sr = 240e3
    n = 4096
    fm_dev = 100e3   # narrow-mode deviation constant
    msg_f = 1e3
    t = np.arange(n) / sr
    msg = np.sin(2 * np.pi * msg_f * t)
    phase = 2 * np.pi * fm_dev * np.cumsum(msg) / sr
    x = np.exp(1j * phase).astype(np.complex64)
    out = TestContext("fm", {"mode": "narrow", "sampleRate": sr}) \
        .set_input("signal", x).run().output("signal")
    # first sample has no previous -> 0; rest tracks the message
    # (demod[n] = (phase[n]-phase[n-1]) * ref = msg[n])
    assert out[0] == 0.0
    np.testing.assert_allclose(out[1:], msg[1:], atol=0.01)


def test_fm_batch_stream_continuity():
    sr = 240e3
    x = np.exp(1j * 0.3 * np.arange(512)).astype(np.complex64)
    batched = x.reshape(4, 128)
    out = TestContext("fm", {"sampleRate": sr}) \
        .set_input("signal", batched,
                   axes=SignalAxes(batch=0, sample=1)) \
        .run().output("signal")
    flat = out.reshape(-1)
    # constant frequency -> constant demod value after the first sample
    np.testing.assert_allclose(flat[1:], flat[1], atol=1e-3)


def test_fm_deemphasis_is_lowpass():
    sr = 240e3
    rng_ = np.random.default_rng(3)
    phase = np.cumsum(rng_.standard_normal(8192)) * 0.1
    x = np.exp(1j * phase).astype(np.complex64)
    plain = TestContext("fm", {"sampleRate": sr}) \
        .set_input("signal", x).run().output("signal")
    deemph = TestContext("fm", {"sampleRate": sr, "deemphasis": "75us"}) \
        .set_input("signal", x).run().output("signal")
    assert np.std(np.diff(deemph)) < np.std(np.diff(plain))


def test_fm_wide_outputs_stereo():
    sr = 480e3
    x = np.exp(1j * 0.1 * np.arange(2048)).astype(np.complex64)
    out = TestContext("fm", {"mode": "wide", "sampleRate": sr}) \
        .set_input("signal", x).run().output("signal")
    assert out.shape == (2048, 2)
    assert np.all(np.isfinite(out))


# ---------------------------------------------------------------------------
# squelch
# ---------------------------------------------------------------------------
def test_squelch_pass_and_skip(rng):
    loud = np.ones(64, np.complex64)
    ctx = TestContext("squelch", {"threshold": 0.5}) \
        .set_input("signal", loud).run()
    assert ctx.passed is True
    assert ctx.metrics["amplitude"] >= 1.0
    quiet = (0.01 * np.ones(64)).astype(np.complex64)
    ctx = TestContext("squelch", {"threshold": 0.5}) \
        .set_input("signal", quiet).run()
    assert ctx.passed is False


# ---------------------------------------------------------------------------
# filter_taps — windowed-sinc bandpass designer
# ---------------------------------------------------------------------------
def test_filter_taps_reference_formula():
    sr, bw, taps = 2e6, 200e3, 51
    out = TestContext("filter_taps",
                      {"sampleRate": sr, "bandwidth": bw,
                       "center": [0.0], "taps": taps}).run() \
        .output("coeffs")
    assert out.shape == (1, 51)
    fw = (bw / sr) / 2
    i = np.arange(taps, dtype=np.float64)
    nn = i - (taps - 1) / 2
    sinc = np.where(nn == 0, 2 * fw,
                    np.sin(2 * np.pi * fw * nn)
                    / (np.pi * np.where(nn == 0, 1, nn)))
    win = 0.42 - 0.5 * np.cos(2 * np.pi * i / (taps - 1)) \
        + 0.08 * np.cos(4 * np.pi * i / (taps - 1))
    np.testing.assert_allclose(out[0].real, sinc * win, atol=1e-6)
    np.testing.assert_allclose(out[0].imag, 0, atol=1e-7)


def test_filter_taps_multi_head_upconversion():
    sr, bw, taps = 2e6, 200e3, 31
    centers = [0.0, 500e3]
    out = TestContext("filter_taps",
                      {"sampleRate": sr, "bandwidth": bw,
                       "center": centers, "taps": taps}).run() \
        .output("coeffs")
    assert out.shape == (2, 31)
    nn = np.arange(taps) - (taps - 1) / 2
    up = np.exp(1j * 2 * np.pi * nn * (500e3 / sr))
    np.testing.assert_allclose(out[1], out[0] * up, atol=1e-5)


def test_filter_taps_validation():
    from cyberether_tpu.core.types import ValidationError
    with pytest.raises(ValidationError):
        TestContext("filter_taps", {"taps": 50}).run()   # even
    with pytest.raises(ValidationError):
        TestContext("filter_taps", {"bandwidth": 3e6,
                                    "sampleRate": 2e6}).run()


# ---------------------------------------------------------------------------
# rrc_filter — streaming FIR
# ---------------------------------------------------------------------------
def test_rrc_filter_matches_lfilter(rng):
    from cyberether_tpu.ops import rrc_taps

    taps = rrc_taps(31, 4.0, 1.0, 0.35)
    x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)
         ).astype(np.complex64)
    ctx = TestContext("rrc_filter", {"taps": 31, "sampleRate": 4.0,
                                     "symbolRate": 1.0, "rollOff": 0.35})
    ctx.set_input("buffer", x)
    out = ctx.run().output("buffer")
    ref = scipy.signal.lfilter(taps, [1.0], x)
    np.testing.assert_allclose(out, ref.astype(np.complex64), atol=1e-4)


def test_rrc_filter_streaming_continuity(rng):
    from cyberether_tpu.ops import rrc_taps

    taps = rrc_taps(31, 4.0, 1.0, 0.35)
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)
         ).astype(np.complex64)
    ctx = TestContext("rrc_filter", {"taps": 31, "sampleRate": 4.0,
                                     "symbolRate": 1.0, "rollOff": 0.35})
    ctx.set_input("buffer", x[:256])
    o1 = ctx.run().output("buffer").copy()
    ctx._inputs["buffer"] = x[256:]
    o2 = ctx.run().output("buffer")
    ref = scipy.signal.lfilter(taps, [1.0], x)
    np.testing.assert_allclose(np.concatenate([o1, o2]),
                               ref.astype(np.complex64), atol=1e-4)


# ---------------------------------------------------------------------------
# overlap_add
# ---------------------------------------------------------------------------
def test_overlap_add_unbatched(rng):
    buf = rng.standard_normal(32).astype(np.float32)
    ovl = rng.standard_normal(8).astype(np.float32)
    ctx = TestContext("overlap_add")
    ctx.set_input("buffer", buf).set_input("overlap", ovl)
    out1 = ctx.run().output("buffer")
    # first cycle: previous overlap = zeros
    np.testing.assert_allclose(out1, buf)
    out2 = ctx.run().output("buffer")
    ref = buf.copy()
    ref[:8] += ovl
    np.testing.assert_allclose(out2, ref, atol=1e-6)


def test_overlap_add_batched(rng):
    buf = rng.standard_normal((3, 16)).astype(np.float32)
    ovl = rng.standard_normal((3, 4)).astype(np.float32)
    ctx = TestContext("overlap_add")
    ctx.set_input("buffer", buf, axes=SignalAxes(batch=0, sample=1))
    ctx.set_input("overlap", ovl, axes=SignalAxes(batch=0, sample=1))
    out = ctx.run().output("buffer")
    ref = buf.copy()
    ref[1, :4] += ovl[0]
    ref[2, :4] += ovl[1]
    np.testing.assert_allclose(out, ref, atol=1e-6)
    out2 = ctx.run().output("buffer")
    ref2 = buf.copy()
    ref2[0, :4] += ovl[2]   # carried state from cycle 1
    ref2[1, :4] += ovl[0]
    ref2[2, :4] += ovl[1]
    np.testing.assert_allclose(out2, ref2, atol=1e-6)


# ---------------------------------------------------------------------------
# fold
# ---------------------------------------------------------------------------
def test_fold_basic_mean(rng):
    x = rng.standard_normal(32).astype(np.float32)
    out = TestContext("fold", {"size": 8, "offset": 0}) \
        .set_input("buffer", x).run().output("buffer")
    ref = x.reshape(4, 8).mean(0)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fold_with_offset(rng):
    x = rng.standard_normal(32).astype(np.float32)
    out = TestContext("fold", {"size": 8, "offset": 3}) \
        .set_input("buffer", x).run().output("buffer")
    ref = np.roll(x, 3).reshape(4, 8).mean(0)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fold_channel_offsets(rng):
    x = rng.standard_normal((2, 32)).astype(np.complex64)
    out = TestContext("fold", {"size": 8}) \
        .set_input("buffer", x,
                   axes=SignalAxes(channel=0, sample=1),
                   attrs={"channelOffsets": [3, 5]}) \
        .run().output("buffer")
    ref = np.stack([np.roll(x[0], 3).reshape(4, 8).mean(0),
                    np.roll(x[1], 5).reshape(4, 8).mean(0)])
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fold_halves_sample_rate(rng):
    x = rng.standard_normal(32).astype(np.float32)
    ctx = TestContext("fold", {"size": 8}) \
        .set_input("buffer", x, attrs={"sampleRate": 32.0})
    assert ctx.output_spec("buffer").attr("sampleRate") == 8.0


# ---------------------------------------------------------------------------
# phase_correction
# ---------------------------------------------------------------------------
def test_phase_correction_batch_progression():
    x = np.ones((3, 4), np.complex64)
    inc = 0.5
    ctx = TestContext("phase_correction", {"phaseIncrement": inc})
    ctx.set_input("signal", x, axes=SignalAxes(batch=0, sample=1))
    out = ctx.run().output("signal")
    for b in range(3):
        np.testing.assert_allclose(out[b], np.exp(1j * inc * b)
                                   * np.ones(4), atol=1e-5)
    out2 = ctx.run().output("signal")
    for b in range(3):
        np.testing.assert_allclose(
            out2[b], np.exp(1j * inc * (3 + b)) * np.ones(4), atol=1e-5)


def test_phase_correction_channel_increments():
    x = np.ones((2, 2, 4), np.complex64)   # (batch, channel, sample)
    ctx = TestContext("phase_correction", {})
    ctx.set_input("signal", x,
                  axes=SignalAxes(batch=0, channel=1, sample=2),
                  attrs={"channelPhaseIncrements": [0.3, -0.7]})
    out = ctx.run().output("signal")
    for c, inc in enumerate([0.3, -0.7]):
        for b in range(2):
            np.testing.assert_allclose(
                out[b, c], np.exp(1j * inc * b) * np.ones(4), atol=1e-5)


# ---------------------------------------------------------------------------
# signal_generator
# ---------------------------------------------------------------------------
def test_signal_generator_cosine_phase_continuity():
    cfg = {"signalType": "cosine", "signalDataType": "CF32",
           "sampleRate": 8000.0, "frequency": 1000.0, "bufferSize": 64}
    ctx = TestContext("signal_generator", cfg)
    a = ctx.run().output("signal").copy()
    b = ctx.run().output("signal")
    full = np.exp(1j * (2 * np.pi * 1000 / 8000 * np.arange(128)))
    np.testing.assert_allclose(np.concatenate([a, b]), full, atol=1e-4)


def test_signal_generator_waveforms():
    for kind in ("sine", "square", "sawtooth", "triangle", "dc"):
        out = TestContext("signal_generator",
                          {"signalType": kind, "bufferSize": 32,
                           "amplitude": 2.0}).run().output("signal")
        assert out.shape == (32,)
        assert np.all(np.abs(out) <= 2.0 + 1e-5)


def test_signal_generator_noise_statistics():
    out = TestContext("signal_generator",
                      {"signalType": "noise", "bufferSize": 65536,
                       "noiseVariance": 4.0}).run().output("signal")
    assert abs(np.std(out) - 2.0) < 0.1


def test_signal_generator_chirp_sweeps():
    sr = 1000.0
    out = TestContext("signal_generator",
                      {"signalType": "chirp", "sampleRate": sr,
                       "chirpStartFreq": 10.0, "chirpEndFreq": 100.0,
                       "chirpDuration": 1.0, "bufferSize": 1000,
                       "signalDataType": "CF32"}).run().output("signal")
    inst_freq = np.diff(np.unwrap(np.angle(out))) * sr / (2 * np.pi)
    assert inst_freq[:50].mean() < 30
    assert inst_freq[-50:].mean() > 70


def test_fft_mxu_provider(rng):
    """provider='mxu' routes through the matmul FFT implementation
    (the reference's per-provider module registry pattern)."""
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)
         ).astype(np.complex64)
    out = TestContext("fft", {"forward": True}, provider="mxu") \
        .set_input("signal", x).run().output("signal")
    np.testing.assert_allclose(out, np.fft.fft(x), atol=2e-2)
    from cyberether_tpu.core.types import ValidationError
    with pytest.raises(ValidationError):
        TestContext("fft", {"forward": False}, provider="mxu") \
            .set_input("signal", x).run()
