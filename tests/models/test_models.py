"""Flagship model tests: numeric correctness + sharding equivalence.

The sharded runs execute on the 8-device virtual CPU mesh (conftest)
and must match the single-device results — the test the reference
never had (SURVEY.md §4 implication e).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cyberether_tpu.models.channelizer import Channelizer
from cyberether_tpu.models.spectrum import SpectrumPipeline
from cyberether_tpu.models.wbfm import WbfmReceiver
from cyberether_tpu.parallel.mesh import make_mesh


def test_channelizer_recovers_fm_tone():
    model = Channelizer(channels=16, taps_per_branch=8, audio_decim=4,
                        sample_rate=16e5, deviation=10e3)
    frames = 4096
    C = model.channels
    chan_rate = model.sample_rate / C
    # put an FM carrier in channel 5 (relative to DC ordering)
    n = frames * C
    t = np.arange(n) / model.sample_rate
    msg = np.sin(2 * np.pi * 200.0 * t)
    fc = 5 * chan_rate
    phase = 2 * np.pi * (fc * t + model.deviation
                         * np.cumsum(msg) / model.sample_rate)
    x = np.exp(1j * phase).astype(np.complex64)
    iq = np.stack([x.reshape(frames, C).real,
                   x.reshape(frames, C).imag], -1).astype(np.float32)
    audio, _ = model.jitted_step()(model.init_state(), jnp.asarray(iq))
    audio = np.asarray(audio)
    # the demodulated audio in channel 5 tracks the message (note: FM
    # demod of *empty* channels produces loud phase noise, so signal
    # presence is judged by correlation, not raw power)
    dec = msg.reshape(frames, C)[:, 0].reshape(-1, model.audio_decim) \
        .mean(-1)
    a = audio[:, 5] - audio[:, 5].mean()
    b = dec - dec.mean()
    corr = np.abs(np.dot(a[10:], b[10:])
                  / (np.linalg.norm(a[10:]) * np.linalg.norm(b[10:])))
    assert corr > 0.95
    # and its amplitude matches the modulation index scaling (skip the
    # filter-warmup transient)
    assert 0.5 < np.max(np.abs(a[10:])) < 2.0


def test_channelizer_streaming_continuity():
    model = Channelizer(channels=8, taps_per_branch=4, audio_decim=2,
                        sample_rate=8e5)
    iq = model.make_input(1024, seed=1)
    step = model.jitted_step()
    full, _ = step(model.init_state(), jnp.asarray(iq))
    st = model.init_state()
    a1, st = step(st, jnp.asarray(iq[:512]))
    a2, st = step(st, jnp.asarray(iq[512:]))
    np.testing.assert_allclose(np.concatenate([a1, a2]),
                               np.asarray(full), atol=1e-4)


def test_channelizer_sharded_matches_single_device():
    model = Channelizer(channels=8, taps_per_branch=4, audio_decim=4,
                        sample_rate=8e5)
    frames = 512
    iq = model.make_input(frames, seed=2)
    ref, _ = model.jitted_step()(model.init_state(), jnp.asarray(iq))
    mesh = make_mesh(time=4, channels=2)
    step = model.sharded_step(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(model.init_state(),
                           jax.tree_util.tree_map(
                               lambda _: NamedSharding(mesh, P()),
                               model.init_state()))
    iq_s = jax.device_put(iq, NamedSharding(mesh, P("time", None, None)))
    out, _ = step(state, iq_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


def test_channelizer_sharded_pallas_matches_single_device():
    """Time-sharded fused kernel (v3 + ppermute halo) == XLA step."""
    model = Channelizer(channels=8, taps_per_branch=4, audio_decim=4,
                        sample_rate=8e5)
    frames = 1024
    iq = model.make_input(frames, seed=6)
    ref, _ = model.jitted_step()(model.init_state(), jnp.asarray(iq))
    mesh = make_mesh(time=4, channels=2)
    step = model.sharded_step_pallas(mesh, tile_m=128, interpret=True)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(
        model.init_state_v4(),
        NamedSharding(mesh, P()))
    iq_s = jax.device_put(iq, NamedSharding(mesh,
                                            P("time", None, None)))
    out, st = step(state, iq_s)
    # 5e-4: the production fast3 atan (~1.3e-4 worst case) vs the
    # exact-atan XLA reference; demod reference tolerance is 1e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4)
    # streaming continuity across sharded steps: two sharded steps ==
    # one single-device run over the concatenated stream
    iq2 = model.make_input(frames, seed=7)
    ref_all, _ = model.jitted_step()(
        model.init_state(),
        jnp.asarray(np.concatenate([iq, iq2], axis=0)))
    iq2_s = jax.device_put(iq2, NamedSharding(mesh,
                                              P("time", None, None)))
    out2, _ = step(st, iq2_s)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(out), np.asarray(out2)]),
        np.asarray(ref_all), atol=5e-4)


def test_wbfm_recovers_tone():
    rx = WbfmReceiver(sample_rate=2e6, audio_decim=40)
    n = 40 * 2048
    iq = rx.make_input(n)
    audio, _ = rx.jitted_step()(rx.init_state(), jnp.asarray(iq))
    audio = np.asarray(audio)
    # expect a strong 1 kHz tone in the audio (50 kHz audio rate)
    spec = np.abs(np.fft.rfft(audio - audio.mean()))
    freqs = np.fft.rfftfreq(len(audio), 1.0 / (2e6 / 40))
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 1000.0) < 50.0


def test_spectrum_pipeline_peak_bin():
    pipe = SpectrumPipeline(fft_size=256, batches=2)
    rng = np.random.default_rng(0)
    k = 32
    x = np.exp(2j * np.pi * k * np.arange(256) / 256)[None, :] \
        * np.ones((2, 1))
    iq = np.stack([x.real, x.imag], -1).astype(np.float32)
    out = np.asarray(pipe.jitted_step()(jnp.asarray(iq)))
    assert out.shape == (2, 256)
    # window includes the (-1)^n fftshift: peak lands at k + N/2
    assert np.argmax(out[0]) == (k + 128) % 256


def test_halo_overlap_save_sharded_matches_lfilter():
    import scipy.signal

    from cyberether_tpu.parallel.halo import overlap_save_sharded

    mesh = make_mesh(time=8, channels=1)
    taps = (np.hamming(17) / np.hamming(17).sum()).astype(np.complex64)
    rng = np.random.default_rng(5)
    blocks, n = 8, 256
    x = (rng.standard_normal((blocks, n))
         + 1j * rng.standard_normal((blocks, n))).astype(np.complex64)
    carry = np.zeros(16, np.complex64)
    fn = jax.jit(overlap_save_sharded(mesh, jnp.asarray(taps)))
    y, new_carry = fn(jnp.asarray(x), jnp.asarray(carry))
    ref = scipy.signal.lfilter(taps, [1.0], x.reshape(-1)) \
        .reshape(blocks, n)
    np.testing.assert_allclose(np.asarray(y), ref.astype(np.complex64),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_carry),
                               x.reshape(-1)[-16:], atol=1e-6)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_fir_matmul_matches_lfilter():
    import scipy.signal

    from cyberether_tpu.ops.firs import fir_matmul_streaming

    rng = np.random.default_rng(7)
    taps = (np.hamming(129) / np.hamming(129).sum()).astype(np.float32)
    x = (rng.standard_normal((2, 1024))).astype(np.float32)
    hist = np.zeros((2, 128), np.float32)
    y, new_hist = fir_matmul_streaming(jnp.asarray(x),
                                       jnp.asarray(taps),
                                       jnp.asarray(hist))
    ref = scipy.signal.lfilter(taps, [1.0], x, axis=-1)
    np.testing.assert_allclose(np.asarray(y), ref.astype(np.float32),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(new_hist), x[:, -128:])
    # streaming continuity
    y2, _ = fir_matmul_streaming(jnp.asarray(x), jnp.asarray(taps),
                                 jnp.asarray(new_hist))
    ref2 = scipy.signal.lfilter(taps, [1.0],
                                np.concatenate([x, x], -1),
                                axis=-1)[:, 1024:]
    np.testing.assert_allclose(np.asarray(y2), ref2.astype(np.float32),
                               atol=1e-4)


def test_fir_fft_matches_lfilter():
    import scipy.signal

    from cyberether_tpu.ops.firs import fir_fft_streaming

    rng = np.random.default_rng(9)
    taps = (np.hamming(129) / np.hamming(129).sum()).astype(np.float32)
    x = rng.standard_normal((2, 5000)).astype(np.float32)
    hist = np.zeros((2, 128), np.float32)
    y, nh = fir_fft_streaming(jnp.asarray(x), jnp.asarray(taps),
                              jnp.asarray(hist), fft_size=1024)
    ref = scipy.signal.lfilter(taps, [1.0], x, axis=-1)
    np.testing.assert_allclose(np.asarray(y), ref.astype(np.float32),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(nh), x[:, -128:])
    # streaming continuity across the block boundary
    y2, _ = fir_fft_streaming(jnp.asarray(x), jnp.asarray(taps),
                              jnp.asarray(nh), fft_size=1024)
    ref2 = scipy.signal.lfilter(taps, [1.0],
                                np.concatenate([x, x], -1),
                                axis=-1)[:, 5000:]
    np.testing.assert_allclose(np.asarray(y2), ref2.astype(np.float32),
                               atol=1e-4)


def test_wbfm_fir_impls_agree():
    from cyberether_tpu.models.wbfm import WbfmReceiver

    n = 40 * 2048
    base = WbfmReceiver(fir_impl="conv", fast_atan2=False)
    iq = base.make_input(n)
    ref, _ = base.jitted_step()(base.init_state(), jnp.asarray(iq))
    # skip the FIR warm-up audio samples: with zero history the first
    # filtered outputs have ~1e-20 magnitude and atan2's branch flips
    # on rounding noise (a 2*pi jump either way is equally "correct")
    warm = -(-base.taps // base.audio_decim)
    for impl, fast in (("fft", False), ("fft", True),
                       ("matmul", False)):
        rx = WbfmReceiver(fir_impl=impl, fast_atan2=fast)
        out, _ = rx.jitted_step()(rx.init_state(), jnp.asarray(iq))
        np.testing.assert_allclose(np.asarray(out)[warm:],
                                   np.asarray(ref)[warm:], atol=1e-4)


def test_spectrum_mxu_matches_xla_path():
    rng = np.random.default_rng(8)
    iq = rng.standard_normal((4, 2048, 2)).astype(np.float32)
    a = np.asarray(SpectrumPipeline(batches=4, use_mxu_fft=False,
                                    fast_math=False)
                   .jitted_step()(jnp.asarray(iq)))
    b = np.asarray(SpectrumPipeline(batches=4, use_mxu_fft=True,
                                    fast_math=False)
                   .jitted_step()(jnp.asarray(iq)))
    np.testing.assert_allclose(a, b, atol=1e-3)
    # fast-math variant stays within display tolerance of exact
    c = np.asarray(SpectrumPipeline(batches=4, use_mxu_fft=True,
                                    fast_math=True)
                   .jitted_step()(jnp.asarray(iq)))
    np.testing.assert_allclose(c, b, atol=5e-3)


def test_mxu_fft_matches_numpy():
    from cyberether_tpu.ops.mxu_fft import fft_mxu

    rng = np.random.default_rng(9)
    for n in (256, 2048, 8192):
        x = (rng.standard_normal((3, n))
             + 1j * rng.standard_normal((3, n))).astype(np.complex64)
        got = np.asarray(fft_mxu(jnp.asarray(x)))
        ref = np.fft.fft(x, axis=-1)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_fir_matmul_nondivisible_length():
    import scipy.signal

    from cyberether_tpu.ops.firs import fir_matmul_streaming

    rng = np.random.default_rng(10)
    taps = (np.hamming(33) / np.hamming(33).sum()).astype(np.float32)
    x = rng.standard_normal((1, 200)).astype(np.float32)   # 200 % 128 != 0
    hist = np.zeros((1, 32), np.float32)
    y, nh = fir_matmul_streaming(jnp.asarray(x), jnp.asarray(taps),
                                 jnp.asarray(hist))
    ref = scipy.signal.lfilter(taps, [1.0], x, axis=-1)
    np.testing.assert_allclose(np.asarray(y), ref.astype(np.float32),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(nh), x[:, -32:])
