"""Pallas kernel correctness vs the XLA reference path (interpret mode
on the CPU mesh; the TPU path compiles the same kernel via Mosaic)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cyberether_tpu.models.channelizer import Channelizer


def test_channelize_demod_kernel_matches_xla_path():
    model = Channelizer(channels=8, taps_per_branch=4, audio_decim=4,
                        sample_rate=8e5)
    frames = 256
    iq = model.make_input(frames, seed=3)
    ref_audio, ref_state = model.jitted_step()(model.init_state(),
                                               jnp.asarray(iq))
    got_audio, got_state = model.step_pallas(model.init_state(),
                                             jnp.asarray(iq),
                                             interpret=True)
    # atan2(~0, ~0) of pre-signal noise may legitimately disagree at a
    # few isolated samples; judge by the 99.9th percentile
    diff = np.abs(np.asarray(got_audio) - np.asarray(ref_audio))
    assert np.quantile(diff, 0.999) < 1e-4
    assert np.median(diff) < 1e-6
    np.testing.assert_allclose(np.asarray(got_state["prev"]),
                               np.asarray(ref_state["prev"]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_state["hist"]),
                               np.asarray(ref_state["hist"]),
                               atol=1e-6)


def test_channelize_demod_kernel_streaming_state():
    model = Channelizer(channels=8, taps_per_branch=4, audio_decim=2,
                        sample_rate=8e5)
    iq = model.make_input(512, seed=4)
    full, _ = model.step_pallas(model.init_state(), jnp.asarray(iq),
                                interpret=True)
    st = model.init_state()
    a1, st = model.step_pallas(st, jnp.asarray(iq[:256]),
                               interpret=True)
    a2, st = model.step_pallas(st, jnp.asarray(iq[256:]),
                               interpret=True)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(a1), np.asarray(a2)]),
        np.asarray(full), atol=1e-4)


def test_kernel_multi_tile_carry():
    """More than one grid step: the lag carry crosses tile boundaries."""
    model = Channelizer(channels=8, taps_per_branch=4, audio_decim=4,
                        sample_rate=8e5)
    frames = 2048   # tile_m=512 -> 4 grid steps
    iq = model.make_input(frames, seed=5)
    ref, _ = model.jitted_step()(model.init_state(), jnp.asarray(iq))
    got, _ = model.step_pallas(model.init_state(), jnp.asarray(iq),
                               interpret=True)
    diff = np.abs(np.asarray(got) - np.asarray(ref))
    assert np.quantile(diff, 0.999) < 1e-4
    assert np.median(diff) < 1e-6
