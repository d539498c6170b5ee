"""Fused Pallas pipeline blocks (blocks/fused.py): flowgraph-compiled
graphs must match the hand-built model outputs exactly (same kernels).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cyberether_tpu import Flowgraph
from cyberether_tpu.core.registry import registry
from cyberether_tpu.core.tensor import SignalAxes


def test_fused_providers_registered():
    keys = {(k.type, k.provider) for k in registry.list_modules()}
    assert ("channelizer", "pallas") in keys
    assert ("wbfm", "pallas") in keys
    assert ("spectrum", "pallas") in keys


def test_channelizer_block_matches_model():
    from cyberether_tpu.models.channelizer import Channelizer

    model = Channelizer(channels=8, taps_per_branch=4, audio_decim=4,
                        sample_rate=8e5)
    frames = 1024
    rng = np.random.default_rng(3)
    iq = rng.standard_normal((frames, 8, 2)).astype(np.float32)
    ref, _ = model.step_pallas_v4(model.init_state_v4(),
                                  jnp.asarray(iq), interpret=True)

    fg = Flowgraph()
    fg.block_create("src", "dti", {"shape": [frames, 8, 2],
                                   "dataType": "F32"})
    fg.block_create("chan", "channelizer",
                    {"tapsPerBranch": 4, "audioDecim": 4,
                     "sampleRate": 8e5},
                    {"buffer": "${graph.src.output.buffer}"},
                    provider="pallas")
    try:
        fg.records["src"].build.modules["src/m"].attach_buffer(iq)
        assert fg.compute(timeout=30.0)
        fg.scheduler.synchronize()
        got = np.asarray(fg.scheduler.output("chan.audio"))
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)
    finally:
        fg.stop()


def test_channelizer_block_streaming_state():
    """Two cycles continue the stream (the hist state carries)."""
    from cyberether_tpu.models.channelizer import Channelizer

    model = Channelizer(channels=8, taps_per_branch=4, audio_decim=4,
                        sample_rate=8e5)
    rng = np.random.default_rng(4)
    iq = rng.standard_normal((512, 8, 2)).astype(np.float32)
    full, _ = model.step_pallas_v4(model.init_state_v4(),
                                   jnp.asarray(iq), interpret=True)

    fg = Flowgraph()
    fg.block_create("src", "dti", {"shape": [256, 8, 2],
                                   "dataType": "F32"})
    fg.block_create("chan", "channelizer",
                    {"tapsPerBranch": 4, "audioDecim": 4,
                     "sampleRate": 8e5},
                    {"buffer": "${graph.src.output.buffer}"})
    try:
        src = fg.records["src"].build.modules["src/m"]
        outs = []
        for half in (iq[:256], iq[256:]):
            src.attach_buffer(half)
            assert fg.compute(timeout=30.0)
            fg.scheduler.synchronize()
            outs.append(np.asarray(fg.scheduler.output("chan.audio")))
        np.testing.assert_allclose(np.concatenate(outs),
                                   np.asarray(full), atol=1e-5)
    finally:
        fg.stop()


def test_wbfm_block_matches_model():
    from cyberether_tpu.models.wbfm import WbfmReceiver

    rx = WbfmReceiver()
    n = 5120
    iq = rx.make_input(n)
    ref, _ = rx.step_pallas(rx.init_state(), jnp.asarray(iq),
                            interpret=True)

    fg = Flowgraph()
    fg.block_create("src", "dti", {"shape": [n, 2], "dataType": "F32"})
    fg.block_create("rx", "wbfm", {},
                    {"buffer": "${graph.src.output.buffer}"})
    try:
        fg.records["src"].build.modules["src/m"].attach_buffer(iq)
        assert fg.compute(timeout=30.0)
        fg.scheduler.synchronize()
        got = np.asarray(fg.scheduler.output("rx.audio"))
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)
    finally:
        fg.stop()


def test_spectrum_block_matches_model():
    from cyberether_tpu.models.spectrum import SpectrumPipeline

    pipe = SpectrumPipeline(fft_size=256, batches=8)
    iq = pipe.make_input()
    # auto now resolves to the CT kernel (hardware-validated round 3
    # as both fastest and most accurate); dft pins the full-DFT
    # kernel — each must match its model path exactly
    for algo, ref in (
            ("ct", pipe.step_pallas_ct(jnp.asarray(iq),
                                       interpret=True)),
            ("auto", pipe.step_pallas_ct(jnp.asarray(iq),
                                         interpret=True)),
            ("dft", pipe.step_pallas(jnp.asarray(iq), interpret=True))):
        fg = Flowgraph()
        fg.block_create("src", "dti", {"shape": [8, 256, 2],
                                       "dataType": "F32"})
        fg.block_create("spec", "spectrum", {"algorithm": algo},
                        {"buffer": "${graph.src.output.buffer}"})
        try:
            fg.records["src"].build.modules["src/m"].attach_buffer(iq)
            assert fg.compute(timeout=30.0)
            fg.scheduler.synchronize()
            got = np.asarray(fg.scheduler.output("spec.spectrum"))
            np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)
        finally:
            fg.stop()


def test_channelizer_block_complex_input():
    """CF32 input crosses the boundary codec and splits in-graph."""
    from cyberether_tpu.models.channelizer import Channelizer

    model = Channelizer(channels=8, taps_per_branch=4, audio_decim=4,
                        sample_rate=8e5)
    rng = np.random.default_rng(5)
    iq = rng.standard_normal((256, 8, 2)).astype(np.float32)
    ref, _ = model.step_pallas_v4(model.init_state_v4(),
                                  jnp.asarray(iq), interpret=True)

    fg = Flowgraph()
    fg.block_create("src", "dti", {"shape": [256, 8],
                                   "dataType": "CF32"})
    fg.block_create("chan", "channelizer",
                    {"tapsPerBranch": 4, "audioDecim": 4,
                     "sampleRate": 8e5},
                    {"buffer": "${graph.src.output.buffer}"})
    try:
        cx = (iq[..., 0] + 1j * iq[..., 1]).astype(np.complex64)
        fg.records["src"].build.modules["src/m"].attach_buffer(cx)
        assert fg.compute(timeout=30.0)
        fg.scheduler.synchronize()
        got = np.asarray(fg.scheduler.output("chan.audio"))
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)
    finally:
        fg.stop()


def test_spectrum_precision_tiers():
    """The ct path's three measured precision tiers are reachable from
    block config: exact/accurate/display all run; exact == the default
    non-bf16 output; accurate sits between exact and display."""
    import numpy as np

    from cyberether_tpu.testing import TestContext

    rng = np.random.default_rng(0)
    iq = rng.standard_normal((16, 1024, 2)).astype(np.float32)
    outs = {}
    for prec in ("exact", "accurate", "display"):
        ctx = TestContext("spectrum", {"precision": prec},
                          provider="pallas")
        ctx.set_input("buffer", iq,
                      axes=SignalAxes(batch=0, sample=1))
        ctx.run()
        outs[prec] = np.asarray(ctx.output("spectrum"))
    ctx = TestContext("spectrum", {}, provider="pallas")
    ctx.set_input("buffer", iq, axes=SignalAxes(batch=0, sample=1))
    ctx.run()
    default = np.asarray(ctx.output("spectrum"))
    np.testing.assert_allclose(outs["exact"], default, atol=1e-6)
    # interpret-mode matmuls are true f32, so tiers only differ by the
    # split arithmetic — accurate must stay near exact
    assert np.abs(outs["accurate"] - outs["exact"]).max() < 1e-3
    import pytest

    from cyberether_tpu.core.types import ValidationError

    ctx = TestContext("spectrum", {"precision": "wrong"},
                      provider="pallas")
    ctx.set_input("buffer", iq, axes=SignalAxes(batch=0, sample=1))
    with pytest.raises(ValidationError, match="precision"):
        ctx.run()
