"""Provider sweep: every registered (type, provider) implementation of
the swept module types runs through the SAME numeric assertions — the
reference iterates Registry::ListAvailableModules in a DYNAMIC_SECTION
so CPU and CUDA paths share golden values
(/root/reference/src/domains/dsp/fft/module_tests.cc:53-58).

Parametrization is collected FROM the registry, so registering a new
provider automatically enrolls it here; a provider that breaks parity
fails this file without any new test code.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cyberether_tpu import blocks
from cyberether_tpu.core.registry import registry
from cyberether_tpu.core.tensor import SignalAxes
from cyberether_tpu.parallel.mesh import make_mesh
from cyberether_tpu.testing import TestContext

blocks.register_all()

_RNG = np.random.default_rng(7)


def _cf32(shape, seed=0):
    r = np.random.default_rng(seed)
    return (r.standard_normal(shape)
            + 1j * r.standard_normal(shape)).astype(np.complex64)


# ---------------------------------------------------------------------------
# golden definitions per swept type: config, inputs, axes, and an
# expected-output function computed with numpy/reference math
# ---------------------------------------------------------------------------
def _golden_fft(ins):
    return {"signal": np.fft.fft(ins["signal"]).astype(np.complex64)}


def _golden_channelizer(ins):
    from cyberether_tpu.models.channelizer import Channelizer

    model = Channelizer(channels=8, taps_per_branch=4, audio_decim=4,
                        sample_rate=8e5)
    audio, _ = model.jitted_step()(model.init_state(),
                                   jnp.asarray(ins["buffer"]))
    return {"audio": np.asarray(audio)}


def _golden_wbfm(ins):
    from cyberether_tpu.models.wbfm import WbfmReceiver

    rx = WbfmReceiver(fir_impl="conv", fast_atan2=False)
    audio, _ = rx.jitted_step()(rx.init_state(),
                                jnp.asarray(ins["buffer"]))
    return {"audio": np.asarray(audio)}


def _golden_spectrum(ins):
    from cyberether_tpu.models.spectrum import SpectrumPipeline

    pipe = SpectrumPipeline(fft_size=256, batches=8, use_mxu_fft=False,
                            fast_math=False)
    x = (ins["buffer"][..., 0]
         + 1j * ins["buffer"][..., 1]) * np.asarray(pipe._win)
    spec = np.fft.fft(x, axis=-1)
    db = 20.0 * np.log10(np.maximum(np.abs(spec), 1e-30)) \
        + float(pipe._coeff)
    norm = db * float(pipe._scale) + float(pipe._offset)
    return {"spectrum": 0.5 + 0.5 * np.tanh(4.0 * (norm - 0.5))}


SWEEP = {
    "fft": dict(
        config={"forward": True},
        inputs=lambda: {"signal": _cf32(1024)},
        axes={},
        golden=_golden_fft,
        atol=1e-2),
    "channelizer": dict(
        config={"tapsPerBranch": 4, "audioDecim": 4,
                "sampleRate": 8e5},
        inputs=lambda: {
            "buffer": np.random.default_rng(3)
            .standard_normal((512, 8, 2)).astype(np.float32)},
        axes={"buffer": SignalAxes(sample=0, channel=1)},
        golden=_golden_channelizer,
        atol=1e-4),
    "wbfm": dict(
        config={},
        inputs=lambda: {
            "buffer": _wbfm_input()},
        axes={"buffer": SignalAxes(sample=0)},
        golden=_golden_wbfm,
        atol=1e-4),
    "spectrum": dict(
        config={},
        inputs=lambda: {
            "buffer": np.random.default_rng(5)
            .standard_normal((8, 256, 2)).astype(np.float32)},
        axes={"buffer": SignalAxes(batch=0, sample=1)},
        golden=_golden_spectrum,
        atol=2e-3),
}


def _wbfm_input():
    from cyberether_tpu.models.wbfm import WbfmReceiver

    return WbfmReceiver().make_input(5120)


def _registered_pairs():
    out = []
    for k in registry.list_modules():
        if k.type in SWEEP:
            out.append((k.type, k.provider))
    return sorted(set(out))


@pytest.mark.parametrize("mtype,provider", _registered_pairs())
def test_provider_matches_golden(mtype, provider):
    case = SWEEP[mtype]
    ins = case["inputs"]()
    ctx = TestContext(mtype, dict(case["config"]), provider=provider)
    for port, arr in ins.items():
        ctx.set_input(port, arr, axes=case["axes"].get(port))
    ctx.run()
    expected = case["golden"](ins)
    for port, want in expected.items():
        got = ctx.output(port)
        np.testing.assert_allclose(got, want, atol=case["atol"],
                                   rtol=1e-3)


def test_sweep_enrolls_every_provider():
    """Meta: the sweep table names exist in the registry and at least
    two distinct providers are exercised (generic + mxu/pallas)."""
    pairs = _registered_pairs()
    assert len({p for _, p in pairs}) >= 2, pairs
    assert ("fft", "mxu") in pairs
    assert ("channelizer", "pallas") in pairs
    assert ("wbfm", "pallas") in pairs
    assert ("spectrum", "pallas") in pairs


@pytest.mark.parametrize("mesh_shape", [None, (4, 2), (8, 1)])
@pytest.mark.parametrize("provider", sorted(
    {k.provider for k in registry.list_modules() if k.type == "fft"}))
def test_fft_provider_mesh_sweep(provider, mesh_shape):
    """provider x mesh matrix: the same fft graph, each provider,
    single-device and 8-virtual-device sharded."""
    from cyberether_tpu import Flowgraph

    buf = _cf32((8, 256), seed=21)
    fg = Flowgraph()
    try:
        fg.block_create("src", "dti", {"shape": [8, 256],
                                       "dataType": "CF32"})
        fg.records["src"].build.modules["src/m"].attach_buffer(buf)
        fg.block_create("sax", "signal_axes",
                        {"axes": "batch=0,sample=1"},
                        {"buffer": "${graph.src.output.buffer}"})
        fg.block_create("fft", "fft", {},
                        {"signal": "${graph.sax.output.buffer}"},
                        provider=provider)
        if mesh_shape is not None:
            fg.set_mesh(make_mesh(time=mesh_shape[0],
                                  channels=mesh_shape[1]))
        assert fg.compute(timeout=30.0)
        fg.scheduler.synchronize()
        got = fg.scheduler.output("fft.signal")
        np.testing.assert_allclose(got, np.fft.fft(buf, axis=-1),
                                   atol=1e-2, rtol=1e-3)
    finally:
        fg.stop()
