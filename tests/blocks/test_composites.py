"""Composite block tests: spectrum_engine, decimator, filter_engine.

filter_engine correctness bar: streaming overlap-add output must equal
direct time-domain convolution of the whole stream (the reference's
own construction guarantees this; tolerances per module_tests.cc).
"""

import numpy as np
import pytest
import scipy.signal

from cyberether_tpu.core.tensor import SignalAxes
from cyberether_tpu.core.types import ValidationError
from cyberether_tpu.testing import BlockTestContext


def test_spectrum_engine_basic(rng):
    n = 256
    k = 32
    x = np.exp(2j * np.pi * k * np.arange(n) / n).astype(np.complex64)
    ctx = BlockTestContext("spectrum_engine")
    ctx.set_input("buffer", x)
    out = ctx.run().output("buffer")
    assert out.shape == (n,)
    # energy concentrates at the fftshift-ed tone bin: the engine
    # multiplies by an inverted (fftshift) window, so bin k+n/2
    peak = np.argmax(out)
    assert peak == (k + n // 2) % n


def test_spectrum_engine_scale_range(rng):
    x = (rng.standard_normal(128) + 1j * rng.standard_normal(128)
         ).astype(np.complex64)
    ctx = BlockTestContext("spectrum_engine",
                           {"enableAgc": True, "enableScale": True,
                            "rangeMin": -100, "rangeMax": 0})
    ctx.set_input("buffer", x)
    out = ctx.run().output("buffer")
    assert np.all(out >= 0.0) and np.all(out <= 1.0)


def test_decimator(rng):
    x = rng.standard_normal((2, 32)).astype(np.float32)
    ctx = BlockTestContext("decimator", {"ratio": 4})
    ctx.set_input("buffer", x, axes=SignalAxes(batch=0, sample=1))
    out = ctx.run().output("buffer")
    ref = x.reshape(2, 8, 4).sum(-1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_decimator_bad_ratio(rng):
    x = np.zeros((2, 30), np.float32)
    ctx = BlockTestContext("decimator", {"ratio": 4})
    ctx.set_input("buffer", x, axes=SignalAxes(batch=0, sample=1))
    with pytest.raises(ValidationError):
        ctx.run()


def test_filter_block_full_chain(rng):
    """The all-in-one filter block: taps designer + engine, with the
    integer-ratio resampler kicking in (2 MHz / 200 kHz = 10)."""
    n = 8000
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    ctx = BlockTestContext("filter", {"sampleRate": 2e6,
                                      "bandwidth": 200e3,
                                      "center": [0.0], "taps": 51})
    ctx.set_input("signal", x)
    out = ctx.run().output("buffer")
    # combined = 8050, ratio 10 -> 805 samples, minus pad 5 -> 800
    assert out.shape == (1, 800)
    spec = ctx.output_spec("coeffs")
    assert spec.attr("sampleRate") == 2e6
    assert spec.attr("bandwidth") == 200e3
    assert ctx.output_spec("buffer").attr("sampleRate") == 2e5
    # decimated output matches filter + take-every-10th
    import scipy.signal

    from cyberether_tpu.ops import windowed_sinc_bandpass

    taps = windowed_sinc_bandpass(51, 2e6, 200e3, [0.0])[0]
    ref = scipy.signal.lfilter(taps, [1.0], x)[::10]
    np.testing.assert_allclose(out[0], ref.astype(np.complex64),
                               atol=5e-3)


def test_multi_fm_style_graph(rng):
    """The reference's multi-fm demo shape: 2-head filter at +/-400 kHz
    -> slice one head -> FM demod (examples/flowgraphs/multi-fm.yml)."""
    from cyberether_tpu.core.flowgraph import Flowgraph
    from cyberether_tpu.core.types import BlockState

    n = 8000
    sr = 2e6
    t = np.arange(4 * n) / sr
    msg = np.sin(2 * np.pi * 1e3 * t)
    phase = 2 * np.pi * (400e3 * t + 75e3 * np.cumsum(msg) / sr)
    x = (np.exp(1j * phase)).astype(np.complex64)
    fg = Flowgraph()
    try:
        fg.block_create("src", "dti", {"shape": [n],
                                       "dataType": "CF32"})
        dti = fg.records["src"].build.modules["src/m"]
        fg.block_create("flt", "filter", {
            "sampleRate": sr, "bandwidth": 200e3,
            "center": [400e3, -400e3], "taps": 51},
            {"signal": "${graph.src.output.buffer}"})
        fg.block_create("sl", "slice", {"slice": "[0, :]"},
                        {"buffer": "${graph.flt.output.buffer}"})
        fg.block_create("sax", "signal_axes", {"axes": "sample=0"},
                        {"buffer": "${graph.sl.output.buffer}"})
        fg.block_create("fm", "fm", {"sampleRate": 200e3},
                        {"signal": "${graph.sax.output.buffer}"})
        assert all(fg.block_state(b) == BlockState.COMPLETE
                   for b in fg.records), \
            {b: fg.block_error(b) for b in fg.records}
        outs = []
        for i in range(4):
            dti.attach_buffer(x[i * n:(i + 1) * n])
            assert fg.compute(timeout=5.0)
            outs.append(fg.scheduler.output("fm.signal").copy())
        audio = np.concatenate(outs)[100:]
        # demodulated audio carries the 1 kHz message at 200 kHz rate
        spec = np.abs(np.fft.rfft(audio - audio.mean()))
        freqs = np.fft.rfftfreq(len(audio), 1 / 200e3)
        peak = freqs[np.argmax(spec)]
        assert abs(peak - 1000.0) < 100.0
    finally:
        fg.stop()


# ---------------------------------------------------------------------------
# filter_engine
# ---------------------------------------------------------------------------
def _design_taps(sr, bw, centers, taps):
    from cyberether_tpu.ops import windowed_sinc_bandpass

    return windowed_sinc_bandpass(taps, sr, bw, centers)


def test_filter_engine_no_resample_matches_direct_convolution(rng):
    """No attributes on the filter -> plain overlap-add FIR."""
    n, taps_n, blocks = 200, 51, 4
    taps = _design_taps(2e6, 200e3, [0.0], taps_n)[0]
    stream = (rng.standard_normal(n * blocks)
              + 1j * rng.standard_normal(n * blocks)).astype(np.complex64)
    ctx = BlockTestContext("filter_engine")
    outs = []
    for b in range(blocks):
        ctx._inputs["signal"] = stream[b * n:(b + 1) * n]
        if b == 0:
            ctx.set_input("signal", stream[:n])
            ctx.set_input("filter", taps,
                          axes=SignalAxes(sample=0))
        ctx.run()
        outs.append(ctx.output("buffer").copy())
    got = np.concatenate(outs)
    ref = scipy.signal.lfilter(taps, [1.0], stream)
    np.testing.assert_allclose(got, ref.astype(np.complex64), atol=2e-3)


def test_filter_engine_multi_head(rng):
    n, taps_n = 128, 31
    taps2 = _design_taps(2e6, 200e3, [0.0, 300e3], taps_n)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    ctx = BlockTestContext("filter_engine")
    ctx.set_input("signal", x)
    ctx.set_input("filter", taps2,
                  axes=SignalAxes(channel=0, sample=1))
    out = ctx.run().output("buffer")
    assert out.shape == (2, n)
    for h in range(2):
        ref = scipy.signal.lfilter(taps2[h], [1.0], x)
        np.testing.assert_allclose(out[h], ref.astype(np.complex64),
                                   atol=2e-3)


def test_filter_engine_resampler_decimates(rng):
    """With sampleRate/bandwidth attributes at integer ratio, the fold
    path decimates by that ratio and halves... -> ratio 4 here."""
    sr, bw = 2e6, 500e3   # ratio 4
    n, taps_n = 255, 65   # combined = 255+64 = 319? must divide ratio
    # choose n so that (n + taps-1) % 4 == 0 and (taps-1) % 4 == 0
    n = 256 - 64 + 192    # 384; combined = 384+64 = 448; 448%4==0
    taps = _design_taps(sr, bw, [0.0], taps_n)[0]
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    ctx = BlockTestContext("filter_engine")
    ctx.set_input("signal", x)
    ctx.set_input("filter", taps, axes=SignalAxes(sample=0),
                  attrs={"sampleRate": sr, "bandwidth": bw,
                         "center": 0.0})
    out = ctx.run().output("buffer")
    ratio = 4
    assert out.shape == (n // ratio,)
    spec = ctx.output_spec("buffer")
    assert spec.attr("sampleRate") == sr / ratio
    # folding the spectrum = aliasing = decimation of the filtered
    # signal: compare against direct filter + take-every-4th.
    # The first block's outputs: filtered stream decimated by ratio.
    full = scipy.signal.lfilter(taps, [1.0], x)
    np.testing.assert_allclose(out, full[::ratio].astype(np.complex64),
                               atol=5e-3)


def test_filter_engine_resampler_offcenter_phase(rng):
    """Off-center head: fold offset shifts the band to baseband and
    phase correction keeps blocks continuous."""
    sr, bw = 2e6, 500e3
    taps_n = 65
    n = 384
    center = 500e3
    taps = _design_taps(sr, bw, [center], taps_n)[0]
    blocks = 3
    stream = (rng.standard_normal(n * blocks)
              + 1j * rng.standard_normal(n * blocks)).astype(np.complex64)
    ctx = BlockTestContext("filter_engine")
    ctx.set_input("signal", stream[:n])
    ctx.set_input("filter", taps, axes=SignalAxes(sample=0),
                  attrs={"sampleRate": sr, "bandwidth": bw,
                         "center": center})
    outs = []
    for b in range(blocks):
        ctx._inputs["signal"] = stream[b * n:(b + 1) * n]
        ctx.run()
        outs.append(ctx.output("buffer").copy())
    got = np.concatenate(outs)
    ratio = 4
    # reference: filter, downconvert by the rounded bin offset, decimate
    combined = n + taps_n - 1
    offset_bins = round(center / (sr / combined))
    full = scipy.signal.lfilter(taps, [1.0], stream)
    shift = np.exp(-2j * np.pi * offset_bins *
                   np.arange(len(full)) / combined)
    ref = (full * shift)[::ratio]
    np.testing.assert_allclose(got, ref.astype(np.complex64), atol=1e-2)
