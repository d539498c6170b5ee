"""End-to-end flowgraph pipelines from YAML (BASELINE.md measured
configs, CPU execution): the minimum end-to-end slice of SURVEY.md §7
build order step 2 and friends.
"""

import os

import numpy as np
import pytest

from cyberether_tpu.core.flowgraph import Flowgraph
from cyberether_tpu.core.types import BlockState


@pytest.fixture
def iq_file(tmp_path):
    """Recorded capture: strong tone at fs/8 + weak noise."""
    n = 1 << 16
    t = np.arange(n)
    x = np.exp(2j * np.pi * t / 8).astype(np.complex64)
    x += 0.001 * (np.random.default_rng(0).standard_normal(n)
                  + 1j * np.random.default_rng(1).standard_normal(n)
                  ).astype(np.complex64)
    path = str(tmp_path / "capture.iq")
    x.tofile(path)
    return path


SPECTRUM_YAML = """
version: 2
title: file spectrum
graph:
  - name: src
    module: file_reader
    config: {{filepath: "{path}", batchSize: 2048, dataType: CF32}}
  - name: win
    module: window
    config: {{size: 2048}}
  - name: inv
    module: invert
    input: {{signal: '${{graph.win.output.window}}'}}
  - name: mul
    module: multiply
    input:
      a: '${{graph.src.output.signal}}'
      b: '${{graph.inv.output.signal}}'
  - name: fft
    module: fft
    config: {{forward: true}}
    input: {{signal: '${{graph.mul.output.product}}'}}
  - name: amp
    module: amplitude
    input: {{signal: '${{graph.fft.output.signal}}'}}
  - name: rng
    module: range
    config: {{min: -100, max: 0}}
    input: {{signal: '${{graph.amp.output.signal}}'}}
  - name: wtf
    module: waterfall
    config: {{height: 64}}
    input: {{signal: '${{graph.rng.output.signal}}'}}
"""


def test_file_spectrum_pipeline(iq_file):
    fg = Flowgraph.from_yaml(SPECTRUM_YAML.format(path=iq_file))
    assert all(fg.block_state(n) == BlockState.COMPLETE
               for n in fg.records), \
        {n: fg.block_error(n) for n in fg.records}
    try:
        fg.scheduler.watch("rng.signal")   # probed mid-segment value
        for _ in range(4):
            assert fg.compute(timeout=5.0)
        out = fg.scheduler.output("rng.signal")
        assert out is not None and out.shape == (2048,)
        # tone at fs/8 -> bin 256; invert shifts DC to center (bin 1024)
        # so the peak lands at 1024 + 256 = 1280
        assert np.argmax(out) == 1280
        frames = fg.present()
        assert "wtf" in frames
        assert frames["wtf"]["frame"].shape == (64, 2048, 4)
    finally:
        fg.stop()


FM_YAML = """
version: 2
graph:
  - name: src
    module: file_reader
    config: {{filepath: "{path}", batchSize: 8000, dataType: CF32}}
  - name: fm
    module: fm
    config: {{sampleRate: 240000}}
    input: {{signal: '${{graph.src.output.signal}}'}}
"""


def test_file_fm_pipeline(tmp_path):
    sr = 240e3
    n = 1 << 16
    t = np.arange(n) / sr
    msg = np.sin(2 * np.pi * 1e3 * t)
    phase = 2 * np.pi * 100e3 * np.cumsum(msg) / sr
    x = np.exp(1j * phase).astype(np.complex64)
    path = str(tmp_path / "fm.iq")
    x.tofile(path)
    fg = Flowgraph.from_yaml(FM_YAML.format(path=path))
    try:
        assert fg.compute(timeout=5.0)
        out = fg.scheduler.output("fm.signal")
        assert out is not None
        np.testing.assert_allclose(out[1:], msg[1:8000], atol=0.02)
    finally:
        fg.stop()


def test_filter_engine_yaml_pipeline(tmp_path, rng):
    """filter block + filter_engine wired via YAML (resampler path)."""
    n = 8000
    x = (rng.standard_normal(4 * n) + 1j * rng.standard_normal(4 * n)
         ).astype(np.complex64)
    path = str(tmp_path / "wide.iq")
    x.tofile(path)
    yaml_text = f"""
version: 2
graph:
  - name: src
    module: file_reader
    config: {{filepath: "{path}", batchSize: {n}, dataType: CF32}}
  - name: flt
    module: filter_taps
    config: {{sampleRate: 2000000, bandwidth: 500000,
              center: '[0]', taps: 65}}
  - name: engine
    module: filter_engine
    input:
      signal: '${{graph.src.output.signal}}'
      filter: '${{graph.flt.output.coeffs}}'
"""
    fg = Flowgraph.from_yaml(yaml_text)
    assert fg.block_state("engine") == BlockState.COMPLETE, \
        fg.block_error("engine")
    try:
        outs = []
        for _ in range(3):
            assert fg.compute(timeout=5.0)
            outs.append(fg.scheduler.output("engine.buffer").copy())
        # ratio 4 resampler: output blocks are n/4 long; the (heads=1)
        # filter adds a channel axis (reference multi-head semantics)
        assert outs[0].shape == (1, (n + 64) // 4 - 16)
        outs = [o[0] for o in outs]
        import scipy.signal

        from cyberether_tpu.ops import windowed_sinc_bandpass

        taps = windowed_sinc_bandpass(65, 2e6, 5e5, [0.0])[0]
        full = scipy.signal.lfilter(taps, [1.0], x[:3 * n])
        ref = full[::4]
        got = np.concatenate(outs)
        np.testing.assert_allclose(got, ref[:len(got)].astype(np.complex64),
                                   atol=5e-3)
    finally:
        fg.stop()


def test_squelch_gates_sink(tmp_path):
    """SKIP propagation through a compiled graph: quiet input ->
    file_writer receives nothing."""
    n = 4096
    quiet = (0.001 * np.ones(4 * n)).astype(np.complex64)
    src = str(tmp_path / "quiet.iq")
    quiet.tofile(src)
    dst = str(tmp_path / "out.iq")
    yaml_text = f"""
version: 2
graph:
  - name: src
    module: file_reader
    config: {{filepath: "{src}", batchSize: {n}, dataType: CF32}}
  - name: sq
    module: squelch
    config: {{threshold: 0.5}}
    input: {{signal: '${{graph.src.output.signal}}'}}
  - name: out
    module: file_writer
    config: {{filepath: "{dst}", recording: true, overwrite: true}}
    input: {{buffer: '${{graph.sq.output.signal}}'}}
"""
    fg = Flowgraph.from_yaml(yaml_text)
    try:
        for _ in range(3):
            assert fg.compute(timeout=5.0)
        met = fg.scheduler.metrics()
        assert met["sq/m"]["passing"] == False  # noqa: E712
    finally:
        fg.stop()
    assert not os.path.exists(dst) or os.path.getsize(dst) == 0
