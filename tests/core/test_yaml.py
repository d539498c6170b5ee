"""YAML flowgraph import/export + v1->v2 migration tests
(reference tests/core/serialization/yaml.cc, flowgraph.cc:309/1253/1523).
"""

import numpy as np
import pytest

from cyberether_tpu.core.flowgraph import Flowgraph
from cyberether_tpu.core.types import BlockState, GraphError
from tests.support import synthetic

synthetic.register()

V2_YAML = """
---
version: 2
title: Test Graph
author: T
graph:
  - name: gen
    module: signal_generator
    device: cpu
    runtime: native
    provider: generic
    config:
      signalType: cosine
      signalDataType: CF32
      sampleRate: 8000
      frequency: 1000
      bufferSize: 64
  - name: fft
    module: fft
    device: cpu
    runtime: native
    provider: generic
    config:
      forward: true
    input:
      signal: '${graph.gen.output.signal}'
  - name: amp
    module: amplitude
    device: cpu
    runtime: native
    provider: generic
    input:
      signal: '${graph.fft.output.signal}'
"""

V1_YAML = """
protocolVersion: 1.0.0
title: Legacy
graph:
  gen:
    module: signal_generator
    device: cpu
    config:
      signalType: cosine
      bufferSize: 32
  fft:
    module: fft
    input:
      signal: '${graph.gen.output.signal}'
"""


def test_v2_import_and_execution():
    fg = Flowgraph.from_yaml(V2_YAML)
    assert fg.metadata["title"] == "Test Graph"
    assert all(fg.block_state(n) == BlockState.COMPLETE
               for n in ("gen", "fft", "amp"))
    assert fg.compute(timeout=5.0)
    out = fg.scheduler.output("amp.signal")
    assert out is not None and out.shape == (64,)
    # bin 8 (1000 Hz @ 8 kHz, N=64) should dominate: tone -> ~0 dBFS
    assert abs(out[8]) < 1.0
    fg.stop()


def test_v1_migration():
    fg = Flowgraph.from_yaml(V1_YAML)
    assert set(fg.records) == {"gen", "fft"}
    assert fg.block_state("fft") == BlockState.COMPLETE
    fg.stop()


def test_out_of_order_references_resolve():
    text = """
version: 2
graph:
  - name: consumer
    module: fft
    input:
      signal: '${graph.producer.output.signal}'
  - name: producer
    module: signal_generator
    config: {signalDataType: CF32, bufferSize: 16}
"""
    fg = Flowgraph.from_yaml(text)
    assert fg.block_state("consumer") == BlockState.COMPLETE
    fg.stop()


def test_export_roundtrip():
    fg = Flowgraph.from_yaml(V2_YAML)
    text = fg.to_yaml()
    fg2 = Flowgraph.from_yaml(text)
    assert set(fg2.records) == set(fg.records)
    assert fg2.records["fft"].raw_inputs == fg.records["fft"].raw_inputs
    assert fg2.metadata["title"] == "Test Graph"
    fg.stop()
    fg2.stop()


def test_unknown_version_rejected():
    with pytest.raises(GraphError):
        Flowgraph.from_yaml("version: 99\ngraph: []")


def test_unknown_block_type_does_not_abort_import():
    text = """
version: 2
graph:
  - name: mystery
    module: not_a_real_block
  - name: gen
    module: signal_generator
    config: {bufferSize: 16}
"""
    fg = Flowgraph.from_yaml(text)
    assert "gen" in fg.records
    # r5: the unknown-type block survives as an ERRORED placeholder
    # (the reference parks errored blocks) so a load->save roundtrip
    # does not delete the user's node
    assert "mystery" in fg.records
    from cyberether_tpu.core.types import BlockState
    assert fg.records["mystery"].state == BlockState.ERRORED
    assert "unknown block type" in fg.records["mystery"].error
    out = fg.to_yaml()
    assert "mystery" in out and "not_a_real_block" in out
    # and a bad device value is likewise isolated, not fatal
    fg2 = Flowgraph.from_yaml("""
version: 2
graph:
  - name: odd
    module: signal_generator
    device: npu
  - name: gen
    module: signal_generator
    config: {bufferSize: 16}
""")
    assert "gen" in fg2.records and "odd" in fg2.records
    assert fg2.records["odd"].state == BlockState.ERRORED
    fg2.stop()
    fg.stop()


def test_reference_example_overlap_add_imports():
    """The reference's shipped example flowgraphs must parse (soapy has
    no hardware here; the graph builds and the soapy branch idles)."""
    path = "/root/reference/examples/flowgraphs/overlap-add.yml"
    fg = Flowgraph.from_file(path)
    # every block present in the YAML shows up
    assert {"soapy", "flt", "pad_soapy", "fft_soapy", "mul", "ifft",
            "unpad", "overlap_add", "fm", "audio"} <= set(fg.records)
    states = {n: fg.block_state(n) for n in fg.records}
    assert states["flt"] == BlockState.COMPLETE
    fg.stop()


def test_builtin_examples_build_complete():
    """Every registered example flowgraph builds with all blocks
    COMPLETE (soapy examples use the synthetic 'test' driver)."""
    from cyberether_tpu.core.registry import registry

    for name in registry.list_examples():
        fg = Flowgraph.from_yaml(registry.example(name).yaml_text)
        try:
            states = {b: fg.block_state(b).value for b in fg.records}
            assert all(s == "complete" for s in states.values()), \
                (name, states,
                 {b: fg.block_error(b) for b in fg.records})
        finally:
            fg.stop()


def test_channelizer64_example_computes():
    from cyberether_tpu.core.registry import registry

    fg = Flowgraph.from_yaml(
        registry.example("channelizer-64").yaml_text)
    try:
        assert fg.compute(timeout=20.0)
        out = fg.scheduler.output("flt.buffer")
        assert out is not None and out.shape == (64, 256)
        assert fg.records["flt"].build is not None
    finally:
        fg.stop()


def test_overlap_add_primitive_chain_matches_convolution(rng):
    """The overlap-add example's primitive chain (pad/fft/multiply/
    ifft/unpad/overlap_add) must equal direct time-domain convolution
    across block boundaries (the reference's overlap-add.yml teaching
    example)."""
    import numpy as np

    n, taps, blocks = 512, 33, 3
    h = (rng.standard_normal(taps)
         + 1j * rng.standard_normal(taps)).astype(np.complex64)
    x = (rng.standard_normal(blocks * n)
         + 1j * rng.standard_normal(blocks * n)).astype(np.complex64)
    conv = n + taps - 1
    fg = Flowgraph.from_yaml(f"""
version: 2
graph:
  - name: src
    module: dti
    config: {{shape: [1, {n}], dataType: CF32}}
  - name: flt
    module: dti
    config: {{shape: [1, {taps}], dataType: CF32}}
  - name: pad_sig
    module: pad
    config: {{size: {taps - 1}, axis: 1}}
    input: {{unpadded: '${{graph.src.output.buffer}}'}}
  - name: pad_flt
    module: pad
    config: {{size: {n - 1}, axis: 1}}
    input: {{unpadded: '${{graph.flt.output.buffer}}'}}
  - name: fft_sig
    module: fft
    config: {{forward: true}}
    input: {{signal: '${{graph.pad_sig.output.padded}}'}}
  - name: fft_flt
    module: fft
    config: {{forward: true}}
    input: {{signal: '${{graph.pad_flt.output.padded}}'}}
  - name: mul
    module: multiply
    input:
      a: '${{graph.fft_sig.output.signal}}'
      b: '${{graph.fft_flt.output.signal}}'
  - name: axes
    module: signal_axes
    config: {{axes: 'batch=0,sample=1'}}
    input: {{buffer: '${{graph.mul.output.product}}'}}
  - name: ifft
    module: fft
    config: {{forward: false}}
    input: {{signal: '${{graph.axes.output.buffer}}'}}
  - name: norm
    module: multiply_constant
    config: {{constant: {1.0 / conv}}}
    input: {{factor: '${{graph.ifft.output.signal}}'}}
  - name: unpad
    module: unpad
    config: {{size: {taps - 1}, axis: 1}}
    input: {{padded: '${{graph.norm.output.product}}'}}
  - name: ola
    module: overlap_add
    input:
      buffer: '${{graph.unpad.output.unpadded}}'
      overlap: '${{graph.unpad.output.pad}}'
""")
    try:
        fg.records["flt"].build.modules["flt/m"].attach_buffer(
            h[None, :])
        src = fg.records["src"].build.modules["src/m"]
        got = []
        for b in range(blocks):
            src.attach_buffer(x[None, b * n:(b + 1) * n])
            assert fg.compute(timeout=20.0)
            got.append(np.asarray(fg.scheduler.output("ola.buffer"))[0])
        want = np.convolve(x, h)[:blocks * n]
        np.testing.assert_allclose(np.concatenate(got), want,
                                   atol=2e-3)
    finally:
        fg.stop()


def test_overlap_add_fold_chain_matches_decimated_convolution(rng):
    """The overlap-add-fold example's chain (pad/fft/multiply/fold/
    ifft/unpad/overlap_add) must equal direct convolution decimated by
    the fold ratio, across block boundaries and for both filter heads
    (the reference's overlap-add-fold.yml teaching example)."""
    import numpy as np

    n, taps, blocks, decim = 800, 101, 3, 10
    pad = taps - 1                       # 100; N = 900, fold size 90
    N = n + pad
    size = N // decim
    heads = 2
    h = (rng.standard_normal((heads, taps))
         + 1j * rng.standard_normal((heads, taps))).astype(np.complex64)
    x = (rng.standard_normal(blocks * n)
         + 1j * rng.standard_normal(blocks * n)).astype(np.complex64)
    fg = Flowgraph.from_yaml(f"""
version: 2
graph:
  - name: src
    module: dti
    config: {{shape: [1, {n}], dataType: CF32}}
  - name: flt
    module: dti
    config: {{shape: [{heads}, {taps}], dataType: CF32}}
  - name: pad_sig
    module: pad
    config: {{size: {pad}, axis: 1}}
    input: {{unpadded: '${{graph.src.output.buffer}}'}}
  - name: pad_flt
    module: pad
    config: {{size: {n - 1}, axis: 1}}
    input: {{unpadded: '${{graph.flt.output.buffer}}'}}
  - name: fft_sig
    module: fft
    config: {{forward: true}}
    input: {{signal: '${{graph.pad_sig.output.padded}}'}}
  - name: fft_flt
    module: fft
    config: {{forward: true}}
    input: {{signal: '${{graph.pad_flt.output.padded}}'}}
  - name: exp
    module: expand_dims
    config: {{axis: 1}}
    input: {{buffer: '${{graph.fft_sig.output.signal}}'}}
  - name: mul
    module: multiply
    input:
      a: '${{graph.exp.output.buffer}}'
      b: '${{graph.fft_flt.output.signal}}'
  - name: axes
    module: signal_axes
    config: {{axes: 'batch=0,channel=1,sample=2'}}
    input: {{buffer: '${{graph.mul.output.product}}'}}
  - name: fold
    module: fold
    config: {{size: {size}, offset: 0}}
    input: {{buffer: '${{graph.axes.output.buffer}}'}}
  - name: ifft
    module: fft
    config: {{forward: false}}
    input: {{signal: '${{graph.fold.output.buffer}}'}}
  - name: norm
    module: multiply_constant
    config: {{constant: {1.0 / size}}}
    input: {{factor: '${{graph.ifft.output.signal}}'}}
  - name: unpad
    module: unpad
    config: {{size: {pad // decim}, axis: 2}}
    input: {{padded: '${{graph.norm.output.product}}'}}
  - name: ola
    module: overlap_add
    input:
      buffer: '${{graph.unpad.output.unpadded}}'
      overlap: '${{graph.unpad.output.pad}}'
""")
    try:
        fg.records["flt"].build.modules["flt/m"].attach_buffer(h)
        src = fg.records["src"].build.modules["src/m"]
        got = []
        for b in range(blocks):
            src.attach_buffer(x[None, b * n:(b + 1) * n])
            assert fg.compute(timeout=20.0)
            got.append(np.asarray(fg.scheduler.output("ola.buffer")))
        out = np.concatenate(got, axis=-1)      # (1, heads, blocks*n/decim)
        for j in range(heads):
            want = np.convolve(x, h[j])[::decim][:blocks * n // decim]
            np.testing.assert_allclose(out[0, j], want, atol=2e-3)
    finally:
        fg.stop()


def test_all_reference_examples_import():
    """Every example flowgraph shipped with the reference parses and
    builds (soapy/audio device-dependent blocks may sit incomplete but
    must exist; unknown types are skipped with a warning)."""
    import glob
    import os

    paths = sorted(glob.glob(
        "/root/reference/examples/flowgraphs/*.yml"))
    assert len(paths) >= 7
    for path in paths:
        fg = Flowgraph.from_file(path)
        try:
            assert fg.records, path
            # at least half of the declared blocks materialize
            import yaml as _yaml

            declared = _yaml.safe_load(open(path))["graph"]
            assert len(fg.records) >= len(declared) // 2, path
        finally:
            fg.stop()


@pytest.mark.parametrize("text", [
    "",                                    # empty
    "version: 2",                          # no graph
    "version: 2\ngraph: 12",               # wrong graph type
    "version: 2\ngraph:\n  - 3\n  - 4",    # wrong node type
    "version: 2\ngraph:\n  - name: a",     # node without module
    "version: 2\ngraph:\n  - name: a\n    module: no_such_module",
    "version: 3\ngraph: []",               # unknown version
    "{{{{not yaml",                        # parse error
    "version: 2\ngraph:\n  - name: a\n    module: fft\n"
    "    input: {signal: '${graph.missing.output.x}'}",
    "version: 2\ngraph:\n  - name: a\n    module: fft\n"
    "    input: {signal: 'not-a-link-&&-not-a-name'}",
    "version: 2\ngraph:\n  - name: a\n    module: signal_generator\n"
    "    config: {bufferSize: -5}",
])
def test_yaml_import_never_crashes(text):
    """Malformed/hostile YAML must come back as a GraphError (or an
    incomplete/errored block for resolvable-but-wrong graphs) — never
    an unhandled exception (reference serialization tests,
    tests/core/serialization/yaml.cc)."""
    try:
        fg = Flowgraph.from_yaml(text)
    except GraphError:
        return                        # clean structured rejection
    except Exception as e:            # pragma: no cover
        raise AssertionError(
            f"unstructured failure for {text!r}: {type(e).__name__}: "
            f"{e}")
    # graphs that import must then run or mark blocks incomplete/
    # errored — compute() must not raise
    try:
        fg.compute(timeout=5.0)
    finally:
        fg.stop()


def test_init_state_templates_are_host_side():
    """init_state must return HOST templates (numpy / scalars), never
    jax.Array leaves: eagerly creating a complex64 device array is a
    complex h2d — UNIMPLEMENTED on the axon TPU backend and it POISONS
    the device stream (every later fetch fails; 'run simple-fm'
    crashed exactly this way).  Sweep every module of every registered
    example flowgraph."""
    import jax

    from cyberether_tpu.core.registry import registry

    checked = 0
    for name in registry.list_examples():
        fg = Flowgraph.from_yaml(registry.example(name).yaml_text)
        try:
            for rec in fg.records.values():
                if rec.build is None:
                    continue
                for mname, mod in rec.build.modules.items():
                    st = mod.init_state()
                    if st is None:
                        continue
                    for leaf in jax.tree_util.tree_leaves(st):
                        assert not isinstance(leaf, jax.Array), \
                            (name, mname, type(leaf))
                        checked += 1
        finally:
            fg.stop()
    assert checked > 0
