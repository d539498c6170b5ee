"""Numeric tests for the core domain, mirroring the reference's
colocated module_tests.cc (analytic golden values, not stored fixtures).
"""

import numpy as np
import pytest

from cyberether_tpu.core.registry import registry
from cyberether_tpu.core.tensor import SignalAxes, TensorSpec, spec_of
from cyberether_tpu.core.types import DataType, Device, ValidationError
from cyberether_tpu.testing import TestContext


def test_add_and_multiply(rng):
    a = rng.standard_normal((4, 8)).astype(np.float32)
    b = rng.standard_normal((4, 8)).astype(np.float32)
    ctx = TestContext("add").set_input("a", a).set_input("b", b).run()
    np.testing.assert_allclose(ctx.output("sum"), a + b, rtol=1e-6)
    ctx = TestContext("multiply").set_input("a", a).set_input("b", b).run()
    np.testing.assert_allclose(ctx.output("product"), a * b, rtol=1e-6)


def test_multiply_broadcast(rng):
    a = (rng.standard_normal((4, 8)) + 1j * rng.standard_normal((4, 8))
         ).astype(np.complex64)
    b = (rng.standard_normal((1, 8)) + 1j * rng.standard_normal((1, 8))
         ).astype(np.complex64)
    ctx = TestContext("multiply").set_input("a", a).set_input("b", b).run()
    np.testing.assert_allclose(ctx.output("product"), a * b, rtol=1e-5)


def test_multiply_dtype_mismatch_rejected(rng):
    a = np.ones((4,), np.float32)
    b = np.ones((4,), np.complex64)
    with pytest.raises(ValidationError):
        TestContext("multiply").set_input("a", a).set_input("b", b).run()


def test_multiply_constant(rng):
    x = rng.standard_normal(16).astype(np.float32)
    ctx = TestContext("multiply_constant", {"constant": 2.5}) \
        .set_input("factor", x).run()
    np.testing.assert_allclose(ctx.output("product"), x * 2.5, rtol=1e-6)


@pytest.mark.parametrize("op,expect", [
    ("add", lambda x: x.sum(1, keepdims=True)),
    ("mul", lambda x: x.prod(1, keepdims=True)),
    ("sub", lambda x: x[:, :1] - x[:, 1:].sum(1, keepdims=True)),
    ("div", lambda x: x[:, :1] / x[:, 1:].prod(1, keepdims=True)),
])
def test_arithmetic_ops(rng, op, expect):
    x = rng.uniform(0.5, 2.0, (4, 6)).astype(np.float32)
    ctx = TestContext("arithmetic", {"operation": op, "axis": 1}) \
        .set_input("buffer", x).run()
    np.testing.assert_allclose(ctx.output("buffer"), expect(x), rtol=1e-5)


def test_arithmetic_squeeze(rng):
    x = rng.standard_normal((4, 6)).astype(np.float32)
    ctx = TestContext("arithmetic",
                      {"operation": "add", "axis": 1, "squeeze": True}) \
        .set_input("buffer", x).run()
    assert ctx.output("buffer").shape == (4,)


def test_cast_i16_to_f32(rng):
    x = rng.integers(-32768, 32767, 64, dtype=np.int16)
    ctx = TestContext("cast", {"outputType": "F32"}) \
        .set_input("buffer", x).run()
    np.testing.assert_allclose(ctx.output("buffer"),
                               x.astype(np.float32) / 32768.0, rtol=1e-6)


def test_cast_f32_to_cf32(rng):
    x = rng.standard_normal(32).astype(np.float32)
    ctx = TestContext("cast", {"outputType": "CF32"}) \
        .set_input("buffer", x).run()
    out = ctx.output("buffer")
    assert out.dtype == np.complex64
    np.testing.assert_allclose(out.real, x, rtol=1e-6)
    np.testing.assert_allclose(out.imag, 0.0)


def test_cast_bypass(rng):
    x = rng.standard_normal(8).astype(np.float32)
    ctx = TestContext("cast", {"outputType": "F32"}) \
        .set_input("buffer", x).run()
    np.testing.assert_allclose(ctx.output("buffer"), x)


def test_comparator(rng):
    x = rng.standard_normal(32).astype(np.float32)
    y = x + 1e-8
    ctx = TestContext("comparator", {"inputCount": 2, "tolerance": 1e-6}) \
        .set_input("input0", x).set_input("input1", y).run()
    assert ctx.output("error")[0] <= 1e-6


def test_structural_ops(rng):
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    ctx = TestContext("expand_dims", {"axis": 1}).set_input("buffer", x) \
        .run()
    assert ctx.output("buffer").shape == (2, 1, 3, 4)
    ctx = TestContext("flatten").set_input("buffer", x).run()
    assert ctx.output("buffer").shape == (24,)
    ctx = TestContext("reshape", {"shape": [4, 6]}).set_input("buffer", x) \
        .run()
    assert ctx.output("buffer").shape == (4, 6)
    ctx = TestContext("reshape", {"shape": [-1, 3]}).set_input("buffer", x) \
        .run()
    assert ctx.output("buffer").shape == (8, 3)
    ctx = TestContext("permutation", {"permutation": [2, 0, 1]}) \
        .set_input("buffer", x).run()
    np.testing.assert_allclose(ctx.output("buffer"),
                               np.transpose(x, (2, 0, 1)))
    ctx = TestContext("squeeze_dims", {"axis": 0}) \
        .set_input("buffer", x[:1]).run()
    assert ctx.output("buffer").shape == (3, 4)


def test_reshape_invalid(rng):
    x = np.zeros((4, 4), np.float32)
    with pytest.raises(ValidationError):
        TestContext("reshape", {"shape": [5, 5]}).set_input("buffer", x) \
            .run()


def test_ones_tensor():
    ctx = TestContext("ones_tensor",
                      {"shape": [3, 4], "dataType": "F32"}).run()
    np.testing.assert_allclose(ctx.output("buffer"), np.ones((3, 4)))


def test_pad_unpad_roundtrip(rng):
    x = (rng.standard_normal((2, 16)) + 1j * rng.standard_normal((2, 16))
         ).astype(np.complex64)
    ctx = TestContext("pad", {"size": 5, "axis": 1}) \
        .set_input("unpadded", x).run()
    padded = ctx.output("padded")
    assert padded.shape == (2, 21)
    np.testing.assert_allclose(padded[:, 16:], 0)
    ctx = TestContext("unpad", {"size": 5, "axis": 1}) \
        .set_input("padded", padded).run()
    np.testing.assert_allclose(ctx.output("unpadded"), x)
    assert ctx.output("pad").shape == (2, 5)


def test_range_soft_clip(rng):
    x = np.array([-100.0, -50.0, 0.0], np.float32)
    ctx = TestContext("range", {"min": -100, "max": 0}) \
        .set_input("signal", x).run()
    out = ctx.output("signal")
    expect = 0.5 + 0.5 * np.tanh(4.0 * ((x / 100.0 + 1.0) - 0.5))
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_slice_tokens(rng):
    x = rng.standard_normal((4, 8, 3)).astype(np.float32)
    ctx = TestContext("slice", {"slice": "[0, :]"}) \
        .set_input("buffer", x).run()
    np.testing.assert_allclose(ctx.output("buffer"), x[0, :])
    ctx = TestContext("slice", {"slice": "[..., 1]"}) \
        .set_input("buffer", x).run()
    np.testing.assert_allclose(ctx.output("buffer"), x[..., 1])
    ctx = TestContext("slice", {"slice": "[1:3, ::2, :]"}) \
        .set_input("buffer", x).run()
    np.testing.assert_allclose(ctx.output("buffer"), x[1:3, ::2, :])


def test_signal_axes(rng):
    x = rng.standard_normal((2, 16)).astype(np.float32)
    ctx = TestContext("signal_axes", {"axes": "batch=0,sample=1"}) \
        .set_input("buffer", x).run()
    spec = ctx.output_spec("buffer")
    assert spec.axes.batch == 0 and spec.axes.sample == 1


def test_duplicate(rng):
    x = rng.standard_normal(8).astype(np.float32)
    ctx = TestContext("duplicate").set_input("buffer", x).run()
    np.testing.assert_allclose(ctx.output("buffer"), x)
