"""TensorSpec / SignalAxes tests (reference tests/core/memory/)."""

import pytest

from cyberether_tpu.core.tensor import SignalAxes, TensorSpec
from cyberether_tpu.core.types import DataType, ValidationError


def test_basic_spec():
    s = TensorSpec((8, 2048), DataType.CF32,
                   axes=SignalAxes(batch=0, sample=1))
    assert s.size == 8 * 2048
    assert s.size_bytes == 8 * 2048 * 8
    assert s.dtype.is_complex


def test_axes_out_of_range():
    with pytest.raises(ValidationError):
        TensorSpec((4,), DataType.F32, axes=SignalAxes(sample=1))


def test_axes_overlap_rejected():
    with pytest.raises(ValidationError):
        TensorSpec((4, 4), DataType.F32,
                   axes=SignalAxes(sample=0, batch=0))


def test_expand_squeeze_axis_maps():
    s = TensorSpec((8, 2048), DataType.CF32,
                   axes=SignalAxes(batch=0, sample=1))
    e = s.expand_dims(1)
    assert e.shape == (8, 1, 2048)
    assert e.axes.batch == 0 and e.axes.sample == 2
    q = e.squeeze_dims(1)
    assert q.shape == (8, 2048)
    assert q.axes.sample == 1


def test_squeeze_nonunit_rejected():
    s = TensorSpec((8, 2048), DataType.CF32)
    with pytest.raises(ValidationError):
        s.squeeze_dims(0)


def test_permute_remaps_axes():
    s = TensorSpec((8, 2048), DataType.CF32,
                   axes=SignalAxes(batch=0, sample=1))
    p = s.permute([1, 0])
    assert p.shape == (2048, 8)
    assert p.axes.sample == 0 and p.axes.batch == 1


def test_attribute_propagation():
    a = TensorSpec((4,), DataType.CF32,
                   attributes={"sampleRate": 2e6})
    b = TensorSpec((4,), DataType.F32).propagate(a)
    assert b.attr("sampleRate") == 2e6


def test_dtype_tables():
    assert DataType.CF32.real_dtype == DataType.F32
    assert DataType.F32.complex_dtype == DataType.CF32
    assert DataType.CF32.element_size == 8
    assert DataType.CI16.element_size == 4
    assert DataType.parse("cf32") == DataType.CF32
    assert len(list(DataType)) == 20
