"""Serde tests (reference tests/core/serialization/)."""

import pytest

from cyberether_tpu.core.params import (
    Field,
    Schema,
    config_hash,
    parse_literal_list,
)
from cyberether_tpu.core.types import DataType, ValidationError


def test_defaults_and_coercion():
    s = Schema(Field("size", "int", 1024), Field("rate", "float", 2e6),
               Field("on", "bool", True), Field("name", "str", "x"))
    cfg = s.decode({"size": "2048", "rate": "1e6", "on": "false"})
    assert cfg == {"size": 2048, "rate": 1e6, "on": False, "name": "x"}


def test_string_vector_literals():
    assert parse_literal_list("[0]") == [0]
    assert parse_literal_list("[1, 2.5, -3]") == [1, 2.5, -3]
    assert parse_literal_list([4, 5]) == [4, 5]
    assert parse_literal_list("[0, :]") == ["0", ":"]


def test_list_field():
    s = Schema(Field("center", "list[float]", [0.0]))
    assert s.decode({"center": "[1e6, -2e6]"})["center"] == [1e6, -2e6]
    assert s.decode({})["center"] == [0.0]


def test_dtype_field():
    s = Schema(Field("dataType", "dtype", DataType.CF32))
    assert s.decode({"dataType": "f32"})["dataType"] == DataType.F32


def test_unknown_keys_kept_and_strict():
    s = Schema(Field("a", "int", 1))
    assert s.decode({"b": 2})["b"] == 2
    with pytest.raises(ValidationError):
        s.decode({"b": 2}, strict=True)


def test_bad_coercion_raises():
    s = Schema(Field("n", "int", 0))
    with pytest.raises(ValidationError):
        s.decode({"n": "not-a-number"})


def test_config_hash_stability_and_sensitivity():
    h1 = config_hash({"a": 1, "b": [1, 2]})
    h2 = config_hash({"b": [1, 2], "a": 1})
    h3 = config_hash({"a": 2, "b": [1, 2]})
    assert h1 == h2
    assert h1 != h3


def test_encode_roundtrip():
    s = Schema(Field("size", "int", 8), Field("z", "complex", 0j))
    cfg = s.decode({"size": 16, "z": "1+2j"})
    enc = s.encode(cfg)
    assert enc["size"] == 16
    assert enc["z"] == [1.0, 2.0]
