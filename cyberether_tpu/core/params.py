"""Config serde — the analog of the reference's Parser layer.

The reference routes every serializable surface (block configs, settings,
YAML, env) through ``Parser::Map`` (string -> std::any) with recursive
encode/decode and macro-generated per-struct serde + hashing
(/root/reference/include/jetstream/parser.hh:111-145,394;
src/parser_{decode,encode,map,yaml}.cc).  Here the same role is played by
``Schema`` — a declarative field table with type coercion, defaults,
serialization and a stable hash used for reconfigure change detection
(include/jetstream/module.hh:151-168).
"""

from __future__ import annotations

import ast
import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

from cyberether_tpu.core.types import DataType, ValidationError


# ---------------------------------------------------------------------------
# scalar coercions (Parser conversion behaviors, src/parser_decode.cc)
# ---------------------------------------------------------------------------

def _to_bool(v: Any) -> bool:
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return bool(v)
    if isinstance(v, str):
        s = v.strip().lower()
        if s in ("true", "yes", "on", "1"):
            return True
        if s in ("false", "no", "off", "0"):
            return False
    raise ValidationError(f"cannot convert {v!r} to bool")


def _to_int(v: Any) -> int:
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        if v != int(v):
            raise ValidationError(f"cannot convert non-integral {v!r} to int")
        return int(v)
    if isinstance(v, str):
        s = v.strip()
        try:
            return int(s, 0)
        except ValueError:
            f = float(s)
            if f != int(f):
                raise ValidationError(f"cannot convert {v!r} to int")
            return int(f)
    raise ValidationError(f"cannot convert {v!r} to int")


def _to_float(v: Any) -> float:
    if isinstance(v, bool):
        return float(v)
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        return float(v.strip())
    raise ValidationError(f"cannot convert {v!r} to float")


def _to_complex(v: Any) -> complex:
    if isinstance(v, complex):
        return v
    if isinstance(v, (int, float)):
        return complex(v)
    if isinstance(v, str):
        return complex(v.strip().replace(" ", "").replace("i", "j"))
    if isinstance(v, (list, tuple)) and len(v) == 2:
        return complex(float(v[0]), float(v[1]))
    raise ValidationError(f"cannot convert {v!r} to complex")


def _to_str(v: Any) -> str:
    if isinstance(v, str):
        return v
    return str(v)


def parse_literal_list(v: Any) -> List[Any]:
    """The reference accepts vectors serialized as strings, e.g.
    ``center: '[0]'`` (examples/flowgraphs/overlap-add.yml)."""
    if isinstance(v, (list, tuple)):
        return list(v)
    if isinstance(v, str):
        s = v.strip()
        if s.startswith("[") and s.endswith("]"):
            try:
                out = ast.literal_eval(s)
                if isinstance(out, (list, tuple)):
                    return list(out)
                return [out]
            except (ValueError, SyntaxError):
                # fall back to comma split (tolerates ':' tokens for slices)
                inner = s[1:-1]
                return [t.strip() for t in inner.split(",") if t.strip()]
        return [s]
    return [v]


def _vec(conv: Callable[[Any], Any]) -> Callable[[Any], List[Any]]:
    def convert(v: Any) -> List[Any]:
        return [conv(x) for x in parse_literal_list(v)]

    return convert


_COERCERS: Dict[str, Callable[[Any], Any]] = {
    "bool": _to_bool,
    "int": _to_int,
    "float": _to_float,
    "complex": _to_complex,
    "str": _to_str,
    "dtype": DataType.parse,
    "list[int]": _vec(_to_int),
    "list[float]": _vec(_to_float),
    "list[str]": _vec(_to_str),
    "list": parse_literal_list,
    "any": lambda v: v,
}


@dataclass(frozen=True)
class Field:
    """One config field: name, type tag, default, optional validator."""

    name: str
    type: str
    default: Any = None
    help: str = ""
    validator: Optional[Callable[[Any], Optional[str]]] = None

    def coerce(self, v: Any) -> Any:
        if self.type not in _COERCERS:
            raise ValidationError(f"unknown field type '{self.type}'")
        try:
            out = _COERCERS[self.type](v)
        except ValidationError:
            raise
        except (ValueError, TypeError) as e:
            raise ValidationError(
                f"field '{self.name}': cannot convert {v!r}: {e}")
        if self.validator is not None:
            err = self.validator(out)
            if err:
                raise ValidationError(f"field '{self.name}': {err}")
        return out


class Schema:
    """Declarative config schema — the JST_SERDES analog."""

    def __init__(self, *fields: Field):
        self.fields: Dict[str, Field] = {}
        for f in fields:
            if f.name in self.fields:
                raise ValueError(f"duplicate field '{f.name}'")
            self.fields[f.name] = f

    def decode(self, raw: Optional[Dict[str, Any]],
               strict: bool = False) -> Dict[str, Any]:
        """Apply defaults + coercions.  Unknown keys are kept verbatim
        (the reference tolerates extra config keys) unless ``strict``."""
        raw = dict(raw or {})
        out: Dict[str, Any] = {}
        for name, f in self.fields.items():
            if name in raw:
                out[name] = f.coerce(raw.pop(name))
            else:
                out[name] = f.default
        if raw:
            if strict:
                raise ValidationError(f"unknown config keys: {sorted(raw)}")
            out.update(raw)
        return out

    def encode(self, cfg: Dict[str, Any],
               include_defaults: bool = True) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for name, f in self.fields.items():
            v = cfg.get(name, f.default)
            if not include_defaults and v == f.default:
                continue
            out[name] = _encode_value(v)
        for name, v in cfg.items():
            if name not in self.fields:
                out[name] = _encode_value(v)
        return out


def _encode_value(v: Any) -> Any:
    if isinstance(v, DataType):
        return v.value
    if isinstance(v, complex):
        return [v.real, v.imag]
    if isinstance(v, (list, tuple)):
        return [_encode_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _encode_value(x) for k, x in v.items()}
    return v


def config_hash(cfg: Dict[str, Any]) -> str:
    """Stable hash of a config dict (the reference's Parser::Hash used for
    reconfigure change detection)."""
    payload = json.dumps(_encode_value(cfg), sort_keys=True, default=repr)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]
