"""core/ domain — 20 tensor-manipulation modules.

Reference: /root/reference/src/domains/core/ (SURVEY.md §2.4 core list).
Each module here is a pure JAX function traced into the fused graph
program; structural ops (reshape/expand/squeeze/permute/slice) are
metadata transforms XLA folds into layout changes.
"""

from __future__ import annotations

import ast
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from cyberether_tpu.core.block import simple_block
from cyberether_tpu.core.module import Module, PASS_FLAG
from cyberether_tpu.core.params import Field, Schema, parse_literal_list
from cyberether_tpu.core.registry import register_block, register_module
from cyberether_tpu.core.tensor import SignalAxes, TensorSpec
from cyberether_tpu.core.types import DataType, Device, Runtime, Taint, \
    ValidationError


def _resolve_axis(axis: int, rank: int) -> int:
    """ResolveAxis (memory/axis.hh): -1 means last axis."""
    a = axis if axis >= 0 else rank + axis
    if not (0 <= a < rank):
        raise ValidationError(f"axis {axis} out of range for rank {rank}")
    return a


# ---------------------------------------------------------------------------
# add — element-wise a+b (reference src/domains/core/add)
# ---------------------------------------------------------------------------
@register_module
class AddModule(Module):
    module_type = "add"
    taints = Taint.STATELESS
    input_ports = ("a", "b")
    output_ports = ("sum",)

    def validate(self) -> None:
        a, b = self.input_specs["a"], self.input_specs["b"]
        if a.dtype != b.dtype:
            raise ValidationError(f"dtype mismatch {a.dtype} vs {b.dtype}")
        np.broadcast_shapes(a.shape, b.shape)  # raises if incompatible

    def create(self) -> Dict[str, TensorSpec]:
        a, b = self.input_specs["a"], self.input_specs["b"]
        shape = np.broadcast_shapes(a.shape, b.shape)
        base = a if a.rank >= b.rank else b
        return {"sum": base.with_shape(shape).propagate(base)}

    def apply(self, inputs, state):
        return {"sum": inputs["a"] + inputs["b"]}, state


# ---------------------------------------------------------------------------
# multiply — element-wise product with broadcast (core/multiply)
# ---------------------------------------------------------------------------
@register_module
class MultiplyModule(Module):
    module_type = "multiply"
    taints = Taint.STATELESS
    input_ports = ("a", "b")
    output_ports = ("product",)

    def validate(self) -> None:
        a, b = self.input_specs["a"], self.input_specs["b"]
        if a.dtype != b.dtype:
            raise ValidationError(f"dtype mismatch {a.dtype} vs {b.dtype}")
        np.broadcast_shapes(a.shape, b.shape)

    def create(self) -> Dict[str, TensorSpec]:
        a, b = self.input_specs["a"], self.input_specs["b"]
        shape = np.broadcast_shapes(a.shape, b.shape)
        base = a if a.rank >= b.rank else b
        return {"product": base.with_shape(shape).propagate(base)}

    def apply(self, inputs, state):
        return {"product": inputs["a"] * inputs["b"]}, state


# ---------------------------------------------------------------------------
# multiply_constant (core/multiply_constant)
# ---------------------------------------------------------------------------
@register_module
class MultiplyConstantModule(Module):
    module_type = "multiply_constant"
    taints = Taint.STATELESS
    input_ports = ("factor",)
    output_ports = ("product",)
    schema = Schema(Field("constant", "float", 1.0))

    def create(self) -> Dict[str, TensorSpec]:
        return {"product": self.input_specs["factor"]}

    def apply(self, inputs, state):
        x = inputs["factor"]
        c = jnp.asarray(self.config["constant"], dtype=x.dtype)
        return {"product": x * c}, state


# ---------------------------------------------------------------------------
# arithmetic — reduction along axis (core/arithmetic: add/sub/mul/div fold)
# ---------------------------------------------------------------------------
@register_module
class ArithmeticModule(Module):
    module_type = "arithmetic"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(
        Field("operation", "str", "add"),
        Field("axis", "int", -1),
        Field("squeeze", "bool", False))

    def validate(self) -> None:
        if self.config["operation"] not in ("add", "sub", "mul", "div"):
            raise ValidationError(
                f"invalid operation '{self.config['operation']}'")
        spec = self.input_specs["buffer"]
        if spec.rank == 0:
            raise ValidationError("input buffer rank is 0")
        self._axis = _resolve_axis(self.config["axis"], spec.rank)

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["buffer"]
        shape = list(spec.shape)
        shape[self._axis] = 1
        out = spec.with_shape(shape)
        if self.config["squeeze"]:
            out = out.squeeze_dims(self._axis)
        return {"buffer": out}

    def apply(self, inputs, state):
        x = inputs["buffer"]
        op = self.config["operation"]
        ax = self._axis
        if op == "add":
            out = jnp.sum(x, axis=ax, keepdims=True)
        elif op == "mul":
            out = jnp.prod(x, axis=ax, keepdims=True)
        elif op == "sub":
            # fold: ((x0 - x1) - x2) … = x0 - sum(rest)
            first = jax.lax.slice_in_dim(x, 0, 1, axis=ax)
            rest = jax.lax.slice_in_dim(x, 1, x.shape[ax], axis=ax)
            out = first - jnp.sum(rest, axis=ax, keepdims=True)
        else:  # div
            first = jax.lax.slice_in_dim(x, 0, 1, axis=ax)
            rest = jax.lax.slice_in_dim(x, 1, x.shape[ax], axis=ax)
            out = first / jnp.prod(rest, axis=ax, keepdims=True)
        if self.config["squeeze"]:
            out = jnp.squeeze(out, axis=ax)
        return {"buffer": out.astype(x.dtype)}, state


# ---------------------------------------------------------------------------
# cast — dtype conversion with normalization scale (core/cast:
#   int->float divides by 128/32768/2^31 per input width)
# ---------------------------------------------------------------------------
_CAST_SCALERS = {
    DataType.I8: 128.0, DataType.U8: 128.0,
    DataType.CI8: 128.0, DataType.CU8: 128.0,
    DataType.I16: 32768.0, DataType.U16: 32768.0,
    DataType.CI16: 32768.0, DataType.CU16: 32768.0,
    DataType.I32: 2147483648.0, DataType.U32: 2147483648.0,
    DataType.CI32: 2147483648.0, DataType.CU32: 2147483648.0,
}


@register_module
class CastModule(Module):
    module_type = "cast"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("outputType", "dtype", DataType.CF32))

    def validate(self) -> None:
        self._out_dtype = DataType.parse(self.config["outputType"])
        self._scaler = _CAST_SCALERS.get(self.input_specs["buffer"].dtype,
                                         1.0)
        self._bypass = self.input_specs["buffer"].dtype == self._out_dtype

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer": self.input_specs["buffer"]
                .with_dtype(self._out_dtype)}

    def apply(self, inputs, state):
        x = inputs["buffer"]
        if self._bypass:
            return {"buffer": x}, state
        target = self._out_dtype.jnp_dtype
        out = x.astype(target)
        if self._scaler != 1.0:
            out = out / jnp.asarray(self._scaler, dtype=target)
        return {"buffer": out}, state


# ---------------------------------------------------------------------------
# comparator — element compare across N inputs -> max abs error
# (core/comparator)
# ---------------------------------------------------------------------------
@register_module
class ComparatorModule(Module):
    module_type = "comparator"
    taints = Taint.STATELESS
    output_ports = ("error",)
    schema = Schema(
        Field("inputCount", "int", 2),
        Field("tolerance", "float", 1e-6))

    def define(self) -> None:
        n = int(self.config.get("inputCount", 2))
        self.input_ports = tuple(f"input{i}" for i in range(n))

    def validate(self) -> None:
        shapes = {s.shape for s in self.input_specs.values()}
        if len(shapes) != 1:
            raise ValidationError(f"input shape mismatch: {shapes}")

    def create(self) -> Dict[str, TensorSpec]:
        first = self.input_specs[self.input_ports[0]]
        return {"error": TensorSpec((1,), DataType.F32, first.device)}

    def apply(self, inputs, state):
        ref = inputs[self.input_ports[0]]
        err = jnp.zeros((1,), jnp.float32)
        for p in self.input_ports[1:]:
            diff = jnp.max(jnp.abs((inputs[p] - ref).astype(jnp.complex64)))
            err = jnp.maximum(err, jnp.real(diff).reshape(1))
        return {"error": err,
                "metric:withinTolerance":
                    (err[0] <= self.config["tolerance"])}, state


# ---------------------------------------------------------------------------
# duplicate — materialize a copy (core/duplicate).  On TPU this marks a
# host-accessible snapshot boundary; compute-wise it is identity.
# ---------------------------------------------------------------------------
@register_module
class DuplicateModule(Module):
    module_type = "duplicate"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(
        Field("outputDevice", "str", "tpu"),
        Field("hostAccessible", "bool", True))

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer": self.input_specs["buffer"]}

    def apply(self, inputs, state):
        return {"buffer": inputs["buffer"] + 0}, state


# ---------------------------------------------------------------------------
# expand_dims / squeeze_dims / flatten / reshape / permutation
# ---------------------------------------------------------------------------
@register_module
class ExpandDimsModule(Module):
    module_type = "expand_dims"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("axis", "int", -1))

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer":
                self.input_specs["buffer"].expand_dims(self.config["axis"])}

    def apply(self, inputs, state):
        return {"buffer": jnp.expand_dims(inputs["buffer"],
                                          self.config["axis"])}, state


@register_module
class SqueezeDimsModule(Module):
    module_type = "squeeze_dims"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("axis", "int", -1))

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer":
                self.input_specs["buffer"].squeeze_dims(self.config["axis"])}

    def apply(self, inputs, state):
        return {"buffer": jnp.squeeze(inputs["buffer"],
                                      self.config["axis"])}, state


@register_module
class FlattenModule(Module):
    module_type = "flatten"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["buffer"]
        return {"buffer": spec.with_shape((spec.size,))}

    def apply(self, inputs, state):
        return {"buffer": inputs["buffer"].reshape(-1)}, state


@register_module
class ReshapeModule(Module):
    module_type = "reshape"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("shape", "list[int]", []))

    def validate(self) -> None:
        spec = self.input_specs["buffer"]
        shape = [int(s) for s in self.config["shape"]]
        n_infer = sum(1 for s in shape if s == -1)
        if n_infer > 1:
            raise ValidationError("at most one -1 in reshape")
        if n_infer:
            known = int(np.prod([s for s in shape if s != -1])) or 1
            if spec.size % known:
                raise ValidationError(
                    f"cannot reshape {spec.shape} to {shape}")
            shape = [spec.size // known if s == -1 else s for s in shape]
        if int(np.prod(shape)) != spec.size:
            raise ValidationError(f"cannot reshape {spec.shape} to {shape}")
        self._shape = tuple(shape)

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer": self.input_specs["buffer"].with_shape(self._shape)}

    def apply(self, inputs, state):
        return {"buffer": inputs["buffer"].reshape(self._shape)}, state


@register_module
class PermutationModule(Module):
    module_type = "permutation"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("permutation", "list[int]", [0]))

    def validate(self) -> None:
        spec = self.input_specs["buffer"]
        perm = [int(p) for p in self.config["permutation"]]
        if sorted(perm) != list(range(spec.rank)):
            raise ValidationError(
                f"invalid permutation {perm} for rank {spec.rank}")
        self._perm = perm

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer": self.input_specs["buffer"].permute(self._perm)}

    def apply(self, inputs, state):
        return {"buffer": jnp.transpose(inputs["buffer"],
                                        self._perm)}, state


# ---------------------------------------------------------------------------
# ones_tensor (core/ones_tensor) — STATIC source of ones
# ---------------------------------------------------------------------------
@register_module
class OnesTensorModule(Module):
    module_type = "ones_tensor"
    taints = Taint.STATIC_OUTPUT
    output_ports = ("buffer",)
    schema = Schema(
        Field("shape", "list[int]", [1]),
        Field("dataType", "dtype", DataType.F32))

    def validate(self) -> None:
        if any(int(s) <= 0 for s in self.config["shape"]):
            raise ValidationError("shape dims must be positive")

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer": TensorSpec(tuple(self.config["shape"]),
                                     DataType.parse(self.config["dataType"]),
                                     self.device)}

    def apply(self, inputs, state):
        dt = DataType.parse(self.config["dataType"]).jnp_dtype
        return {"buffer": jnp.ones(tuple(self.config["shape"]), dt)}, state


# ---------------------------------------------------------------------------
# pad / unpad (core/pad, core/unpad) — zero pad at END of axis; unpad
# splits the padded tail off ("pad" output feeds overlap_add)
# ---------------------------------------------------------------------------
@register_module
class PadModule(Module):
    module_type = "pad"
    taints = Taint.STATELESS
    input_ports = ("unpadded",)
    output_ports = ("padded",)
    schema = Schema(Field("size", "int", 0), Field("axis", "int", -1))

    def validate(self) -> None:
        spec = self.input_specs["unpadded"]
        self._axis = _resolve_axis(self.config["axis"], spec.rank)

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["unpadded"]
        shape = list(spec.shape)
        shape[self._axis] += int(self.config["size"])
        return {"padded": spec.with_shape(shape)}

    def apply(self, inputs, state):
        x = inputs["unpadded"]
        widths = [(0, 0)] * x.ndim
        widths[self._axis] = (0, int(self.config["size"]))
        return {"padded": jnp.pad(x, widths)}, state


@register_module
class UnpadModule(Module):
    module_type = "unpad"
    taints = Taint.STATELESS
    input_ports = ("padded",)
    output_ports = ("unpadded", "pad")
    schema = Schema(Field("size", "int", 0), Field("axis", "int", -1))

    def validate(self) -> None:
        spec = self.input_specs["padded"]
        self._axis = _resolve_axis(self.config["axis"], spec.rank)
        if int(self.config["size"]) >= spec.shape[self._axis]:
            raise ValidationError(
                f"pad size {self.config['size']} >= axis length "
                f"{spec.shape[self._axis]}")

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["padded"]
        size = int(self.config["size"])
        u = list(spec.shape)
        u[self._axis] -= size
        p = list(spec.shape)
        p[self._axis] = size if size else 1
        out = {"unpadded": spec.with_shape(u)}
        out["pad"] = spec.with_shape(p)
        return out

    def apply(self, inputs, state):
        x = inputs["padded"]
        ax = self._axis
        size = int(self.config["size"])
        n = x.shape[ax]
        unpadded = jax.lax.slice_in_dim(x, 0, n - size, axis=ax)
        pad = jax.lax.slice_in_dim(x, n - size if size else n - 1, n,
                                   axis=ax)
        return {"unpadded": unpadded, "pad": pad}, state


# ---------------------------------------------------------------------------
# range — soft-clip normalize [min,max] -> [0,1] (core/range:
#   0.5 + 0.5*tanh(4*(x*scale+offset - 0.5)))
# ---------------------------------------------------------------------------
@register_module
class RangeModule(Module):
    module_type = "range"
    taints = Taint.STATELESS
    input_ports = ("signal",)
    output_ports = ("signal",)
    schema = Schema(Field("min", "float", -1.0), Field("max", "float", 1.0))

    def create(self) -> Dict[str, TensorSpec]:
        return {"signal": self.input_specs["signal"]}

    def apply(self, inputs, state):
        x = inputs["signal"]
        lower = min(self.config["min"], self.config["max"])
        upper = max(self.config["min"], self.config["max"])
        if lower == upper:
            return {"signal": jnp.full_like(x, 0.5)}, state
        scale = 1.0 / (upper - lower)
        offset = -lower * scale
        normalized = x * scale + offset
        out = 0.5 + 0.5 * jnp.tanh(4.0 * (normalized - 0.5))
        return {"signal": out.astype(x.dtype)}, state


# ---------------------------------------------------------------------------
# signal_axes — set sample/batch/channel axis metadata (core/signal_axes)
# ---------------------------------------------------------------------------
@register_module
class SignalAxesModule(Module):
    module_type = "signal_axes"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("axes", "str", ""))

    def validate(self) -> None:
        """axes syntax: 'sample=1,batch=0,channel=2' (subset allowed)."""
        spec = self.input_specs["buffer"]
        kv: Dict[str, int] = {}
        s = self.config["axes"].strip()
        if s:
            for part in s.split(","):
                if "=" not in part:
                    raise ValidationError(f"bad axes syntax '{s}'")
                k, v = part.split("=", 1)
                k = k.strip().lower()
                if k not in ("sample", "batch", "channel"):
                    raise ValidationError(f"unknown axis role '{k}'")
                kv[k] = _resolve_axis(int(v), spec.rank)
        self._axes = SignalAxes(**kv)
        self._axes.validate(spec.rank)

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["buffer"]
        from dataclasses import replace
        return {"buffer": replace(spec, axes=self._axes)}

    def apply(self, inputs, state):
        return {"buffer": inputs["buffer"]}, state


# ---------------------------------------------------------------------------
# attributes — internal metadata module: set/remove link attributes.
# The reference mutates attributes directly on tensors inside composite
# blocks (e.g. filter_engine setAttribute("channelOffsets", …)); with
# immutable TensorSpecs this is an explicit no-op-compute module.
# ---------------------------------------------------------------------------
@register_module
class AttributesModule(Module):
    module_type = "attributes"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("set", "any", None),
                    Field("remove", "list[str]", []))

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["buffer"]
        attrs = dict(spec.attributes)
        for k in self.config["remove"]:
            attrs.pop(k, None)
        attrs.update(self.config["set"] or {})
        from dataclasses import replace
        return {"buffer": replace(spec, attributes=attrs)}

    def apply(self, inputs, state):
        return {"buffer": inputs["buffer"]}, state


# ---------------------------------------------------------------------------
# slice — NumPy-style token slicing (core/slice, memory/token.hh)
# ---------------------------------------------------------------------------
def parse_slice_tokens(text: str, rank: int) -> Tuple[slice, ...]:
    """Parse '[0, :, 1:5, ...]' into a tuple of python slices/ints."""
    s = text.strip()
    if s.startswith("[") and s.endswith("]"):
        s = s[1:-1]
    tokens = [t.strip() for t in s.split(",")] if s else []
    out: list = []
    ellipsis_seen = False
    for t in tokens:
        if t == "...":
            if ellipsis_seen:
                raise ValidationError("multiple ellipsis tokens")
            ellipsis_seen = True
            out.append(Ellipsis)
        elif t == ":" or t == "":
            out.append(slice(None))
        elif ":" in t:
            parts = t.split(":")
            if len(parts) > 3:
                raise ValidationError(f"bad slice token '{t}'")
            vals = [int(p) if p.strip() else None for p in parts]
            while len(vals) < 3:
                vals.append(None)
            out.append(slice(*vals))
        else:
            out.append(int(t))
    return tuple(out)


@register_module
class SliceModule(Module):
    module_type = "slice"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("slice", "str", "[...]"),
                    Field("contiguous", "bool", False))

    def validate(self) -> None:
        spec = self.input_specs["buffer"]
        self._tokens = parse_slice_tokens(self.config["slice"], spec.rank)
        # compute output shape via numpy dry-run on an empty array
        try:
            probe = np.empty(spec.shape, dtype=np.int8)[self._tokens]
        except IndexError as e:
            raise ValidationError(f"slice out of range: {e}")
        self._out_shape = probe.shape
        # axis map for metadata: dropped integer-indexed axes
        ntok = len([t for t in self._tokens if t is not Ellipsis])
        expanded: list = []
        toks = list(self._tokens)
        if Ellipsis in toks:
            i = toks.index(Ellipsis)
            fill = [slice(None)] * (spec.rank - ntok)
            toks = toks[:i] + fill + toks[i + 1:]
        toks += [slice(None)] * (spec.rank - len(toks))
        new_axis = 0
        amap: list = []
        for t in toks:
            if isinstance(t, int):
                amap.append(None)
            else:
                amap.append(new_axis)
                new_axis += 1
        self._axis_map = amap

    def create(self) -> Dict[str, TensorSpec]:
        spec = self.input_specs["buffer"]
        return {"buffer": spec.with_shape(self._out_shape, self._axis_map)}

    def apply(self, inputs, state):
        return {"buffer": inputs["buffer"][self._tokens]}, state


# ---------------------------------------------------------------------------
# throttle — time-gated pass (core/throttle, THROTTLED taint).  The
# device op is identity; the scheduler feeds the gate flag host-side.
# ---------------------------------------------------------------------------
@register_module
class ThrottleModule(Module):
    module_type = "throttle"
    taints = Taint.STATELESS | Taint.THROTTLED
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("intervalMs", "float", 100.0),
                    Field("periodMs", "float", 100.0))

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer": self.input_specs["buffer"]}

    def apply(self, inputs, state):
        return {"buffer": inputs["buffer"]}, state


# ---------------------------------------------------------------------------
# python — inline host-Python compute (core/python).  The user supplies
# a ``compute(ctx)`` body; tensors cross as numpy views (zero-copy from
# device snapshots).  Runs in the HOST runtime segment.
# ---------------------------------------------------------------------------
class _PythonCtx:
    def __init__(self, inputs: Dict[str, np.ndarray],
                 outputs: Dict[str, np.ndarray],
                 env, metrics: Dict[str, Any]):
        self.inputs = inputs
        self.outputs = outputs
        self.env = env
        self.metrics = metrics


@register_module
class PythonModule(Module):
    module_type = "python"
    device = Device.CPU
    runtime = Runtime.HOST
    taints = Taint.NONE
    schema = Schema(
        Field("code", "str", ""),
        Field("inputs", "list[str]", []),      # port names
        Field("outputs", "list[str]", []),     # "name:DTYPE:[shape]"
    )

    def define(self) -> None:
        self.input_ports = tuple(
            str(p).split(":")[0] for p in self.config.get("inputs", []))

    def validate(self) -> None:
        self._out_specs: Dict[str, TensorSpec] = {}
        for spec_str in self.config.get("outputs", []):
            parts = str(spec_str).split(":")
            if len(parts) < 3:
                raise ValidationError(
                    f"output spec '{spec_str}' must be name:DTYPE:[shape]")
            name, dtype = parts[0], DataType.parse(parts[1])
            shape = tuple(int(x) for x in
                          parse_literal_list(":".join(parts[2:])))
            self._out_specs[name] = TensorSpec(shape, dtype, Device.CPU)
        self.output_ports = tuple(self._out_specs)
        code = self.config.get("code", "")
        try:
            compiled = compile(code, f"<python block {self.name}>", "exec")
        except SyntaxError as e:
            raise ValidationError(f"python block syntax error: {e}")
        ns: Dict[str, Any] = {"np": np}
        exec(compiled, ns)  # noqa: S102 - user-authored block code
        if "compute" not in ns:
            raise ValidationError("python block must define compute(ctx)")
        self._compute = ns["compute"]

    def create(self) -> Dict[str, TensorSpec]:
        return dict(self._out_specs)

    # host-side execution path: the scheduler calls host_consume-like flow
    # via host_poll with inputs stashed by the segment runner
    def host_start(self) -> None:
        self._pending_inputs: Optional[Dict[str, np.ndarray]] = None
        self.metrics: Dict[str, Any] = {}

    def host_execute(self, inputs: Dict[str, np.ndarray]
                     ) -> Dict[str, np.ndarray]:
        if not hasattr(self, "metrics"):
            self.metrics = {}
        outputs = {name: np.zeros(s.shape, s.dtype.np_dtype)
                   for name, s in self._out_specs.items()}
        env = getattr(self, "environment", None)
        ctx = _PythonCtx(inputs, outputs, env, self.metrics)
        self._compute(ctx)
        return outputs


# ---------------------------------------------------------------------------
# block registrations (1:1 wrappers, reference block_impl.cc per module)
# ---------------------------------------------------------------------------
for _type in ("add", "arithmetic", "cast", "comparator", "duplicate",
              "expand_dims", "flatten", "multiply", "multiply_constant",
              "ones_tensor", "pad", "permutation", "range", "reshape",
              "signal_axes", "slice", "squeeze_dims", "throttle", "unpad",
              "python"):
    register_block(simple_block(_type))
