"""Core enums and the dtype system.

Mirrors the *capabilities* of the reference's type layer
(/root/reference/include/jetstream/memory/types.hh:56-307 — 20 dtypes;
/root/reference/include/jetstream/module.hh:53-63 — taint flags;
/root/reference/include/jetstream/types.hh — Result/Device/Runtime enums)
re-designed for JAX: every DataType maps onto a ``jnp.dtype`` and the
framework computes in whatever XLA natively supports (complex64 for CF32,
etc.).  Exotic complex-integer dtypes (CI8 …) are carried as a trailing
[2]-component real axis convention, which is how TPUs want packed IQ
anyway.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional

import numpy as np

try:  # jax is the compute substrate but the host layer must import without it
    import jax.numpy as jnp

    _HAS_JAX = True
except Exception:  # pragma: no cover
    jnp = None
    _HAS_JAX = False


class Result(enum.Enum):
    """Module/scheduler result codes (reference include/jetstream/types.hh)."""

    SUCCESS = 0
    ERROR = 1
    SKIP = 2            # squelch-style gating: outputs not produced this cycle
    RECREATE = 3        # reconfigure requires full recreation
    RELOAD = 4
    TIMEOUT = 5
    YIELD = 6


class Device(enum.Flag):
    """Compute devices.  The reference enumerates CPU/CUDA/Metal/Vulkan/WebGPU
    (backend/base.hh:37-120); the TPU build has two real substrates: the host
    CPU (ingest, sinks, UI) and TPU (everything hot)."""

    NONE = 0
    CPU = enum.auto()
    TPU = enum.auto()
    ANY = CPU | TPU

    @classmethod
    def parse(cls, s: "str | Device") -> "Device":
        if isinstance(s, Device):
            return s
        s = s.strip().lower()
        # Accept reference YAML device names (cpu/cuda/metal/vulkan/webgpu):
        # all of the reference's GPU devices map to TPU here, CPU stays CPU.
        if s in ("cpu",):
            return cls.CPU
        if s in ("tpu", "cuda", "metal", "vulkan", "webgpu", "gpu"):
            return cls.TPU
        if s in ("any", ""):
            return cls.ANY
        raise ValueError(f"unknown device '{s}'")

    def canonical(self) -> str:
        if self == Device.CPU:
            return "cpu"
        if self == Device.TPU:
            return "tpu"
        return "any"


class Runtime(enum.Enum):
    """Execution runtimes.  Reference: NATIVE / PYTHON / MLIR
    (src/runtime/runtime.cc:17-61).  Here:

    - JAX:    traced into the fused jitted graph program (the native path)
    - HOST:   runs host-side python per cycle (sources/sinks, user code)
    - PALLAS: like JAX but implemented as a hand-written Pallas kernel
    """

    JAX = "jax"
    HOST = "host"
    PALLAS = "pallas"

    @classmethod
    def parse(cls, s: "str | Runtime") -> "Runtime":
        if isinstance(s, Runtime):
            return s
        s = s.strip().lower()
        # Reference YAML says runtime: native | python | mlir.
        if s in ("jax", "native", "mlir", ""):
            return cls.JAX
        if s in ("host", "python"):
            return cls.HOST
        if s in ("pallas",):
            return cls.PALLAS
        raise ValueError(f"unknown runtime '{s}'")


class Taint(enum.Flag):
    """Module taint flags (reference include/jetstream/module.hh:53-63)."""

    NONE = 0
    STATIC_OUTPUT = enum.auto()   # output depends only on config -> settled
    STATELESS = enum.auto()       # pure function of inputs
    DISCONTIGUOUS = enum.auto()   # accepts non-contiguous views (moot on TPU)
    CROSS_DEVICE = enum.auto()    # may take inputs living on another device
    THROTTLED = enum.auto()       # runs at a bounded cadence (throttle block)
    HOST_SOURCE = enum.auto()     # host-side producer paced by hardware/file
    HOST_SINK = enum.auto()       # host-side consumer
    SURFACE = enum.auto()         # produces a visualization surface (present)


class BlockState(enum.Enum):
    """Block lifecycle states (reference flowgraph error isolation,
    src/flowgraph.cc:1059-1176)."""

    COMPLETE = "complete"
    INCOMPLETE = "incomplete"     # waiting on unresolved inputs / env keys
    ERRORED = "errored"


class DataType(enum.Enum):
    """The reference's 20 dtypes (memory/types.hh:56-307)."""

    F32 = "F32"
    F64 = "F64"
    I8 = "I8"
    I16 = "I16"
    I32 = "I32"
    I64 = "I64"
    U8 = "U8"
    U16 = "U16"
    U32 = "U32"
    U64 = "U64"
    CF32 = "CF32"
    CF64 = "CF64"
    CI8 = "CI8"
    CI16 = "CI16"
    CI32 = "CI32"
    CI64 = "CI64"
    CU8 = "CU8"
    CU16 = "CU16"
    CU32 = "CU32"
    CU64 = "CU64"

    # -- classification ----------------------------------------------------
    @property
    def is_complex(self) -> bool:
        return self.name.startswith("C")

    @property
    def is_float(self) -> bool:
        return self in (DataType.F32, DataType.F64, DataType.CF32, DataType.CF64)

    @property
    def is_signed(self) -> bool:
        base = self.name[1:] if self.is_complex else self.name
        return base.startswith(("F", "I"))

    @property
    def real_dtype(self) -> "DataType":
        """CF32 -> F32 etc.; real types map to themselves."""
        if not self.is_complex:
            return self
        return DataType(self.name[1:])

    @property
    def complex_dtype(self) -> "DataType":
        if self.is_complex:
            return self
        return DataType("C" + self.name)

    @property
    def element_size(self) -> int:
        base = self.name[1:] if self.is_complex else self.name
        bits = int(base[1:])
        return (bits // 8) * (2 if self.is_complex else 1)

    # -- numpy / jax mapping (tables defined at module scope below) --------
    @property
    def np_dtype(self) -> np.dtype:
        return np.dtype(_NP_MAP[self])

    @property
    def jnp_dtype(self):
        """The dtype arrays of this DataType carry on-device.  Complex
        integer types are stored as their complex-float container (XLA has
        no complex-int); the DataType on the TensorSpec preserves intent."""
        d = _JNP_MAP[self]
        if d is None:
            raise TypeError(f"{self} has no native jax dtype")
        return d

    @classmethod
    def parse(cls, s: "str | DataType | np.dtype") -> "DataType":
        if isinstance(s, DataType):
            return s
        if isinstance(s, (np.dtype, type)):
            return cls.from_np(np.dtype(s))
        return cls(str(s).strip().upper())

    @classmethod
    def from_np(cls, d: np.dtype) -> "DataType":
        d = np.dtype(d)
        for k, v in _NP_MAP.items():
            if np.dtype(v) == d:
                return k
        raise ValueError(f"no DataType for numpy dtype {d}")


_NP_MAP = {
    DataType.F32: np.float32,
    DataType.F64: np.float64,
    DataType.I8: np.int8,
    DataType.I16: np.int16,
    DataType.I32: np.int32,
    DataType.I64: np.int64,
    DataType.U8: np.uint8,
    DataType.U16: np.uint16,
    DataType.U32: np.uint32,
    DataType.U64: np.uint64,
    DataType.CF32: np.complex64,
    DataType.CF64: np.complex128,
    # complex integers: numpy has no native type; use structured-free
    # convention of complex float containers on host.
    DataType.CI8: np.complex64,
    DataType.CI16: np.complex64,
    DataType.CI32: np.complex128,
    DataType.CI64: np.complex128,
    DataType.CU8: np.complex64,
    DataType.CU16: np.complex64,
    DataType.CU32: np.complex128,
    DataType.CU64: np.complex128,
}

if _HAS_JAX:
    _JNP_MAP = {
        DataType.F32: jnp.float32,
        DataType.F64: jnp.float64,
        DataType.I8: jnp.int8,
        DataType.I16: jnp.int16,
        DataType.I32: jnp.int32,
        DataType.I64: jnp.int64,
        DataType.U8: jnp.uint8,
        DataType.U16: jnp.uint16,
        DataType.U32: jnp.uint32,
        DataType.U64: jnp.uint64,
        DataType.CF32: jnp.complex64,
        DataType.CF64: jnp.complex128,
        DataType.CI8: jnp.complex64,
        DataType.CI16: jnp.complex64,
        DataType.CI32: jnp.complex128,
        DataType.CI64: jnp.complex128,
        DataType.CU8: jnp.complex64,
        DataType.CU16: jnp.complex64,
        DataType.CU32: jnp.complex128,
        DataType.CU64: jnp.complex128,
    }
else:  # pragma: no cover
    _JNP_MAP = {k: None for k in DataType}


@dataclass(frozen=True)
class ComponentKey:
    """Registry key for a module implementation: (type, device, runtime,
    provider) — the reference's four-way key (registry.hh:119)."""

    type: str
    device: Device
    runtime: Runtime
    provider: str = "generic"

    def __str__(self) -> str:  # pragma: no cover - debugging aid
        return (
            f"{self.type}[{self.device.canonical()}/"
            f"{self.runtime.value}/{self.provider}]"
        )


class FrameworkError(RuntimeError):
    """Base error for graph-layer failures."""


class ValidationError(FrameworkError):
    """Module/block validate() rejected a configuration."""


class GraphError(FrameworkError):
    """Flowgraph structural errors (cycles, bad links, duplicate names)."""


class MissingInputError(ValidationError):
    """A required input port is not wired — the block is *waiting*
    (maps to Incomplete + retry, flowgraph.cc:1177), not broken."""
