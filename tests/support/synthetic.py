"""Synthetic fault-injection blocks for graph-semantics tests.

Mirrors the reference test fixtures
(/root/reference/tests/support/synthetic_graph.hh:20-50): fake
source/pass/merge/isolated/fault block types whose lifecycle hooks can be
made to fail on demand, so error/rollback paths are tested without real
kernels.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp

from cyberether_tpu.core.block import simple_block
from cyberether_tpu.core.module import Module
from cyberether_tpu.core.params import Field, Schema
from cyberether_tpu.core.registry import registry
from cyberether_tpu.core.tensor import SignalAxes, TensorSpec
from cyberether_tpu.core.types import DataType, Device, Runtime, Taint, \
    ValidationError

#: global fault switchboard: {block_name_substring: hook_name}
FAULTS: Dict[str, str] = {}

#: per-module execution counters (host modules only)
COUNTS: Dict[str, int] = {}


def reset() -> None:
    FAULTS.clear()
    COUNTS.clear()


def _maybe_fault(name: str, hook: str) -> None:
    for frag, h in FAULTS.items():
        if frag in name and h == hook:
            raise ValidationError(f"injected fault at {hook} in {name}")


class SynthSourceModule(Module):
    module_type = "synth_source"
    device = Device.CPU
    runtime = Runtime.HOST
    taints = Taint.HOST_SOURCE
    output_ports = ("out",)
    schema = Schema(Field("size", "int", 16))

    def validate(self) -> None:
        _maybe_fault(self.name, "validate")

    def create(self) -> Dict[str, TensorSpec]:
        _maybe_fault(self.name, "create")
        return {"out": TensorSpec((int(self.config["size"]),),
                                  DataType.F32, Device.CPU,
                                  SignalAxes(sample=0))}

    def host_poll(self):
        COUNTS[self.name] = COUNTS.get(self.name, 0) + 1
        return {"out": np.full(int(self.config["size"]),
                               float(COUNTS[self.name]), np.float32)}


class SynthPassModule(Module):
    module_type = "synth_pass"
    taints = Taint.STATELESS
    input_ports = ("in",)
    output_ports = ("out",)

    def validate(self) -> None:
        _maybe_fault(self.name, "validate")

    def create(self) -> Dict[str, TensorSpec]:
        _maybe_fault(self.name, "create")
        return {"out": self.input_specs["in"]}

    def apply(self, inputs, state):
        return {"out": inputs["in"] + 1.0}, state


class SynthMergeModule(Module):
    module_type = "synth_merge"
    taints = Taint.STATELESS
    input_ports = ("a", "b")
    output_ports = ("out",)

    def validate(self) -> None:
        _maybe_fault(self.name, "validate")

    def create(self) -> Dict[str, TensorSpec]:
        a, b = self.input_specs["a"], self.input_specs["b"]
        if a.shape != b.shape:
            raise ValidationError("merge shape mismatch")
        return {"out": a}

    def apply(self, inputs, state):
        return {"out": inputs["a"] + inputs["b"]}, state


class SynthStatefulModule(Module):
    """Counts compute cycles in device state."""

    module_type = "synth_stateful"
    input_ports = ("in",)
    output_ports = ("out",)

    def create(self) -> Dict[str, TensorSpec]:
        return {"out": self.input_specs["in"]}

    def init_state(self):
        return {"count": jnp.zeros((), jnp.float32)}

    def apply(self, inputs, state):
        c = state["count"] + 1.0
        return {"out": inputs["in"] + c}, {"count": c}


class SynthSinkModule(Module):
    module_type = "synth_sink"
    device = Device.CPU
    runtime = Runtime.HOST
    taints = Taint.HOST_SINK
    input_ports = ("in",)

    def create(self) -> Dict[str, TensorSpec]:
        return {}

    def host_start(self, ctx=None) -> None:
        self.received = []
        self.valid_flags = []

    def host_consume(self, outputs, valid) -> None:
        self.received.append(outputs["in"].copy())
        self.valid_flags.append(valid)


_registered = False


def register() -> None:
    global _registered
    if _registered:
        return
    _registered = True
    for cls in (SynthSourceModule, SynthPassModule, SynthMergeModule,
                SynthStatefulModule, SynthSinkModule):
        registry.register_module(cls)
        registry.register_block(simple_block(cls.module_type))
