"""dti — dynamic tensor import (the superluminal DMI block).

Reference: no-op compute exposing an externally-owned tensor as a graph
source (/root/reference/src/superluminal/dmi_module_impl_native_cpu.cc:17-22).
Here it is a host source that re-reads the attached numpy buffer each
cycle (``lm.update()`` marks it dirty for pacing parity).

Also: ``component`` — extract real/imag/amplitude/phase of a complex
buffer (the superluminal 'operation' selector).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax.numpy as jnp

from cyberether_tpu.core.block import simple_block
from cyberether_tpu.core.module import Module
from cyberether_tpu.core.params import Field, Schema
from cyberether_tpu.core.registry import register_block, register_module
from cyberether_tpu.core.tensor import SignalAxes, TensorSpec, spec_of
from cyberether_tpu.core.types import DataType, Device, Runtime, Taint, \
    ValidationError


@register_module
class DtiModule(Module):
    module_type = "dti"
    device = Device.CPU
    runtime = Runtime.HOST
    taints = Taint.HOST_SOURCE
    output_ports = ("buffer",)
    schema = Schema(
        Field("label", "str", ""),
        Field("shape", "list[int]", []),
        Field("dataType", "dtype", DataType.CF32))

    _buffer: Optional[np.ndarray] = None

    def validate(self) -> None:
        if self._buffer is None and not self.config["shape"]:
            # shape may come later via attach_buffer + flowgraph retry
            raise ValidationError(
                "dti requires an attached buffer or an explicit shape")

    def create(self) -> Dict[str, TensorSpec]:
        if self._buffer is not None:
            spec = spec_of(self._buffer, device=Device.CPU)
        else:
            spec = TensorSpec(tuple(self.config["shape"]),
                              DataType.parse(self.config["dataType"]),
                              Device.CPU)
        if spec.rank == 1:
            from dataclasses import replace

            spec = replace(spec, axes=SignalAxes(sample=0))
        elif spec.rank == 2:
            from dataclasses import replace

            spec = replace(spec, axes=SignalAxes(batch=0, sample=1))
        return {"buffer": spec}

    # -- external-buffer handling ------------------------------------------
    def attach_buffer(self, buf: np.ndarray) -> None:
        self._buffer = buf
        self._dirty = True
        self._ver = getattr(self, "_ver", 0) + 1

    def mark_dirty(self) -> None:
        self._dirty = True
        self._ver = getattr(self, "_ver", 0) + 1

    def host_start(self) -> None:
        self._dirty = True

    def host_output_version(self) -> int:
        """dti buffers are owned by the caller and only change via
        attach_buffer/mark_dirty — the scheduler keeps the uploaded
        copy until then (zero-copy cadence of the reference's dmi
        tensor, superluminal/base.cc dynamic memory import)."""
        return getattr(self, "_ver", 0)

    def host_poll(self) -> Optional[Dict[str, np.ndarray]]:
        if self._buffer is None:
            return None
        # free-running source: always supply the current buffer contents
        self._dirty = False
        return {"buffer": np.ascontiguousarray(self._buffer)}


register_block(simple_block("dti"))


@register_module
class ComponentModule(Module):
    module_type = "component"
    taints = Taint.STATELESS
    input_ports = ("buffer",)
    output_ports = ("buffer",)
    schema = Schema(Field("operation", "str", "amplitude"))

    def validate(self) -> None:
        if self.config["operation"] not in ("real", "imag", "amplitude",
                                            "phase"):
            raise ValidationError(
                f"unknown operation '{self.config['operation']}'")

    def create(self) -> Dict[str, TensorSpec]:
        return {"buffer": self.input_specs["buffer"]
                .with_dtype(DataType.F32)}

    def apply(self, inputs, state):
        x = inputs["buffer"]
        op = self.config["operation"]
        if op == "real":
            out = jnp.real(x)
        elif op == "imag":
            out = jnp.imag(x)
        elif op == "phase":
            out = jnp.angle(x)
        else:
            out = jnp.abs(x)
        return {"buffer": out.astype(jnp.float32)}, state


register_block(simple_block("component"))
