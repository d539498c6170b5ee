"""TestContext — single-module test harness.

Reference: ``TestContext(moduleType, device, runtime, provider)`` builds
a one-module graph with setInput/setConfig/run/output
(/root/reference/include/jetstream/testing.hh:16-51, src/testing.cc).

Here it instantiates the module implementation directly, jits its
``apply``, and keeps state across ``run()`` calls so streaming modules
can be stepped.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from cyberether_tpu.core.module import Module, PASS_FLAG
from cyberether_tpu.core.registry import registry
from cyberether_tpu.core.scheduler import METRIC_PREFIX
from cyberether_tpu.core.tensor import SignalAxes, TensorSpec, spec_of
from cyberether_tpu.core.types import Device, Runtime


def default_axes(arr: np.ndarray) -> SignalAxes:
    """Convention for test inputs: rank-1 -> sample, rank-2 ->
    (batch, sample), rank>=3 -> (batch, channel, ..., sample)."""
    if arr.ndim == 1:
        return SignalAxes(sample=0)
    if arr.ndim == 2:
        return SignalAxes(batch=0, sample=1)
    return SignalAxes(batch=0, channel=1, sample=arr.ndim - 1)


class BlockTestContext:
    """Single-*block* test harness: instantiates a Block (composite or
    1:1), runs its internal module DAG in creation order under jit, and
    carries module state across ``run()`` calls."""

    __test__ = False

    def __init__(self, block_type: str,
                 config: Optional[Dict[str, Any]] = None,
                 device: Device = Device.TPU,
                 runtime: Runtime = Runtime.JAX,
                 provider: str = "generic"):
        self.block_type = block_type
        self.config = dict(config or {})
        self.device = device
        self.runtime = runtime
        self.provider = provider
        self._inputs: Dict[str, np.ndarray] = {}
        self._axes: Dict[str, SignalAxes] = {}
        self._attrs: Dict[str, Dict[str, Any]] = {}
        self._built = None
        self._states: Dict[str, Any] = {}
        self._outputs: Dict[str, Any] = {}

    def set_input(self, port: str, array: np.ndarray,
                  axes: Optional[SignalAxes] = None,
                  attrs: Optional[Dict[str, Any]] = None
                  ) -> "BlockTestContext":
        self._inputs[port] = np.asarray(array)
        if axes is not None:
            self._axes[port] = axes
        if attrs is not None:
            self._attrs[port] = dict(attrs)
        self._built = None
        return self

    def _build(self):
        if self._built is not None:
            return self._built
        from cyberether_tpu.core.block import PortRef

        cls = registry.build_block(self.block_type)
        blk = cls("blk", self.config, self.device, self.runtime,
                  self.provider)
        ext = {}
        for port, arr in self._inputs.items():
            axes = self._axes.get(port, default_axes(arr))
            spec = spec_of(arr, axes=axes,
                           attributes=self._attrs.get(port, {}),
                           device=self.device)
            ext[port] = (PortRef("__ext__", port), spec)
        self._built = blk.instantiate(ext)
        self._block = blk
        self._states = {}
        for name, mod in self._built.modules.items():
            st = mod.init_state()
            if st is not None:
                self._states[name] = jax.tree_util.tree_map(jnp.asarray,
                                                            st)
        return self._built

    def run(self, cycles: int = 1) -> "BlockTestContext":
        build = self._build()
        for _ in range(cycles):
            produced: Dict[str, Any] = {
                f"__ext__:{p}": jnp.asarray(v)
                for p, v in self._inputs.items()}
            for name, mod in build.modules.items():
                ins = {p: produced[f"{r.module}:{r.port}"]
                       for p, r in build.module_inputs[name].items()}
                outs, st = jax.jit(mod.apply)(ins,
                                              self._states.get(name))
                if name in self._states:
                    self._states[name] = st
                for port, val in outs.items():
                    if port != PASS_FLAG and not \
                            port.startswith(METRIC_PREFIX):
                        produced[f"{name}:{port}"] = val
            self._outputs = {
                p: produced[f"{r.module}:{r.port}"]
                for p, r in build.exposed.items()}
        return self

    def output(self, port: str) -> np.ndarray:
        return np.asarray(self._outputs[port])

    def output_spec(self, port: str) -> TensorSpec:
        build = self._build()
        ref = build.exposed[port]
        return build.modules[ref.module].output_specs[ref.port]


class TestContext:
    __test__ = False   # not a pytest class

    def __init__(self, module_type: str,
                 config: Optional[Dict[str, Any]] = None,
                 device: Device = Device.TPU,
                 runtime: Runtime = Runtime.JAX,
                 provider: str = "generic"):
        self.module_type = module_type
        self.config = dict(config or {})
        self.device = device
        self.runtime = runtime
        self.provider = provider
        self._inputs: Dict[str, np.ndarray] = {}
        self._axes: Dict[str, SignalAxes] = {}
        self._attrs: Dict[str, Dict[str, Any]] = {}
        self._module: Optional[Module] = None
        self._state: Any = None
        self._outputs: Dict[str, Any] = {}
        self.metrics: Dict[str, Any] = {}
        self.passed: Optional[bool] = None

    # -- builders -----------------------------------------------------------
    def set_input(self, port: str, array: np.ndarray,
                  axes: Optional[SignalAxes] = None,
                  attrs: Optional[Dict[str, Any]] = None) -> "TestContext":
        self._inputs[port] = np.asarray(array)
        if axes is not None:
            self._axes[port] = axes
        if attrs is not None:
            self._attrs[port] = dict(attrs)
        self._module = None
        return self

    def set_config(self, **config: Any) -> "TestContext":
        self.config.update(config)
        self._module = None
        return self

    # -- execution ----------------------------------------------------------
    def _build(self) -> Module:
        if self._module is not None:
            return self._module
        cls = registry.build_module(self.module_type, self.device,
                                    self.runtime, self.provider)
        specs = {}
        for port, arr in self._inputs.items():
            axes = self._axes.get(port, default_axes(arr))
            specs[port] = spec_of(arr, axes=axes,
                                  attributes=self._attrs.get(port, {}),
                                  device=self.device)
        self._module = cls("test/m", self.config, specs)
        self._state = self._module.init_state()
        if self._state is not None:
            self._state = jax.tree_util.tree_map(jnp.asarray, self._state)
        self._jitted = jax.jit(self._module.apply)
        return self._module

    def run(self, cycles: int = 1) -> "TestContext":
        mod = self._build()
        for _ in range(cycles):
            if mod.runtime is Runtime.HOST:
                outs = mod.host_poll() or {}
                self._outputs = dict(outs)
                continue
            from cyberether_tpu.utils.xfer import to_device

            ins = {p: to_device(v) for p, v in self._inputs.items()}
            outs, self._state = self._jitted(ins, self._state)
            self.metrics = {}
            self.passed = None
            for k in list(outs):
                if k == PASS_FLAG:
                    self.passed = bool(np.asarray(outs.pop(k)))
                elif k.startswith(METRIC_PREFIX):
                    self.metrics[k[len(METRIC_PREFIX):]] = np.asarray(
                        outs.pop(k))
            self._outputs = outs
        return self

    # -- inspection ---------------------------------------------------------
    def output(self, port: str) -> np.ndarray:
        from cyberether_tpu.utils.xfer import fetch

        return fetch(self._outputs[port])

    def output_spec(self, port: str) -> TensorSpec:
        return self._build().output_specs[port]

    @property
    def module(self) -> Module:
        return self._build()

    @property
    def state(self):
        return self._state
