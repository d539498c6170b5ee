"""Component registry.

Mirrors the reference Registry (/root/reference/src/registry.cc,
include/jetstream/registry.hh:20-131): modules keyed by
(type, device, runtime, provider); blocks keyed by type with per-module
requirement lists used to compute available (device, runtime, provider)
targets; example-flowgraph and benchmark registries; unregister support
for plugin reload.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Type

from cyberether_tpu.core.types import (
    ComponentKey,
    Device,
    GraphError,
    Runtime,
)


@dataclass(frozen=True)
class ModuleRequirement:
    """A block's dependency on a module type, possibly conditional on a
    config flag (registry.cc block->module requirement lists)."""

    type: str
    optional: bool = False


@dataclass
class BlockEntry:
    type: str
    cls: Type
    label: str = ""
    summary: str = ""
    requires: Tuple[ModuleRequirement, ...] = ()
    origin: str = "builtin"   # or plugin name


@dataclass
class ExampleEntry:
    name: str
    title: str
    yaml_text: str
    origin: str = "builtin"


@dataclass
class BenchmarkEntry:
    component: str
    runner: Callable[..., Any]
    origin: str = "builtin"
    #: benchmark cases attached to this component (the JST_BENCHMARKS
    #: cognate, reference include/jetstream/registry.hh:255) — the CLI,
    #: the editor's benchmark modal and the REST endpoint all list/run
    #: from this one source (cyberether_tpu/benchmark.py register_case)
    cases: List[Any] = field(default_factory=list)


class Registry:
    def __init__(self) -> None:
        self._modules: Dict[ComponentKey, Type] = {}
        self._blocks: Dict[str, BlockEntry] = {}
        self._examples: Dict[str, ExampleEntry] = {}
        self._benchmarks: Dict[str, BenchmarkEntry] = {}
        self._current_origin = "builtin"

    def origin(self, name: str):
        """Context manager: registrations inside are tagged with
        ``name`` (plugin load/unload bookkeeping, registry.cc)."""
        import contextlib

        @contextlib.contextmanager
        def _ctx():
            prev = self._current_origin
            self._current_origin = name
            try:
                yield
            finally:
                self._current_origin = prev

        return _ctx()

    # -- modules -----------------------------------------------------------
    def register_module(self, cls: Type,
                        origin: Optional[str] = None) -> Type:
        key = ComponentKey(cls.module_type, cls.device, cls.runtime,
                           getattr(cls, "provider", "generic"))
        if key in self._modules:
            raise GraphError(f"module already registered: {key}")
        self._modules[key] = cls
        cls._registry_origin = origin or self._current_origin
        return cls

    def build_module(self, type: str, device: Device | str = Device.TPU,
                     runtime: Runtime | str = Runtime.JAX,
                     provider: str = "generic") -> Type:
        device = Device.parse(device)
        runtime = Runtime.parse(runtime)
        key = ComponentKey(type, device, runtime, provider)
        if key in self._modules:
            return self._modules[key]
        # Fallbacks, in order of preference (the reference resolves through
        # the block's target list; here the graph compiler retargets):
        #   exact -> same type any provider -> same type TPU/JAX.
        candidates = [k for k in self._modules if k.type == type]
        if not candidates:
            raise GraphError(f"no module registered for type '{type}'")
        for k in candidates:
            if k.device == device and k.runtime == runtime:
                return self._modules[k]
        for k in candidates:
            if k.device == device:
                return self._modules[k]
        for pref_dev in (Device.TPU, Device.CPU):
            for k in candidates:
                if k.device == pref_dev:
                    return self._modules[k]
        return self._modules[candidates[0]]

    def list_modules(self, type: Optional[str] = None) -> List[ComponentKey]:
        return sorted((k for k in self._modules
                       if type is None or k.type == type),
                      key=lambda k: (k.type, k.device.value, k.runtime.value,
                                     k.provider))

    def has_module(self, type: str) -> bool:
        return any(k.type == type for k in self._modules)

    # -- blocks ------------------------------------------------------------
    def register_block(self, cls: Type,
                       origin: Optional[str] = None) -> Type:
        t = cls.block_type
        if t in self._blocks:
            raise GraphError(f"block already registered: '{t}'")
        self._blocks[t] = BlockEntry(
            type=t, cls=cls, label=getattr(cls, "label", t),
            summary=getattr(cls, "summary", ""),
            requires=tuple(getattr(cls, "requires", ())),
            origin=origin or self._current_origin)
        return cls

    def build_block(self, type: str) -> Type:
        if type not in self._blocks:
            raise GraphError(f"no block registered for type '{type}'")
        return self._blocks[type].cls

    def has_block(self, type: str) -> bool:
        return type in self._blocks

    def list_blocks(self) -> List[str]:
        return sorted(self._blocks)

    def block_entry(self, type: str) -> BlockEntry:
        return self._blocks[type]

    # -- examples / benchmarks --------------------------------------------
    def register_example(self, name: str, title: str, yaml_text: str,
                         origin: Optional[str] = None) -> None:
        self._examples[name] = ExampleEntry(
            name, title, yaml_text, origin or self._current_origin)

    def list_examples(self) -> List[str]:
        return sorted(self._examples)

    def example(self, name: str) -> ExampleEntry:
        return self._examples[name]

    def register_benchmark(self, component: str,
                           runner: Callable[..., Any],
                           origin: Optional[str] = None) -> None:
        self._benchmarks[component] = BenchmarkEntry(
            component, runner, origin or self._current_origin)

    def list_benchmarks(self) -> List[str]:
        return sorted(self._benchmarks)

    def benchmark(self, component: str) -> BenchmarkEntry:
        return self._benchmarks[component]

    # -- plugin unload (registry.cc unregister support) --------------------
    def unregister_origin(self, origin: str) -> int:
        removed = 0
        for table in (self._modules, self._blocks, self._examples,
                      self._benchmarks):
            doomed = [k for k, v in table.items()
                      if getattr(v, "origin", getattr(v, "_registry_origin",
                                                      "builtin")) == origin]
            for k in doomed:
                del table[k]
                removed += 1
        # benchmark CASES carry their own origin: a plugin case hung on
        # a builtin component's entry must unload without removing the
        # entry (its runner closure references unloaded plugin code)
        for entry in self._benchmarks.values():
            keep = [c for c in entry.cases
                    if getattr(c, "_registry_origin",
                               "builtin") != origin]
            removed += len(entry.cases) - len(keep)
            entry.cases[:] = keep
        return removed


registry = Registry()


def register_module(cls: Type) -> Type:
    """Decorator: ``@register_module`` on a Module subclass."""
    return registry.register_module(cls)


def register_block(cls: Type) -> Type:
    """Decorator: ``@register_block`` on a Block subclass."""
    return registry.register_block(cls)
