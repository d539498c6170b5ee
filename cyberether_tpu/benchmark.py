"""Per-component benchmark harness.

Reference: nanobench-based harness with per-module cases registered via
JST_BENCHMARKS (/root/reference/src/benchmark.cc:100-178,
include/jetstream/benchmark.hh:19-66; cases e.g.
src/domains/dsp/fft/module_benchmarks.cc: CF32-8192 / CF32-65536 /
F32-8192 / F32-65536), run with minEpochTime(100 ms) and emitted as
markdown/json/csv from ``cyberether benchmark [block] --format …``.

Here each case times the module's jitted ``apply`` (state threaded,
``block_until_ready``), with the same 100 ms minimum epoch.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from cyberether_tpu.core.registry import registry
from cyberether_tpu.core.tensor import SignalAxes
from cyberether_tpu.testing import TestContext

MIN_EPOCH_SECONDS = 0.1


@dataclass
class Case:
    component: str
    variant: str
    config: Dict[str, Any]
    inputs: Callable[[], Dict[str, np.ndarray]]
    axes: Dict[str, SignalAxes] = field(default_factory=dict)
    attrs: Dict[str, Dict[str, Any]] = field(default_factory=dict)
    provider: str = "generic"     # module provider key (xla/mxu/pallas)


@dataclass
class Measurement:
    component: str
    variant: str
    ops_per_sec: float
    ms_per_op: float
    samples_per_sec: float
    error_pct: float


def register_case(case: Case) -> None:
    """Register a benchmark case through the component Registry — the
    JST_BENCHMARKS cognate (reference include/jetstream/registry.hh:255,
    src/benchmark.cc:100-178).  The CLI, the editor's benchmark modal
    and the REST endpoint all list and run from this ONE source;
    plugin-origin cases unload with their plugin
    (registry.unregister_origin prunes per-CASE origins, so a plugin
    case attached to a builtin component unloads without taking the
    builtin entry with it)."""
    comp = case.component
    if comp not in registry.list_benchmarks():
        registry.register_benchmark(
            comp, lambda component=comp, **kw: run(component, **kw))
    case._registry_origin = registry._current_origin
    registry.benchmark(comp).cases.append(case)


def _all_cases() -> List[Case]:
    return [c for comp in registry.list_benchmarks()
            for c in registry.benchmark(comp).cases]


def list_components() -> List[str]:
    return [c for c in registry.list_benchmarks()
            if registry.benchmark(c).cases]


def run(component: Optional[str] = None,
        min_epoch: float = MIN_EPOCH_SECONDS) -> List[Measurement]:
    out: List[Measurement] = []
    for case in _all_cases():
        if component and case.component != component:
            continue
        out.append(_run_case(case, min_epoch))
    return out


def _run_case(case: Case, min_epoch: float) -> Measurement:
    ctx = TestContext(case.component, dict(case.config),
                      provider=case.provider)
    arrays = case.inputs()
    for port, arr in arrays.items():
        ctx.set_input(port, arr, axes=case.axes.get(port),
                      attrs=case.attrs.get(port))
    mod = ctx._build()
    jitted = ctx._jitted
    from cyberether_tpu.utils.xfer import to_device

    ins = {p: to_device(v) for p, v in arrays.items()}
    state = ctx._state
    # warmup/compile
    outs, state = jitted(ins, state)
    jax.block_until_ready(outs)

    samples = sum(int(np.prod(a.shape)) for a in arrays.values()) or \
        sum(int(np.prod(s.shape)) for s in mod.output_specs.values())

    epochs: List[float] = []
    total = 0.0
    while total < min_epoch or len(epochs) < 3:
        t0 = time.perf_counter()
        outs, state = jitted(ins, state)
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        epochs.append(dt)
        total += dt
        if len(epochs) > 10000:
            break
    med = float(np.median(epochs))
    err = float(np.std(epochs) / (np.mean(epochs) or 1.0)) * 100.0
    return Measurement(
        component=case.component, variant=case.variant,
        ops_per_sec=1.0 / med, ms_per_op=med * 1e3,
        samples_per_sec=samples / med, error_pct=err)


# ---------------------------------------------------------------------------
# output formats (benchmark.cc:170-178)
# ---------------------------------------------------------------------------
def format_results(results: List[Measurement], fmt: str = "markdown"
                   ) -> str:
    if fmt == "json":
        return json.dumps([m.__dict__ for m in results], indent=2)
    if fmt == "csv":
        lines = ["component,variant,ops_per_sec,ms_per_op,"
                 "samples_per_sec,error_pct"]
        for m in results:
            lines.append(f"{m.component},{m.variant},{m.ops_per_sec:.2f},"
                         f"{m.ms_per_op:.4f},{m.samples_per_sec:.0f},"
                         f"{m.error_pct:.1f}")
        return "\n".join(lines)
    # markdown
    lines = ["| component | variant | ops/s | ms/op | samples/s | err% |",
             "|---|---|---|---|---|---|"]
    for m in results:
        lines.append(
            f"| {m.component} | {m.variant} | {m.ops_per_sec:,.1f} "
            f"| {m.ms_per_op:.3f} | {m.samples_per_sec:,.0f} "
            f"| {m.error_pct:.1f} |")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# built-in cases (mirroring the reference's registered shapes)
# ---------------------------------------------------------------------------
def _cf32(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)


def _f32(n, seed=0):
    return np.random.default_rng(seed).standard_normal(n) \
        .astype(np.float32)


def _register_builtin() -> None:
    for n in (8192, 65536):
        register_case(Case("fft", f"CF32-{n}", {"forward": True},
                           lambda n=n: {"signal": _cf32(n)}))
        register_case(Case("fft", f"F32-{n}",
                           {"forward": True, "complexOutput": True},
                           lambda n=n: {"signal": _f32(n)}))
        register_case(Case("amplitude", f"CF32-{n}", {},
                           lambda n=n: {"signal": _cf32(n)}))
        register_case(Case("multiply", f"CF32-{n}", {},
                           lambda n=n: {"a": _cf32(n), "b": _cf32(n, 1)}))
        register_case(Case("agc", f"CF32-{n}", {},
                           lambda n=n: {"signal": _cf32(n)}))
        register_case(Case("fm", f"CF32-{n}", {"sampleRate": 2e6},
                           lambda n=n: {"signal": _cf32(n)}))
        register_case(Case("am", f"CF32-{n}", {},
                           lambda n=n: {"signal": _cf32(n)}))
        register_case(Case("invert", f"CF32-{n}", {},
                           lambda n=n: {"signal": _cf32(n)}))
        register_case(Case("cast", f"F32-{n}", {"outputType": "CF32"},
                           lambda n=n: {"buffer": _f32(n)}))
        register_case(Case("fold", f"CF32-{n}", {"size": 1024},
                           lambda n=n: {"buffer": _cf32(n)}))
    register_case(Case("window", "CF32-2048", {"size": 2048}, dict))
    register_case(Case("filter_taps", "101taps-8heads",
                       {"sampleRate": 2e6, "bandwidth": 200e3,
                        "center": [float(i * 1e5) for i in range(8)],
                        "taps": 101}, dict))
    register_case(Case("rrc_filter", "CF32-8192",
                       {"taps": 101, "sampleRate": 4e6,
                        "symbolRate": 1e6},
                       lambda: {"buffer": _cf32(8192)}))
    register_case(Case(
        "overlap_add", "CF32-8x8192", {},
        lambda: {"buffer": _cf32(8 * 8192).reshape(8, 8192),
                 "overlap": _cf32(8 * 50, 1).reshape(8, 50)},
    ))
    register_case(Case("pad", "CF32-65536", {"size": 512},
                       lambda: {"unpadded": _cf32(65536)}))
    register_case(Case("unpad", "CF32-65536", {"size": 512},
                       lambda: {"padded": _cf32(65536)}))
    register_case(Case("range", "F32-65536", {"min": -100, "max": 0},
                       lambda: {"signal": _f32(65536)}))
    register_case(Case("squelch", "CF32-65536", {},
                       lambda: {"signal": _cf32(65536)}))
    register_case(Case("arithmetic", "F32-64x1024",
                       {"operation": "add", "axis": 1},
                       lambda: {"buffer":
                                _f32(65536).reshape(64, 1024)}))
    register_case(Case("signal_generator", "CF32-65536",
                       {"signalType": "cosine",
                        "signalDataType": "CF32",
                        "bufferSize": 65536}, dict))
    register_case(Case("phase_correction", "CF32-8x8192",
                       {"phaseIncrement": 0.1},
                       lambda: {"signal":
                                _cf32(8 * 8192).reshape(8, 8192)}))
    register_case(Case("waterfall", "F32-8x2048", {"height": 512},
                       lambda: {"signal": np.abs(
                           _f32(8 * 2048).reshape(8, 2048))}))
    register_case(Case("lineplot", "F32-8x2048", {},
                       lambda: {"signal":
                                _f32(8 * 2048).reshape(8, 2048)}))
    register_case(Case("psk_demod", "CF32-8192",
                       {"sampleRate": 4e6, "symbolRate": 1e6},
                       lambda: {"signal": _cf32(8192)}))
    register_case(Case("comparator", "F32-65536", {},
                       lambda: {"input0": _f32(65536),
                                "input1": _f32(65536, 1)}))
    # provider variants (the reference registers per-provider module
    # implementations; these cover the mxu/pallas fast paths)
    for n in (4096, 8192):   # mxu radix-split needs two factors <= 128
        register_case(Case("fft", f"CF32-{n}-mxu", {"forward": True},
                           lambda n=n: {"signal": _cf32(n)},
                           provider="mxu"))
    for n in (2048, 4096):   # pallas ct5-structure FFT (m = 2^k)
        register_case(Case("fft", f"CF32-{n}-pallas",
                           {"forward": True},
                           lambda n=n: {"signal": _cf32(n)},
                           provider="pallas"))

    def _chan_in():
        return {"buffer": _f32(8192 * 64 * 2).reshape(8192, 64, 2)}

    register_case(Case("channelizer", "F32-8192x64-pallas",
                       {"tapsPerBranch": 8, "audioDecim": 16,
                        "tileM": 2048},
                       _chan_in, provider="pallas",
                       axes={"buffer": SignalAxes(sample=0, channel=1)}))

    def _wbfm_in():
        return {"buffer": _f32(1_280_000 * 2).reshape(1_280_000, 2)}

    register_case(Case("wbfm", "F32-1.28M-pallas", {},
                       _wbfm_in, provider="pallas",
                       axes={"buffer": SignalAxes(sample=0)}))

    def _spec_in():
        return {"buffer": _f32(512 * 2048 * 2).reshape(512, 2048, 2)}

    for bf16 in (False, True):
        register_case(Case("spectrum",
                           f"F32-512x2048-pallas{'-bf16' if bf16 else ''}",
                           {"bf16": bf16}, _spec_in,
                           provider="pallas",
                           axes={"buffer": SignalAxes(batch=0,
                                                      sample=1)}))


# builtin cases must carry the "builtin" origin even when this
# module is first imported from inside a plugin's
# registry.origin() context (a plugin unload would otherwise
# delete every builtin benchmark)
with registry.origin("builtin"):
    _register_builtin()
