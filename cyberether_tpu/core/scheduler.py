"""Scheduler — the flowgraph *compiler* and step runner.

Reference: the synchronous scheduler
(/root/reference/src/scheduler_synchronous.cc) performs Kahn topo-sort
(:574-655), partitions modules into segments by (device, runtime)
(:698-748), polls sources, settles static branches (:659-693), and
interprets each module's ``computeSubmit`` per cycle.

TPU-first redesign: the graph is *compiled*, not interpreted.

- Kahn topo-sort + cycle rejection (same semantics).
- Modules are assigned *stages*: host modules (sources/sinks/python) are
  singleton segments; maximal contiguous runs of JAX/Pallas modules fuse
  into ONE jitted program per stage (convex partition, so the condensed
  segment DAG stays acyclic).
- STATIC_OUTPUT modules whose inputs are static are evaluated once at
  build time and folded into the jitted programs as constants — the
  "static settlement" of the reference, performed by the tracer.
- Streaming state (FM/AGC/OLA history, …) is an explicit pytree threaded
  through the compiled step with buffer donation, so steady-state steps
  are allocation-free.
- Skip semantics (squelch) compile to validity flags: a module may emit a
  scalar bool ``PASS_FLAG``; downstream validity is AND-ed, stateful
  modules freeze their state on invalid cycles (``jnp.where``), and host
  sinks observe the flag.  This keeps control flow out of XLA while
  preserving the reference's SKIP propagation
  (scheduler_synchronous.cc:389-450).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Set, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from cyberether_tpu.core.block import PortRef
from cyberether_tpu.core.module import Module, PASS_FLAG
from cyberether_tpu.core.types import Device, GraphError, Runtime, Taint
from cyberether_tpu.utils.logging import get_logger
from cyberether_tpu.utils.xfer import fetch as _xla_fetch

log = get_logger("scheduler")

METRIC_PREFIX = "metric:"

# ---------------------------------------------------------------------------
# complex boundary codec
#
# The axon TPU backend cannot move complex64 across ANY executable
# boundary: h2d/d2h transfers are unimplemented AND a complex device
# array fed as an *argument* to another jitted program fails at execute
# time.  Complex values therefore only ever exist INSIDE a single
# program.  At every boundary (settled constants, segment outputs,
# streaming state between cycles) they travel as stacked float32
# re/im planes: tagged ``{"__planes__": (2, ...) f32}`` dicts for link
# values, realified leaves for state pytrees.
# ---------------------------------------------------------------------------
PLANES_KEY = "__planes__"


def _is_tagged(v: Any) -> bool:
    return isinstance(v, dict) and set(v.keys()) == {PLANES_KEY}


def _tag_complex(v):
    """Inside jit: complex value -> tagged stacked-f32 planes."""
    a = jnp.asarray(v)
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        return {PLANES_KEY: jnp.stack([jnp.real(a).astype(jnp.float32),
                                       jnp.imag(a).astype(jnp.float32)])}
    return v


def _untag(v):
    """Inside jit: tagged planes -> complex value."""
    if _is_tagged(v):
        p = v[PLANES_KEY]
        return (p[0] + 1j * p[1]).astype(jnp.complex64)
    return v


def _host_tag(v):
    """Host side: numpy complex -> tagged numpy planes (h2d-safe)."""
    a = np.asarray(v)
    if np.iscomplexobj(a):
        return {PLANES_KEY: np.stack([a.real, a.imag]).astype(np.float32)}
    return v


def _fetch_stacked(v) -> np.ndarray:
    """Host materialization of a cycle-stacked burst output (leading
    axis = cycle); tagged planes are (k, 2, ...)."""
    if _is_tagged(v):
        p = np.asarray(v[PLANES_KEY])
        return (p[:, 0] + 1j * p[:, 1]).astype(np.complex64)
    return np.asarray(v)


def _fetch(v) -> np.ndarray:
    """Host materialization that understands the tagged form."""
    if _is_tagged(v):
        p = np.asarray(v[PLANES_KEY])
        return (p[0] + 1j * p[1]).astype(np.complex64)
    return _xla_fetch(v)


def _realify_tree(tree, mask):
    """Complex state leaves -> stacked f32 planes (structure-preserving,
    works under trace)."""
    return jax.tree_util.tree_map(
        lambda v, c: jnp.stack([jnp.real(v).astype(jnp.float32),
                                jnp.imag(v).astype(jnp.float32)])
        if c else v, tree, mask)


def _complexify_tree(tree, mask):
    return jax.tree_util.tree_map(
        lambda v, c: (v[0] + 1j * v[1]).astype(jnp.complex64)
        if c else v, tree, mask)


def _state_mask(template):
    """Bool pytree marking complex leaves of an init_state template.
    Dtype inspection only — no transfer."""
    return jax.tree_util.tree_map(np.iscomplexobj, template)


def _upload_state(template):
    """init_state template -> device pytree in realified (planes)
    form.  Host complex leaves split on host so the upload is float32
    only; leaves that are ALREADY device arrays never round-trip
    through the host (np.asarray of a device complex leaf is
    UNIMPLEMENTED on axon — jnp-built init_states hit exactly that)."""
    def leaf(v):
        if isinstance(v, jax.Array):
            if jnp.issubdtype(v.dtype, jnp.complexfloating):
                from cyberether_tpu.utils.xfer import _split
                return _split(v)          # device-side planes
            return v
        a = np.asarray(v)
        if np.iscomplexobj(a):
            return jnp.asarray(
                np.stack([a.real, a.imag]).astype(np.float32))
        return jnp.asarray(a)
    return jax.tree_util.tree_map(leaf, template)


def _key(ref: PortRef) -> str:
    return f"{ref.module}:{ref.port}"


@dataclass
class Timing:
    """Per-segment timing snapshot (the reference's Module::Timing,
    include/jetstream/module.hh:25-31)."""

    cycles: int = 0
    last_ms: float = 0.0
    avg_ms: float = 0.0

    def record(self, ms: float) -> None:
        self.cycles += 1
        self.last_ms = ms
        self.avg_ms += (ms - self.avg_ms) / min(self.cycles, 100)


@dataclass
class DeviceSegment:
    index: int
    modules: List[str]
    ext_inputs: List[str]            # keys "module:port" produced elsewhere
    gates: List[str]                 # module names needing host gate flags
    out_keys: List[str]              # boundary outputs (consumed outside)
    state_modules: List[str]
    split_inputs: Set[str] = field(default_factory=set)  # complex-from-host
    devkey: str = "accel"            # "cpu" | "accel" partition key
    device0: Any = None              # explicit jax.Device when not default
    fn: Any = None                   # compiled step
    raw_fn: Any = None               # untraced python step (burst/scan)
    burst_fn: Any = None             # compiled lax.scan over cycles
    timing: Timing = field(default_factory=Timing)


@dataclass
class HostSegment:
    index: int
    module: str
    timing: Timing = field(default_factory=Timing)


class Scheduler:
    def __init__(self, flowgraph, mesh=None, out_shardings=None):
        self.fg = flowgraph
        self.mesh = mesh
        self._dirty = True
        self._spec_of_key: Dict[str, Any] = {}
        self._built_generation = -1
        # build products
        self._modules: Dict[str, Module] = {}
        self._inputs: Dict[str, Dict[str, PortRef]] = {}
        self._topo: List[str] = []
        self._segments: List[Any] = []
        self._static_values: Dict[str, Any] = {}   # "module:port" -> const
        self._settled: Set[str] = set()
        self._state: Dict[str, Any] = {}
        self._latest: Dict[str, Any] = {}          # boundary outputs
        self._valid: Dict[str, Any] = {}           # per-link validity
        # last array dispatched per device key — synchronize() blocks
        # only on these (in-order execution drains the rest)
        self._sync_anchor: Dict[str, Any] = {}
        self._flag_cache: Dict[Any, Any] = {}
        self._metrics: Dict[str, Dict[str, Any]] = {}
        self._sources: List[str] = []
        self._sinks: List[str] = []
        self._surfaces: List[str] = []
        self._throttled: List[str] = []
        self._gate_last_fire: Dict[str, float] = {}
        self._poll_pending: Dict[str, Any] = {}
        self._watched: Set[str] = set()
        # versioned h2d cache for host-source outputs: sources that
        # advertise host_output_version() skip the upload when the
        # buffer hasn't changed (dti free-running sources re-serve the
        # same numpy array every cycle; re-uploading dominates the
        # cycle on a tunneled backend)
        self._h2d_cache: Dict[str, Tuple[int, Any]] = {}
        self._started = False
        self._cycle = 0
        # serializes rebuilds against in-flight compute cycles — the
        # lockState halt protocol of the reference
        # (scheduler_synchronous.cc:849-884)
        self._run_lock = threading.RLock()

    # ------------------------------------------------------------------
    def invalidate(self) -> None:
        self._dirty = True

    def set_mesh(self, mesh) -> None:
        """Enable multi-chip execution: segment programs are jitted with
        shardings derived from each link's signal axes (batchAxis ->
        'time', channelAxis -> 'channels'); GSPMD inserts the
        collectives.  Pass None to return to single-device."""
        self.mesh = mesh
        self._dirty = True

    def _sharding_for_key(self, key: str):
        if self.mesh is None:
            return None
        spec = self._spec_of_key.get(key)
        if spec is None:
            return None
        from cyberether_tpu.parallel.mesh import spec_sharding

        return spec_sharding(self.mesh, spec)

    def _constrain(self, key: str, value):
        s = self._sharding_for_key(key)
        if s is None:
            return value
        return jax.lax.with_sharding_constraint(value, s)

    # ------------------------------------------------------------------
    # build: topo sort -> settle -> partition -> compile
    # ------------------------------------------------------------------
    def _ensure_built(self) -> None:
        if not self._dirty:
            return
        with self._run_lock:
            if not self._dirty:
                return
            self._build_locked()

    def _build_locked(self) -> None:
        # snapshot the graph generation BEFORE reading the graph: a
        # mutation (block_create on a live graph) can land while this
        # build runs on the compute thread — unconditionally clearing
        # _dirty at the end would LOSE that invalidate and the new
        # blocks would never enter the topo (observed: a throttled
        # branch added to a running instance never presented)
        gen_at_start = self.fg._generation
        self.stop_sources()
        self._modules, self._inputs = self.fg.flattened()
        self._spec_of_key = {
            f"{name}:{port}": spec
            for name, mod in self._modules.items()
            for port, spec in mod.output_specs.items()}
        self._topo = self._topo_sort()
        self._classify()
        self._h2d_cache.clear()
        self._settle_static()
        self._partition_and_compile()
        self._init_states()
        self._dirty = self.fg._generation != gen_at_start
        if self._started:
            self.start_sources()

    def _topo_sort(self) -> List[str]:
        """Kahn topo sort; raises on cycles
        (scheduler_synchronous.cc:574-655)."""
        indeg: Dict[str, int] = {m: 0 for m in self._modules}
        consumers: Dict[str, List[str]] = {m: [] for m in self._modules}
        for mname, ins in self._inputs.items():
            for ref in ins.values():
                if ref.module not in self._modules:
                    raise GraphError(
                        f"module '{mname}' links to missing '{ref.module}'")
                indeg[mname] += 1
                consumers[ref.module].append(mname)
        # stable order: flowgraph insertion order among ready nodes
        order_index = {m: i for i, m in enumerate(self._modules)}
        ready = sorted([m for m, d in indeg.items() if d == 0],
                       key=order_index.get)
        topo: List[str] = []
        while ready:
            cur = ready.pop(0)
            topo.append(cur)
            for nxt in consumers[cur]:
                indeg[nxt] -= 1
                if indeg[nxt] == 0:
                    ready.append(nxt)
            ready.sort(key=order_index.get)
        if len(topo) != len(self._modules):
            cyclic = sorted(set(self._modules) - set(topo))
            raise GraphError(f"flowgraph contains a cycle through {cyclic}")
        return topo

    def _classify(self) -> None:
        self._sources = [m for m in self._topo
                         if self._modules[m].is_source]
        self._sinks = [m for m in self._topo if self._modules[m].is_sink]
        self._surfaces = [m for m in self._topo
                          if self._modules[m].is_surface]
        self._throttled = [m for m in self._topo
                           if self._modules[m].taints & Taint.THROTTLED]

    def _settle_static(self) -> None:
        """Evaluate STATIC_OUTPUT modules with static inputs once; their
        outputs become trace-time constants
        (scheduler_synchronous.cc:659-693 static settlement)."""
        self._settled = set()
        self._static_values = {}
        for name in self._topo:
            mod = self._modules[name]
            ins = self._inputs.get(name, {})
            if mod.runtime is Runtime.HOST:
                continue
            # settle if STATIC_OUTPUT, or a stateless function of only
            # settled inputs (the reference's STATELESS derivation)
            stateless = bool(mod.taints & Taint.STATELESS) and \
                mod.init_state() is None and not mod.is_surface
            if not (mod.is_static or (stateless and ins)):
                continue
            if not all(r.module in self._settled for r in ins.values()):
                continue
            # complex settled inputs cross into the settle program as
            # tagged planes; complex outputs come back the same way —
            # complex64 must never cross an executable boundary on the
            # axon backend (transfers AND parameters are unimplemented)
            inputs = {p: _host_tag(self._static_values[_key(r)])
                      for p, r in ins.items()}

            def _settle_apply(tagged_ins, state, _mod=mod):
                outs, _ = _mod.apply(
                    {p: _untag(v) for p, v in tagged_ins.items()}, state)
                return {p: _tag_complex(v) for p, v in outs.items()
                        if p != PASS_FLAG
                        and not p.startswith(METRIC_PREFIX)}

            # a module that emits PASS_FLAG or metrics must NOT settle:
            # settled outputs are unconditionally valid and metric-free,
            # which would silently defeat a data-dependent gate (e.g.
            # squelch) — probe the output KEYS abstractly first
            def _probe(tagged_ins, state, _mod=mod):
                outs, _ = _mod.apply(
                    {p: _untag(v) for p, v in tagged_ins.items()},
                    state)
                return outs

            try:
                probe = jax.eval_shape(_probe, inputs,
                                       mod.init_state())
            except Exception:
                continue               # dynamic-only module
            if PASS_FLAG in probe or any(
                    p.startswith(METRIC_PREFIX) for p in probe):
                continue

            outputs = jax.jit(_settle_apply)(inputs, mod.init_state())
            for port, val in outputs.items():
                # settled values are stored HOST-side (numpy) so they
                # embed as literals when segments trace over them
                self._static_values[f"{name}:{port}"] = _fetch(val)
            self._settled.add(name)

    @staticmethod
    def _devkey(mod: Module) -> str:
        """Segment-partition device key (the reference partitions
        segments by (device, runtime) — scheduler_synchronous.cc:
        698-748).  Explicit ``device: cpu`` modules compile into their
        own segments jitted on the CPU backend; TPU/ANY modules fuse
        onto the default accelerator backend."""
        return "cpu" if mod.device is Device.CPU else "accel"

    def _stage_of(self) -> Dict[str, int]:
        """Convex stage assignment: device modules merge into the same
        stage unless separated by a host module or a device change
        (cpu-device vs accelerator-device programs never fuse)."""
        stage: Dict[str, int] = {}
        for name in self._topo:
            if name in self._settled:
                stage[name] = 0
                continue
            mod = self._modules[name]
            is_host = mod.runtime is Runtime.HOST
            s = 1
            for ref in self._inputs.get(name, {}).values():
                p = ref.module
                if p in self._settled:
                    continue
                pmod = self._modules[p]
                p_host = pmod.runtime is Runtime.HOST
                if p_host or is_host or \
                        self._devkey(pmod) != self._devkey(mod):
                    s = max(s, stage[p] + 1)
                else:
                    s = max(s, stage[p])
            stage[name] = s
        return stage

    def _partition_and_compile(self) -> None:
        stage = self._stage_of()
        self._segments = []
        # group device modules by (stage, device) — the reference
        # partitions segments by (device, runtime)
        # (scheduler_synchronous.cc:698-748); here cpu-device modules
        # compile into separate CPU-backend programs
        by_stage: Dict[Tuple[int, str], List[str]] = {}
        host_mods: List[Tuple[int, str]] = []
        for name in self._topo:
            if name in self._settled:
                continue
            mod = self._modules[name]
            if mod.runtime is Runtime.HOST:
                host_mods.append((stage[name], name))
            else:
                by_stage.setdefault(
                    (stage[name], self._devkey(mod)), []).append(name)
        items: List[Tuple[int, Any]] = []
        for (s, dev), mods in by_stage.items():
            items.append((s, ("device", dev, mods)))
        for s, name in host_mods:
            items.append((s, ("host", None, name)))
        items.sort(key=lambda t: (t[0], 0 if t[1][0] == "device" else 1))

        # which keys are consumed where
        seg_of_module: Dict[str, int] = {}
        idx = 0
        built: List[Any] = []
        for s, (kind, _dev, payload) in items:
            if kind == "device":
                for m in payload:
                    seg_of_module[m] = idx
            else:
                seg_of_module[payload] = idx
            idx += 1
        # boundary keys: a module output consumed by a different segment,
        # a sink, a surface/present path, a terminal (unconsumed) output,
        # or an explicitly watched probe
        consumed: Set[str] = set()
        needed: Set[str] = set()
        for mname, ins in self._inputs.items():
            for ref in ins.values():
                consumed.add(_key(ref))
                if ref.module in self._settled:
                    continue
                if seg_of_module.get(mname) != seg_of_module.get(ref.module):
                    needed.add(_key(ref))
        for name in self._surfaces:
            mod = self._modules[name]
            for port in mod.output_specs:
                needed.add(f"{name}:{port}")
        for name, mod in self._modules.items():
            if name in self._settled or mod.runtime is Runtime.HOST:
                continue
            for port in mod.output_specs:
                k = f"{name}:{port}"
                if k not in consumed:
                    needed.add(k)      # terminal output: keep observable
        needed.update(self._watched)

        idx = 0
        for s, (kind, dev, payload) in items:
            if kind == "device":
                seg = self._build_device_segment(idx, payload, needed,
                                                 devkey=dev)
            else:
                seg = HostSegment(index=idx, module=payload)
            built.append(seg)
            idx += 1
        self._segments = built

    def _build_device_segment(self, index: int, mods: List[str],
                              needed: Set[str],
                              devkey: str = "accel") -> DeviceSegment:
        mod_set = set(mods)
        ext: List[str] = []
        gates: List[str] = []
        # ext keys fed from HOST modules with complex dtype cross the
        # host->device boundary as stacked (2, ...) float32 planes and
        # recombine inside the program (axon rejects complex transfers)
        split_keys: Set[str] = set()
        for name in mods:
            for ref in self._inputs.get(name, {}).values():
                if ref.module in self._settled:
                    continue
                if ref.module not in mod_set:
                    k = _key(ref)
                    if k not in ext:
                        ext.append(k)
                    pmod = self._modules.get(ref.module)
                    spec = self._spec_of_key.get(k)
                    if (pmod is not None
                            and pmod.runtime is Runtime.HOST
                            and spec is not None
                            and spec.dtype.is_complex):
                        split_keys.add(k)
            if self._modules[name].taints & Taint.THROTTLED:
                gates.append(name)
        out_keys = sorted(k for k in needed
                          if k.split(":", 1)[0] in mod_set)
        state_modules = [m for m in mods
                         if self._modules[m].init_state() is not None]
        # complex state leaves cross cycles as stacked-f32 planes (the
        # boundary codec); masks record which leaves to recombine
        state_masks = {m: _state_mask(self._modules[m].init_state())
                       for m in state_modules}

        statics = dict(self._static_values)
        inputs_of = {m: dict(self._inputs.get(m, {})) for m in mods}
        modules = {m: self._modules[m] for m in mods}
        topo_local = [m for m in self._topo if m in mod_set]

        def _embed_static(v):
            # complex constants embed as split REAL literals combined
            # on device (axon-safe)
            if isinstance(v, np.ndarray) and np.iscomplexobj(v):
                return (jnp.asarray(v.real.astype(np.float32))
                        + 1j * jnp.asarray(v.imag.astype(np.float32))
                        ).astype(jnp.complex64)
            return jnp.asarray(v)

        def segment_fn(state: Dict[str, Any],
                       ext_vals: Dict[str, Any],
                       ext_valid: Dict[str, Any],
                       gate_flags: Dict[str, Any]):
            produced: Dict[str, Any] = {k: _embed_static(v)
                                        for k, v in statics.items()}
            for k, v in ext_vals.items():
                if k in split_keys:
                    v = (v[0] + 1j * v[1]).astype(jnp.complex64)
                else:
                    # complex outputs of an UPSTREAM device segment
                    # arrive as tagged planes (the boundary codec) —
                    # recombine them here, exactly like split host
                    # inputs (r5 review finding: a dict reaching
                    # mod.apply traced to a TypeError)
                    v = _untag(v)
                produced[k] = v
            valid: Dict[str, Any] = {k: jnp.asarray(True)
                                     for k in statics}
            # host-fed validity crosses as float32 (PRED-typed
            # transfers are unimplemented on axon); booleanize here
            valid.update({k: jnp.asarray(v) != 0
                          for k, v in ext_valid.items()})
            new_state: Dict[str, Any] = {}
            metrics: Dict[str, Dict[str, Any]] = {}
            for name in topo_local:
                mod = modules[name]
                ins = {p: produced[_key(r)]
                       for p, r in inputs_of[name].items()}
                v_in = jnp.asarray(True)
                for r in inputs_of[name].values():
                    v_in = jnp.logical_and(v_in, valid[_key(r)])
                if name in gate_flags:
                    v_in = jnp.logical_and(v_in,
                                           gate_flags[name] != 0)
                st_raw = state.get(name)        # realified (planes)
                mask = state_masks.get(name)
                st = None if st_raw is None else \
                    _complexify_tree(st_raw, mask)
                if self.mesh is not None and hasattr(mod,
                                                    "apply_mesh"):
                    # mesh-aware modules own their partitioning
                    # (shard_map + collectives — e.g. the channelizer's
                    # ppermute halo exchange); plain modules rely on
                    # GSPMD propagation from the boundary constraints
                    outs, st_new = mod.apply_mesh(ins, st, self.mesh)
                else:
                    outs, st_new = mod.apply(ins, st)
                if st_raw is not None:
                    # realify BEFORE the freeze-select so jnp.where
                    # only ever runs on float planes (complex select
                    # avoided at the boundary)
                    st_new_r = _realify_tree(st_new, mask)
                    new_state[name] = jax.tree_util.tree_map(
                        lambda n, o: jnp.where(v_in, n, o),
                        st_new_r, st_raw)
                v_out = v_in
                if PASS_FLAG in outs:
                    v_out = jnp.logical_and(
                        v_in, jnp.asarray(outs.pop(PASS_FLAG)))
                mmet = {}
                for port in list(outs):
                    if port.startswith(METRIC_PREFIX):
                        mmet[port[len(METRIC_PREFIX):]] = outs.pop(port)
                if mmet:
                    metrics[name] = mmet
                for port, val in outs.items():
                    k = f"{name}:{port}"
                    produced[k] = self._constrain(k, val)
                    valid[k] = v_out
            # complex outputs leave the program as tagged planes
            out_vals = {k: _tag_complex(produced[k]) for k in out_keys}
            # validity crosses segment/host boundaries as float32 —
            # PRED-typed transfers are another axon gap
            out_valid = {k: valid[k].astype(jnp.float32)
                         for k in out_keys}
            return out_vals, out_valid, new_state, metrics

        # NO donation on the per-cycle path: chaining donated buffers
        # through the tunneled backend measured 8.3 ms/dispatch vs
        # 0.46 undonated (tools/ablation/r4g_probe.py) — the donation
        # handshake forces a round trip.  Streaming state double-
        # buffers instead (KB..MB — cheap); the burst path keeps
        # donation since it pays the cost once per burst.
        fn = jax.jit(segment_fn)

        def burst_fn(state, ext_stack, ext_const, valid_stack,
                     gate_stack, cycles):
            # ONE dispatch for k cycles: scan the segment over stacked
            # source buffers (leading cycle axis).  Defeats per-call
            # dispatch latency; nothing the interpreting reference
            # scheduler could express.  ``ext_const`` holds inputs whose
            # source version did not change across the burst — they ride
            # the versioned h2d cache as a single device buffer instead
            # of a k-fold stacked upload.
            def body(st, xs):
                ev, vv, gf, _cyc = xs
                ev = dict(ev)
                ev.update(ext_const)
                out_vals, out_valid, new_state, metrics = \
                    segment_fn(st, ev, vv, gf)
                # scan carries the full state dict; keep untouched
                # modules' state flowing through
                carried = dict(st)
                carried.update(new_state)
                return carried, (out_vals, out_valid, metrics)

            # ``cycles`` guarantees the scan always has an xs leaf of
            # length k — a segment whose sources are all device-side
            # (e.g. signal_generator) has no stacked external inputs
            final, (outs, valids, mets) = jax.lax.scan(
                body, state,
                (ext_stack, valid_stack, gate_stack, cycles))
            return outs, valids, final, mets

        # explicit placement only when the segment's device differs
        # from the default backend: jit follows its (committed) args,
        # so _run_segment device_puts inputs onto device0 first
        device0 = None
        if devkey == "cpu" and jax.default_backend() != "cpu":
            device0 = jax.devices("cpu")[0]

        return DeviceSegment(index=index, modules=mods, ext_inputs=ext,
                             gates=gates, out_keys=out_keys,
                             state_modules=state_modules,
                             split_inputs=split_keys, devkey=devkey,
                             device0=device0, fn=fn,
                             raw_fn=segment_fn,
                             burst_fn=jax.jit(burst_fn,
                                              donate_argnums=(0,)))

    def _init_states(self) -> None:
        new_state: Dict[str, Any] = {}
        for name in self._topo:
            if name in self._settled:
                continue
            mod = self._modules[name]
            if mod.runtime is Runtime.HOST:
                continue
            if name in self._state and \
                    self._state_compatible(self._state[name], mod):
                new_state[name] = self._state[name]   # preserve across
                continue                              # rebuilds
            st = mod.init_state()
            if st is not None:
                new_state[name] = _upload_state(st)
        self._state = new_state

    @staticmethod
    def _state_compatible(old: Any, mod: Module) -> bool:
        """Shape/dtype compatibility against the module's state
        template, computed HOST-side: uploading the whole template
        (MB-scale histories, plus a _split dispatch per complex leaf)
        just to compare signatures cost real per-rebuild latency on
        the tunneled backend (r5 review finding)."""
        try:
            tmpl = mod.init_state()

            def sig(v):
                # mirror _upload_state's realification: a complex leaf
                # crosses as (2,)+shape float32 planes
                dt = np.dtype(getattr(v, "dtype", None)
                              or np.asarray(v).dtype)
                shape = tuple(getattr(v, "shape",
                                      np.shape(np.asarray(v))))
                if np.issubdtype(dt, np.complexfloating):
                    return (2,) + shape, np.dtype(np.float32)
                return shape, dt

            ol, od = jax.tree_util.tree_flatten(old)
            tl, td = jax.tree_util.tree_flatten(tmpl)
            if od != td:
                return False
            return all(
                (tuple(a.shape), np.dtype(a.dtype)) == sig(b)
                for a, b in zip(ol, tl))
        except Exception:
            return False

    # ------------------------------------------------------------------
    # runtime loop
    # ------------------------------------------------------------------
    def start_sources(self) -> None:
        self._ensure_built()
        self._started = True
        for name, mod in self._modules.items():
            if mod.runtime is Runtime.HOST:
                mod.host_start()

    def stop_sources(self) -> None:
        if not self._started:
            return
        for name in list(self._modules):
            mod = self._modules[name]
            if mod.runtime is Runtime.HOST:
                try:
                    mod.host_stop()
                except Exception:   # pragma: no cover
                    log.exception("host_stop failed for %s", name)
        self._started = False

    def _poll_sources(self, timeout: Optional[float]
                      ) -> Optional[Dict[str, Dict[str, Any]]]:
        """Wait for all host sources to have data (the Phase-2 source
        pacing of the reference).  Returns name -> outputs or None."""
        deadline = None if timeout is None else time.monotonic() + timeout
        # buffers polled on a PREVIOUS timed-out attempt are kept —
        # host_poll is destructive (ring/file reads), so dropping an
        # already-polled peer's buffer when another source times out
        # would silently lose its samples (r5 review finding)
        pending = self._poll_pending
        if set(pending) != set(self._sources):
            pending = {name: None for name in self._sources}
        self._poll_pending = pending
        wait = 0.0005
        while True:
            all_ready = True
            blocker = None
            for name in self._sources:
                if pending[name] is None:
                    out = self._modules[name].host_poll()
                    if out is None:
                        all_ready = False
                        blocker = name
                    else:
                        pending[name] = out
            if all_ready:
                self._poll_pending = {}
                return {k: v for k, v in pending.items()}
            if deadline is not None and time.monotonic() >= deadline:
                return None
            # prefer blocking IN the source (the reference's
            # CircularBuffer::waitForSize) over spinning; sources
            # without a wait hook get an exponential-backoff sleep
            waiter = getattr(self._modules[blocker], "host_wait", None)
            if waiter is not None:
                waiter(min(wait * 16, 0.05))
            else:
                time.sleep(wait)
            wait = min(wait * 2, 0.01)

    def _gate_flags_for(self, seg: DeviceSegment,
                        host: bool = False) -> Dict[str, Any]:
        """Gate flags as cached device scalars (per-cycle jit args) or
        — ``host=True`` (the burst stacking path) — plain host floats:
        np.full over a device scalar would be a blocking ~25 ms d2h
        fetch through the tunnel."""
        flags = {}
        now = time.monotonic()
        for name in seg.gates:
            mod = self._modules[name]
            period = float(mod.config.get("intervalMs")
                           or mod.config.get("periodMs", 100.0)) / 1e3
            last = self._gate_last_fire.get(name, 0.0)
            fire = (now - last) >= period
            if fire:
                self._gate_last_fire[name] = now
            flags[name] = np.float32(1.0 if fire else 0.0) if host \
                else self._flag_scalar(fire, seg.device0)
        return flags

    def _flag_scalar(self, value: bool, device0=None):
        """Cached on-device f32 flag (True/False) per device — flags
        are per-cycle jit arguments, and uploading a fresh host scalar
        every cycle costs a tunnel round trip each."""
        key = (bool(value), device0)
        hit = self._flag_cache.get(key)
        if hit is None:
            arr = np.float32(1.0 if value else 0.0)
            hit = jax.device_put(arr, device0) if device0 is not None \
                else jax.device_put(arr)
            self._flag_cache[key] = hit
        return hit

    def compute(self, timeout: Optional[float] = None) -> bool:
        """Run one full graph cycle (all segments in order).  Returns True
        if a cycle ran (Instance::compute analog)."""
        with self._run_lock:
            return self._compute_locked(timeout)

    def _compute_locked(self, timeout: Optional[float]) -> bool:
        self._ensure_built()
        if not self._topo:
            return False
        if not self._started:
            self.start_sources()

        src_out = self._poll_sources(timeout)
        if src_out is None:
            return False

        # feed source outputs as boundary values
        for name, outs in src_out.items():
            mod = self._modules[name]
            for port, val in outs.items():
                self._latest[f"{name}:{port}"] = val
                self._valid[f"{name}:{port}"] = True
            self._metrics.setdefault(name, {})

        for seg in self._segments:
            t0 = time.perf_counter()
            try:
                self._run_segment(seg)
            except Exception as e:
                # runtime failure isolation: the owning blocks error
                # out, the rest of the graph keeps running
                names = (seg.modules if isinstance(seg, DeviceSegment)
                         else [seg.module])
                log.exception("segment failed (%s)", names)
                self.fg.mark_modules_errored(
                    names, f"compute failed: {e}")
                return False
            seg.timing.record((time.perf_counter() - t0) * 1e3)
        self._cycle += 1
        return True

    # ------------------------------------------------------------------
    # burst execution: k cycles per dispatch
    # ------------------------------------------------------------------
    def compute_burst(self, cycles: int,
                      timeout: Optional[float] = None) -> int:
        """Run ``cycles`` graph cycles with ONE device dispatch per
        segment: the compiled segment is lax.scan-ned over stacked
        source buffers, so per-dispatch latency (milliseconds on
        tunneled backends) is paid once per burst instead of once per
        cycle.  Something an interpreting per-module scheduler cannot
        express — the graph is a compiler artifact here.

        Requires every host module to be a pure source or sink; graphs
        with host *compute* modules (python block) fall back to looping
        :meth:`compute`.  Throttle gates are evaluated once per burst.
        Returns the number of cycles completed."""
        with self._run_lock:
            self._ensure_built()
            if not self._topo:
                return 0
            if not self._started:
                self.start_sources()
            for name, mod in self._modules.items():
                if mod.runtime is Runtime.HOST and not mod.is_source \
                        and not mod.is_sink:
                    done = 0
                    for _ in range(cycles):
                        if not self._compute_locked(timeout):
                            break
                        done += 1
                    return done

            # 1) poll sources `cycles` times, stacking their outputs;
            # record each source's output version so unchanged buffers
            # can cross h2d once instead of k times
            stacks: Dict[str, List[np.ndarray]] = {}
            versions: Dict[str, List[Any]] = {}
            done = 0
            for _ in range(cycles):
                src_out = self._poll_sources(timeout)
                if src_out is None:
                    break
                for name, outs in src_out.items():
                    self._metrics.setdefault(name, {})
                    ver = self._modules[name].host_output_version()
                    for port, val in outs.items():
                        k = f"{name}:{port}"
                        stacks.setdefault(k, []).append(np.asarray(val))
                        versions.setdefault(k, []).append(ver)
                        self._latest[k] = val
                        self._valid[k] = True
                done += 1
            if done == 0:
                return 0

            burst_outs: Dict[str, Any] = {}
            burst_valid: Dict[str, Any] = {}
            for seg in self._segments:
                t0 = time.perf_counter()
                try:
                    if isinstance(seg, DeviceSegment):
                        self._run_segment_burst(seg, stacks, versions,
                                                done, burst_outs,
                                                burst_valid)
                    else:
                        self._run_host_burst(seg, stacks, done,
                                             burst_outs, burst_valid)
                except Exception as e:
                    names = (seg.modules
                             if isinstance(seg, DeviceSegment)
                             else [seg.module])
                    log.exception("burst segment failed (%s)", names)
                    self.fg.mark_modules_errored(
                        names, f"compute failed: {e}")
                    return 0
                seg.timing.record(
                    (time.perf_counter() - t0) * 1e3 / done)
            self._cycle += done
            return done

    def _split_planes(self, key: str, seg: DeviceSegment,
                      v: np.ndarray) -> np.ndarray:
        if key in seg.split_inputs and np.iscomplexobj(v):
            return np.stack([v.real.astype(np.float32),
                             v.imag.astype(np.float32)])
        return v

    def _run_segment_burst(self, seg: DeviceSegment,
                           stacks: Dict[str, List[np.ndarray]],
                           versions: Dict[str, List[Any]],
                           k: int, burst_outs: Dict[str, Any],
                           burst_valid: Dict[str, Any]) -> None:
        if any(key not in stacks and key not in self._latest
               and key not in burst_outs
               for key in seg.ext_inputs):
            for key in seg.out_keys:
                self._valid[key] = False
            return
        ext_stack: Dict[str, Any] = {}
        ext_const: Dict[str, Any] = {}
        valid_stack: Dict[str, Any] = {}
        for key in seg.ext_inputs:
            if key in burst_outs:
                # produced by an UPSTREAM device segment this burst:
                # feed its full (k, ...) stacked output (possibly
                # tagged planes) and per-cycle validity — falling back
                # to self._latest here broadcast the upstream LAST
                # cycle across all k (r5 review finding)
                ext_stack[key] = burst_outs[key]
                valid_stack[key] = burst_valid[key]
                continue
            vers = versions.get(key)
            same_ver = (vers is not None and vers[0] is not None
                        and all(v == vers[0] for v in vers))
            if key in stacks and not same_ver:
                vals = stacks[key]
                arr = np.stack([self._split_planes(key, seg, v)
                                for v in vals])
                arr = np.ascontiguousarray(arr)
                ext_stack[key] = arr if seg.device0 is None \
                    else jax.device_put(arr, seg.device0)
            else:
                # source version unchanged across the burst (or not
                # re-emitted): one h2d through the versioned cache, the
                # scan body broadcasts it per cycle on device.  The
                # cache check runs on the SOURCE shape so the complex
                # split (a full host copy) only ever runs on a miss.
                src_val = (stacks[key][0] if key in stacks
                           else np.asarray(self._latest[key]))
                ver = vers[0] if same_ver else None
                if ver is None:
                    src = self._modules.get(key.split(":", 1)[0])
                    ver = None if src is None \
                        else src.host_output_version()
                ck = (key, seg.devkey)
                if ver is not None and isinstance(src_val, np.ndarray):
                    hit = self._h2d_cache.get(ck)
                    if hit is not None and hit[0] == ver and \
                            hit[2] == src_val.shape:
                        val = hit[1]
                    else:
                        shape = src_val.shape
                        val = jax.device_put(
                            np.ascontiguousarray(
                                self._split_planes(key, seg,
                                                   src_val)),
                            seg.device0)
                        self._h2d_cache[ck] = (ver, val, shape)
                else:
                    val = self._split_planes(key, seg, src_val) \
                        if isinstance(src_val, np.ndarray) else src_val
                    if seg.device0 is not None:
                        val = jax.device_put(val, seg.device0)
                ext_const[key] = val
            vv = self._valid.get(key, True)
            valid_stack[key] = np.full(
                (k,), 1.0 if np.all(np.asarray(vv)) else 0.0,
                np.float32)
        flags = self._gate_flags_for(seg, host=True)
        # a fired throttle gate passes ONE cycle of the burst (cycle 0)
        # — broadcasting the flag would run the throttled module k
        # times per period instead of once (r5 review finding).
        # period <= 0 means "every evaluation": all cycles pass.
        gate_stack = {}
        for n, f in flags.items():
            gmod = self._modules[n]
            period = float(gmod.config.get("intervalMs")
                           or gmod.config.get("periodMs", 100.0))
            if f and period <= 0:
                arr = np.ones((k,), np.float32)
            else:
                arr = np.zeros((k,), np.float32)
                if f:
                    arr[0] = 1.0
            gate_stack[n] = arr
        state_sub = {m: self._state[m] for m in seg.state_modules
                     if m in self._state}
        if seg.device0 is not None:
            state_sub = jax.device_put(state_sub, seg.device0)
        outs, valids, final_state, mets = seg.burst_fn(
            state_sub, ext_stack, ext_const, valid_stack, gate_stack,
            np.zeros((k,), np.float32))
        burst_outs.update(outs)
        burst_valid.update(valids)
        for pool in (outs, final_state):
            leaves = jax.tree_util.tree_leaves(pool)
            if leaves:
                self._sync_anchor[seg.devkey] = leaves[-1]
                break
        last = jax.tree_util.tree_map(lambda a: a[-1], outs)
        self._latest.update(last)
        self._valid.update(
            {key: v[-1] for key, v in valids.items()})
        self._state.update(final_state)
        for mname, met in jax.tree_util.tree_map(
                lambda a: a[-1], mets).items():
            self._metrics[mname] = met

    def _run_host_burst(self, seg: HostSegment,
                        stacks: Dict[str, List[np.ndarray]],
                        k: int, burst_outs: Dict[str, Any],
                        burst_valid: Dict[str, Any]) -> None:
        name = seg.module
        mod = self._modules[name]
        if mod.is_source:
            return
        host_ins: Dict[str, Any] = {}
        valid = np.ones((k,), bool)
        for p, r in self._inputs.get(name, {}).items():
            key = _key(r)
            if key in burst_outs:
                host_ins[p] = _fetch_stacked(burst_outs[key])
                valid &= np.asarray(burst_valid[key]) != 0
            elif key in stacks:
                host_ins[p] = np.stack(stacks[key])
            elif key in self._static_values:
                v = np.asarray(self._static_values[key])
                host_ins[p] = np.broadcast_to(v, (k,) + v.shape)
            else:
                for port in mod.output_specs:
                    self._valid[f"{name}:{port}"] = False
                return
        for i in range(k):
            mod.host_consume({p: v[i] for p, v in host_ins.items()},
                             bool(valid[i]))

    def _run_segment(self, seg) -> None:
            if isinstance(seg, DeviceSegment):
                if any(k not in self._latest for k in seg.ext_inputs):
                    # an upstream host stage produced nothing yet this
                    # session: segment cannot run; mark outputs invalid
                    for k in seg.out_keys:
                        self._valid[k] = False
                    return
                ext_vals = {}
                ext_valid = {}
                for k in seg.ext_inputs:
                    val = self._latest[k]
                    src = self._modules.get(k.split(":", 1)[0])
                    ver = None if src is None \
                        else src.host_output_version()
                    ck = (k, seg.devkey)
                    if ver is not None and isinstance(val, np.ndarray):
                        # the cache check runs on the SOURCE shape,
                        # BEFORE the complex split — the split is a
                        # full host copy of the buffer (tens of ms at
                        # 64 MB) and must only ever run on a miss
                        # (r4g probe: splitting per cycle put the CF32
                        # flowgraph at 43.8 ms/cycle)
                        hit = self._h2d_cache.get(ck)
                        if hit is not None and hit[0] == ver and \
                                hit[2] == val.shape:
                            val = hit[1]
                        else:
                            shape = val.shape
                            val = jax.device_put(
                                self._split_planes(k, seg, val),
                                seg.device0)
                            self._h2d_cache[ck] = (ver, val, shape)
                    else:
                        if isinstance(val, np.ndarray):
                            val = self._split_planes(k, seg, val)
                        if seg.device0 is not None:
                            # cross-backend boundary (e.g. a
                            # tpu-segment output feeding a cpu-device
                            # segment)
                            val = jax.device_put(val, seg.device0)
                    ext_vals[k] = val
                    # keep device validity scalars on device — forcing
                    # them to host bools would sync the pipeline every
                    # cycle; host bools ride CACHED device scalars (a
                    # fresh np.float32 per call is a per-cycle h2d
                    # upload — real milliseconds through a tunneled
                    # backend)
                    v = self._valid.get(k, True)
                    ext_valid[k] = self._flag_scalar(bool(v),
                                                     seg.device0) \
                        if isinstance(v, bool) else v
                gate_flags = self._gate_flags_for(seg)
                state_sub = {m: self._state[m] for m in seg.state_modules
                             if m in self._state}
                if seg.device0 is not None:
                    state_sub = jax.device_put(state_sub, seg.device0)
                out_vals, out_valid, new_state, metrics = seg.fn(
                    state_sub, ext_vals, ext_valid, gate_flags)
                self._latest.update(out_vals)
                self._valid.update(out_valid)
                self._state.update(new_state)
                for pool in (out_vals, new_state):
                    leaves = jax.tree_util.tree_leaves(pool)
                    if leaves:
                        self._sync_anchor[seg.devkey] = leaves[-1]
                        break
                for mname, met in metrics.items():
                    self._metrics[mname] = met
            else:
                name = seg.module
                mod = self._modules[name]
                if mod.is_source:
                    pass  # already polled
                else:
                    ins = {}
                    v = True
                    for p, r in self._inputs.get(name, {}).items():
                        k = _key(r)
                        val = self._static_values.get(k,
                                                      self._latest.get(k))
                        if val is None:
                            v = False
                        ins[p] = val
                        v = v and bool(_fetch(
                            self._valid.get(k, True)))
                    if mod.is_sink:
                        if all(x is not None for x in ins.values()):
                            host_ins = {p: _fetch(x)
                                        for p, x in ins.items()}
                            mod.host_consume(host_ins, v)
                    elif hasattr(mod, "host_execute"):
                        # host compute module (e.g. the python block)
                        if v:
                            host_ins = {p: _fetch(x)
                                        for p, x in ins.items()}
                            outs = mod.host_execute(host_ins) or {}
                            for port, val in outs.items():
                                self._latest[f"{name}:{port}"] = val
                                self._valid[f"{name}:{port}"] = True
                            met = getattr(mod, "metrics", None)
                            if met:
                                self._metrics[name] = dict(met)
                        else:
                            for port in mod.output_specs:
                                self._valid[f"{name}:{port}"] = False
                    else:
                        if v:
                            outs = mod.host_poll() or {}
                            for port, val in outs.items():
                                self._latest[f"{name}:{port}"] = val
                                self._valid[f"{name}:{port}"] = True

    def synchronize(self) -> None:
        """Block until all dispatched device work is complete.

        PJRT executes programs in submission order per device, so
        blocking on the LAST value dispatched to each device drains the
        whole queue — one host<->device round trip per device instead
        of one per array (each round trip costs ~25 ms through the
        axon tunnel; the naive per-array loop took 270+ ms/cycle and
        dominated every flowgraph benchmark)."""
        for a in self._sync_anchor.values():
            if hasattr(a, "block_until_ready"):
                a.block_until_ready()
        self._sync_anchor.clear()

    # ------------------------------------------------------------------
    # present (SURFACE modules -> display data)
    # ------------------------------------------------------------------
    def present(self) -> Dict[str, Any]:
        """Fetch display data from surface modules without blocking the
        compute path (the reference's present never blocks compute)."""
        out: Dict[str, Any] = {}
        if self._dirty:
            return out
        # present runs on ITS OWN thread and must never block compute
        # (nor die when a rebuild on the compute thread swaps the
        # module tables mid-iteration) — snapshot, .get, and isolate
        # per-surface failures (r5 review finding)
        surfaces = list(self._surfaces)
        modules = self._modules
        for name in surfaces:
            mod = modules.get(name)
            if mod is None:
                continue
            try:
                outs = {}
                for port in mod.output_specs:
                    k = f"{name}:{port}"
                    if k in self._latest:
                        v = self._latest[k]
                        outs[port] = _fetch(v) if _is_tagged(v) else v
                if not outs and mod.output_specs:
                    continue   # outputs exist but nothing computed yet
                data = mod.present_data(outs, self._state.get(name))
            except KeyError:
                continue       # concurrent rebuild; next frame catches up
            except Exception:
                log.exception("present failed for %s", name)
                continue
            if data is not None:
                # display under the owning block's name (flat module
                # names are '<block>/<local>')
                display = name.split("/", 1)[0]
                if display in out:
                    display = name
                out[display] = data
        return out

    # ------------------------------------------------------------------
    # introspection
    # ------------------------------------------------------------------
    def metrics(self) -> Dict[str, Dict[str, Any]]:
        return {m: {k: np.asarray(v).item()
                    if np.asarray(v).ndim == 0 else np.asarray(v)
                    for k, v in met.items()}
                for m, met in self._metrics.items()}

    def timings(self) -> Dict[str, Timing]:
        self._ensure_built()
        out: Dict[str, Timing] = {}
        for seg in self._segments:
            key = (f"segment{seg.index}:" +
                   (seg.module if isinstance(seg, HostSegment)
                    else "+".join(seg.modules)))
            out[key] = seg.timing
        return out

    def watch(self, block_port: str) -> None:
        """Keep 'block.port' observable even when consumed inside a fused
        segment (testing/benchmark probe)."""
        self._ensure_built()
        block, port = block_port.split(".", 1)
        rec = self.fg.records.get(block)
        if rec is None or rec.build is None:
            raise GraphError(f"unknown block '{block}'")
        ref = rec.build.exposed.get(port)
        if ref is None:
            raise GraphError(f"block '{block}' has no output '{port}'")
        k = _key(ref)
        if k not in self._watched:
            self._watched.add(k)
            self._dirty = True

    def profile(self, iters: int = 5,
                normalize: bool = True) -> Dict[str, float]:
        """Per-module compute time attribution (ms).

        The fused segments hide per-module cost; this re-runs each
        device module's ``apply`` as its own jitted program against the
        graph's latest values — the analog of the reference's per-node
        ms/cycle display (runtime/native/cpu/impl.cc:117-134).  Run at
        least one ``compute`` first so inputs exist.

        Isolated re-jits do NOT see in-segment fusion, so their raw
        sum can disagree with the fused segment totals users also see
        (VERDICT r3 weak 6).  With ``normalize=True`` (default) each
        module's isolated time is used as a WEIGHT and rescaled so the
        modules of every device segment sum to that segment's measured
        per-cycle wall time (``seg.timing``) — per-node numbers then
        agree with the segment totals by construction, while keeping
        the isolated measurement's relative attribution.
        """
        self._ensure_built()
        out: Dict[str, float] = {}
        # interpret the graph module-by-module so every intermediate
        # link has a value, regardless of segment fusion
        vals: Dict[str, Any] = dict(self._static_values)
        vals.update(self._latest)
        for name in self._topo:
            mod = self._modules[name]
            if name in self._settled or mod.runtime is Runtime.HOST:
                continue
            ins = {}
            missing = False
            for port, ref in self._inputs.get(name, {}).items():
                v = vals.get(_key(ref))
                if v is None:
                    missing = True
                    break
                from cyberether_tpu.utils.xfer import to_device

                raw = _fetch(v) if _is_tagged(v) else v
                # device arrays stay on device: to_device would
                # round-trip through np.asarray — 25 ms per value on
                # axon and UNIMPLEMENTED for complex intermediates
                ins[port] = raw if isinstance(raw, jax.Array) \
                    else to_device(raw)
            if missing:
                continue
            st = self._state.get(name)      # realified at the boundary
            mask = None if st is None else _state_mask(mod.init_state())

            def _papply(i, s, _mod=mod, _mask=mask):
                return _mod.apply(
                    i, None if s is None
                    else _complexify_tree(s, _mask))

            fn = jax.jit(_papply)
            try:
                res = fn(ins, st)           # compile + warm
                jax.tree_util.tree_map(
                    lambda a: a.block_until_ready()
                    if hasattr(a, "block_until_ready") else a, res)
                t0 = time.perf_counter()
                for _ in range(iters):
                    res = fn(ins, st)
                jax.tree_util.tree_map(
                    lambda a: a.block_until_ready()
                    if hasattr(a, "block_until_ready") else a, res)
                out[name] = (time.perf_counter() - t0) / iters * 1e3
                for port, v in res[0].items():
                    if port != PASS_FLAG and \
                            not port.startswith(METRIC_PREFIX):
                        vals[f"{name}:{port}"] = v
            except Exception:   # pragma: no cover - diagnostic path
                log.exception("profile failed for %s", name)
        if normalize:
            for seg in self._segments:
                if not isinstance(seg, DeviceSegment):
                    continue
                total = seg.timing.avg_ms
                mods = [m for m in seg.modules if m in out]
                raw = sum(out[m] for m in mods)
                if total > 0 and raw > 0:
                    for m in mods:
                        out[m] = out[m] * total / raw
        return out

    def output(self, block_port: str) -> Optional[np.ndarray]:
        """Fetch the latest value of 'block.port' (testing/CLI aid)."""
        self._ensure_built()
        block, port = block_port.split(".", 1)
        rec = self.fg.records.get(block)
        if rec is None or rec.build is None:
            return None
        ref = rec.build.exposed.get(port)
        if ref is None:
            return None
        k = _key(ref)
        if k in self._static_values:
            return _fetch(self._static_values[k])
        if k in self._latest:
            return _fetch(self._latest[k])
        return None

    def output_valid(self, block_port: str) -> bool:
        block, port = block_port.split(".", 1)
        rec = self.fg.records.get(block)
        if rec is None or rec.build is None:
            return False
        ref = rec.build.exposed.get(port)
        if ref is None:
            return False
        return bool(np.asarray(self._valid.get(_key(ref), False)))

    # ------------------------------------------------------------------
    # checkpoint / resume (SURVEY.md §5: the reference has no compute
    # checkpointing; the TPU build adds it for the explicit streaming
    # state tensors — OLA history, FM phase, AGC gain, ...)
    # ------------------------------------------------------------------
    def state_snapshot(self) -> Dict[str, Any]:
        """Materialize all streaming module state to host numpy
        (complex leaves recombined from their realified planes).  The
        returned dict is picklable and feeds ``state_restore``."""
        self._ensure_built()
        snap: Dict[str, Any] = {}
        for name, st in self._state.items():
            mod = self._modules.get(name)
            if mod is None:
                continue
            mask = _state_mask(mod.init_state())

            def leaf(v, c):
                a = np.asarray(v)
                if c:
                    return (a[0] + 1j * a[1]).astype(np.complex64)
                return a

            snap[name] = jax.tree_util.tree_map(leaf, st, mask)
        return snap

    def state_restore_flat(self, flat: Dict[str, list]) -> None:
        """Restore from flattened per-module leaf lists (the pickle-free
        checkpoint container): leaves are unflattened against the
        CURRENT graph's state structure, so nothing in the file decides
        the tree shape.  Unknown module names are ignored."""
        self._ensure_built()
        snap: Dict[str, Any] = {}
        for name, leaves in flat.items():
            if name not in self._state:
                continue
            treedef = jax.tree_util.tree_structure(self._state[name])
            if treedef.num_leaves != len(leaves):
                raise GraphError(
                    f"checkpoint state for '{name}' has "
                    f"{len(leaves)} leaves; the graph expects "
                    f"{treedef.num_leaves}")
            snap[name] = jax.tree_util.tree_unflatten(treedef, leaves)
        self.state_restore(snap)

    def state_restore(self, snap: Dict[str, Any]) -> None:
        """Load a ``state_snapshot`` back into the running graph.
        Unknown module names are ignored (the graph may have changed);
        shape/dtype mismatches raise."""
        self._ensure_built()
        for name, st in snap.items():
            if name not in self._state:
                continue
            dev = _upload_state(st)
            cur, cd = jax.tree_util.tree_flatten(self._state[name])
            new, nd = jax.tree_util.tree_flatten(dev)
            if cd != nd or any(a.shape != b.shape or a.dtype != b.dtype
                               for a, b in zip(cur, new)):
                raise GraphError(
                    f"checkpoint state for '{name}' does not match the "
                    f"current graph (shape/dtype/structure)")
            self._state[name] = dev
