"""Flowgraph — graph container with block lifecycle, link resolution,
YAML import/export, and error isolation.

Reference: /root/reference/src/flowgraph.cc (blockCreate:553,
blockConnect:849, blockReconfigure:933, resolveInputs:358, link regex
``${graph.X.output.Y}``:347, downstream propagation:650/989, incomplete
retry:1177, YAML import/export + v1->v2 migration:309/1253/1523) and
flowgraph_{environment,metadata,view}.cc.

TPU-first difference: instead of incrementally mutating a scheduler, any
structural mutation marks the graph dirty and the compiler
(:mod:`cyberether_tpu.core.scheduler`) rebuilds + re-jits the affected
program on the next compute; per-block error isolation falls out of
compiling only COMPLETE blocks.
"""

from __future__ import annotations

import re
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import yaml

from cyberether_tpu.core.block import Block, BlockBuild, PortRef
from cyberether_tpu.core.module import Module
from cyberether_tpu.core.registry import registry
from cyberether_tpu.core.tensor import TensorSpec
from cyberether_tpu.core.types import (
    BlockState,
    Device,
    GraphError,
    MissingInputError,
    Runtime,
    ValidationError,
)
from cyberether_tpu.utils.logging import get_logger

log = get_logger("flowgraph")

_LINK_RE = re.compile(r"\$\{graph\.([^.]+)\.output\.([^.]+)\}$")
_NAME_RE = re.compile(r"^[A-Za-z0-9_-]+$")


@dataclass
class BlockRecord:
    name: str
    type: str
    device: Device
    runtime: Runtime
    provider: str
    raw_config: Dict[str, Any]
    raw_inputs: Dict[str, str]           # port -> "${graph.X.output.Y}"
    meta: Dict[str, Any] = field(default_factory=dict)
    state: BlockState = BlockState.INCOMPLETE
    error: str = ""
    block: Optional[Block] = None
    build: Optional[BlockBuild] = None


class Environment:
    """Timestamped KV store travelling with the graph
    (flowgraph_environment.hh:17-88)."""

    def __init__(self) -> None:
        self._data: Dict[str, Tuple[Any, float]] = {}
        self._lock = threading.Lock()
        self._listeners: List[Any] = []

    def set(self, key: str, value: Any) -> None:
        with self._lock:
            self._data[key] = (value, time.time())
        for cb in list(self._listeners):
            cb(key, value)

    def get(self, key: str, default: Any = None) -> Any:
        with self._lock:
            item = self._data.get(key)
        return item[0] if item is not None else default

    def timestamp(self, key: str) -> Optional[float]:
        with self._lock:
            item = self._data.get(key)
        return item[1] if item is not None else None

    def contains(self, key: str) -> bool:
        with self._lock:
            return key in self._data

    def keys(self) -> List[str]:
        with self._lock:
            return sorted(self._data)

    def subscribe(self, cb) -> None:
        self._listeners.append(cb)


class Flowgraph:
    def __init__(self, name: str = "main",
                 default_device: Device = Device.TPU):
        self.name = name
        self.default_device = default_device
        self.records: Dict[str, BlockRecord] = {}
        self.order: List[str] = []           # insertion order of blocks
        self.metadata: Dict[str, Any] = {}   # title/summary/author/license/…
        self.environment = Environment()
        self._lock = threading.RLock()
        self._generation = 0                 # bumped on any mutation
        self._scheduler = None               # lazily built
        # env-key visibility changes retry incomplete blocks — the
        # reference's server-fed "elastic" pattern (flowgraph.cc:1177,
        # docs/metadata.md:33-49)
        self.environment.subscribe(self._on_env_change)

    def _on_env_change(self, key: str, value: Any) -> None:
        # the records check must run under the mutation lock: env.set
        # is thread-safe and server-fed, and iterating records while
        # another thread is inside block_create/destroy is a
        # dict-changed-size crash (r5 review finding)
        with self._lock:
            if any(rec.state == BlockState.INCOMPLETE
                   for rec in self.records.values()):
                self._retry_incomplete()
                self._invalidate()

    # ------------------------------------------------------------------
    # block lifecycle
    # ------------------------------------------------------------------
    def block_create(self, name: str, type: str,
                     config: Optional[Dict[str, Any]] = None,
                     inputs: Optional[Dict[str, str]] = None,
                     device: "Device | str | None" = None,
                     runtime: "Runtime | str | None" = None,
                     provider: str = "generic",
                     meta: Optional[Dict[str, Any]] = None) -> BlockRecord:
        with self._lock:
            if name in self.records:
                raise GraphError(f"block '{name}' already exists")
            if not _NAME_RE.match(name):
                # '/' collides with the flat module namespace (error
                # isolation derives the owner from the first '/'),
                # '.'/'$'/'{' can never be matched by the link regex —
                # both silently break the graph later (r5 review)
                raise GraphError(
                    f"invalid block name '{name}' (allowed: letters, "
                    "digits, _ and -)")
            if not registry.has_block(type):
                raise GraphError(f"unknown block type '{type}'")
            rec = BlockRecord(
                name=name, type=type,
                device=Device.parse(device) if device is not None
                else self.default_device,
                runtime=Runtime.parse(runtime) if runtime is not None
                else Runtime.JAX,
                provider=provider,
                raw_config=dict(config or {}),
                raw_inputs=dict(inputs or {}),
                meta=dict(meta or {}))
            self.records[name] = rec
            self.order.append(name)
            self._try_create(rec)
            self._retry_incomplete()
            self._invalidate()
            return rec

    def block_destroy(self, name: str) -> None:
        with self._lock:
            if name not in self.records:
                raise GraphError(f"block '{name}' does not exist")
            for dn in self._downstream(name):
                rec = self.records[dn]
                rec.state = BlockState.INCOMPLETE
                rec.block = None
                rec.build = None
            del self.records[name]
            self.order.remove(name)
            self._invalidate()

    def block_set_meta(self, name: str, meta: Dict[str, Any]) -> None:
        """Merge presentation metadata (node-editor layout etc.) into a
        block record — the ``meta.node`` channel of the YAML v2 schema
        (flowgraph.cc export of node positions).  Never recreates."""
        with self._lock:
            rec = self._require(name)
            rec.meta.update(meta)

    def block_set_view(self, name: str,
                       config: Dict[str, Any]) -> None:
        """Live view-parameter update (zoom/offset/...): applied in
        place to modules that declare the keys in ``view_fields``,
        WITHOUT recreating the block or rebuilding the scheduler —
        the reference's reload-free waterfall zoom/offset interaction
        (src/domains/visualization/waterfall/, compositor views).
        Raises for keys no module of the block declares as a view
        field (those need :meth:`block_reconfigure`)."""
        with self._lock:
            rec = self._require(name)
            if rec.build is None:
                raise GraphError(f"block '{name}' is not built")
            # validate the FULL key set (and decode) before mutating any
            # module config: a request mixing valid and unknown keys
            # must not leave live config diverged from raw_config
            plan = []
            applied: set = set()
            for mod in rec.build.modules.values():
                vf = getattr(mod, "view_fields", ())
                keys = [k for k in config if k in vf]
                if not keys:
                    continue
                decoded = mod.schema.decode(
                    {**mod.config,
                     **{k: config[k] for k in keys}})
                plan.append((mod, keys, decoded))
                applied.update(keys)
            unknown = set(config) - applied
            if unknown:
                raise GraphError(
                    f"not live view fields of '{name}': "
                    f"{sorted(unknown)}")
            for mod, keys, decoded in plan:
                for k in keys:
                    mod.config[k] = decoded[k]
                # keep the hash honest for any change-detection reader
                from cyberether_tpu.core.params import config_hash
                mod.config_hash = config_hash(mod.config)
            rec.raw_config.update({k: config[k] for k in applied})

    def block_connect(self, name: str, port: str, link: str) -> None:
        """Set/replace an input link; ``link`` is '${graph.X.output.Y}' or
        'X.Y' shorthand, or '' to disconnect."""
        with self._lock:
            rec = self._require(name)
            if link:
                rec.raw_inputs[port] = _normalize_link(link)
            else:
                rec.raw_inputs.pop(port, None)
            self._recreate_with_downstream(name)
            self._invalidate()

    def block_reconfigure(self, name: str,
                          config: Dict[str, Any]) -> None:
        """Apply a new config with rollback on failure
        (flowgraph.cc:933-1045)."""
        with self._lock:
            rec = self._require(name)
            old = dict(rec.raw_config)
            if dict(config) == old and \
                    rec.state == BlockState.COMPLETE:
                # change detection (the reference hashes configs for
                # exactly this): an identical config on a WORKING
                # block must not tear down downstream blocks and
                # force a recompile; broken blocks still rebuild
                # (retry-via-reconfigure)
                return
            was_complete = rec.state == BlockState.COMPLETE
            rec.raw_config = dict(config)
            try:
                self._recreate_with_downstream(name)
            except Exception:
                rec.raw_config = old
                self._recreate_with_downstream(name)
                raise
            if was_complete and rec.state != BlockState.COMPLETE:
                # rollback: restore the previous working config — both
                # ERRORED and a silent fall to INCOMPLETE count as
                # failure for a previously-working block
                # (flowgraph.cc:933-1045)
                error = rec.error
                rec.raw_config = old
                self._recreate_with_downstream(name)
                self._invalidate()
                raise GraphError(
                    f"reconfigure of '{name}' failed: {error}")
            self._invalidate()

    def block_state(self, name: str) -> BlockState:
        return self._require(name).state

    def block_error(self, name: str) -> str:
        return self._require(name).error

    # ------------------------------------------------------------------
    # creation machinery
    # ------------------------------------------------------------------
    def _require(self, name: str) -> BlockRecord:
        if name not in self.records:
            raise GraphError(f"block '{name}' does not exist")
        return self.records[name]

    def _resolve_inputs(self, rec: BlockRecord
                        ) -> Optional[Dict[str, Tuple[PortRef, TensorSpec]]]:
        """Resolve raw input strings to (PortRef, spec); None if any
        producer is not ready (-> INCOMPLETE)."""
        resolved: Dict[str, Tuple[PortRef, TensorSpec]] = {}
        for port, raw in rec.raw_inputs.items():
            m = _LINK_RE.match(raw.strip())
            if not m:
                rec.error = f"input '{port}' has invalid link '{raw}'"
                return None
            producer, out_port = m.group(1), m.group(2)
            if producer not in self.records:
                rec.error = f"input '{port}' references missing block " \
                            f"'{producer}'"
                return None
            prec = self.records[producer]
            if prec.state != BlockState.COMPLETE or prec.build is None:
                rec.error = f"producer '{producer}' not ready"
                return None
            if out_port not in prec.build.exposed:
                rec.error = f"producer '{producer}' has no output " \
                            f"'{out_port}'"
                return None
            ref = prec.build.exposed[out_port]
            spec = prec.build.modules[ref.module].output_specs[ref.port]
            resolved[port] = (ref, spec)
        return resolved

    def _try_create(self, rec: BlockRecord) -> None:
        """Attempt to build the block; errors isolate to this block
        (flowgraph.cc:1059-1176)."""
        rec.error = ""
        resolved = self._resolve_inputs(rec)
        if resolved is None:
            rec.state = BlockState.INCOMPLETE
            rec.block = None
            rec.build = None
            return
        try:
            cls = registry.build_block(rec.type)
            blk = cls(rec.name, rec.raw_config, rec.device, rec.runtime,
                      rec.provider)
            blk.environment = self.environment  # env access for blocks
            # declared-but-unwired ports: the block is waiting, not
            # broken (reference: unconnected editor nodes are
            # Incomplete and retried, flowgraph.cc:1177)
            missing = [p for p in cls.input_ports
                       if p not in resolved]
            if missing:
                rec.state = BlockState.INCOMPLETE
                rec.error = "waiting for input(s): " + \
                    ", ".join(missing)
                rec.block = None
                rec.build = None
                return
            rec.build = blk.instantiate(resolved)
            rec.block = blk
            rec.state = BlockState.COMPLETE
        except MissingInputError as e:
            # unwired required port (module- or context-level): the
            # block waits for a connection instead of erroring
            rec.state = BlockState.INCOMPLETE
            rec.error = f"waiting: {e}"
            rec.block = None
            rec.build = None
        except (ValidationError, GraphError) as e:
            rec.state = BlockState.ERRORED
            rec.error = str(e)
            rec.block = None
            rec.build = None
            log.warning("block '%s' errored: %s", rec.name, e)
        except Exception as e:       # noqa: BLE001 — isolation contract
            # ANY construction failure must isolate to this block
            # (flowgraph.cc:1059-1176) — an escaping exception leaves
            # the graph half-mutated and crashes unrelated callers
            # (e.g. a thread inside environment.set) — r5 review
            rec.state = BlockState.ERRORED
            rec.error = f"{type(e).__name__}: {e}"
            rec.block = None
            rec.build = None
            log.exception("block '%s' errored (unexpected)", rec.name)

    def _downstream(self, name: str) -> List[str]:
        """All transitive consumers of ``name`` in insertion order
        (flowgraph.cc collectDownstream)."""
        consumers: Dict[str, List[str]] = {n: [] for n in self.records}
        for rec in self.records.values():
            for raw in rec.raw_inputs.values():
                m = _LINK_RE.match(raw.strip())
                if m and m.group(1) in consumers:
                    consumers[m.group(1)].append(rec.name)
        seen: set = set()
        stack = list(consumers.get(name, []))
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            stack.extend(consumers.get(cur, []))
        return [n for n in self.order if n in seen]

    def _recreate_with_downstream(self, name: str) -> None:
        rec = self._require(name)
        self._try_create(rec)
        # rebuild transitive consumers PRODUCER-FIRST: insertion order
        # can place a consumer before an intermediate producer, which
        # would re-resolve it against the producer's stale build and
        # leave it COMPLETE with stale specs (r5 review finding,
        # confirmed by repro)
        affected = self._downstream(name)
        aset = set(affected)
        deps = {}
        for n in affected:
            d = set()
            for raw in self.records[n].raw_inputs.values():
                m = _LINK_RE.match(raw.strip())
                if m and m.group(1) in aset:
                    d.add(m.group(1))
            deps[n] = d
        ordered: List[str] = []
        remaining = dict(deps)
        pos = {n: i for i, n in enumerate(self.order)}
        while remaining:
            ready = sorted((n for n, d in remaining.items() if not d),
                           key=pos.get)
            if not ready:          # cycle: fall back to insertion order
                ordered.extend(sorted(remaining, key=pos.get))
                break
            for n in ready:
                ordered.append(n)
                del remaining[n]
            for d in remaining.values():
                d.difference_update(ready)
        for dn in ordered:
            self._try_create(self.records[dn])
        self._retry_incomplete()

    def _retry_incomplete(self) -> None:
        """Re-attempt INCOMPLETE blocks until fixpoint
        (flowgraph.cc:1177 retryIncompleteBlocks)."""
        for _ in range(len(self.records) + 1):
            progressed = False
            for name in self.order:
                rec = self.records[name]
                if rec.state == BlockState.INCOMPLETE:
                    self._try_create(rec)
                    if rec.state == BlockState.COMPLETE:
                        progressed = True
            if not progressed:
                break

    def retry_incomplete_blocks(self) -> None:
        with self._lock:
            self._retry_incomplete()
            self._invalidate()

    def retry_errored_blocks(self) -> None:
        """Re-create blocks that errored at RUNTIME (transient device
        or backend failures — e.g. a dropped remote-compile response):
        flip them to incomplete and run the normal retry pass.  Blocks
        whose error was structural simply error again with the same
        diagnostic.  The reference keeps errored blocks parked until a
        reconfigure (flowgraph.cc:1059); a streaming deployment also
        needs recovery from failures that were never the block's
        fault."""
        with self._lock:
            for rec in self.records.values():
                if rec.state == BlockState.ERRORED:
                    rec.state = BlockState.INCOMPLETE
            self._retry_incomplete()
            self._invalidate()

    def mark_modules_errored(self, module_names, error: str) -> None:
        """Runtime-compute failure isolation: mark the owning blocks
        Errored (keeping their diagnostics), set downstream blocks
        Incomplete, and keep the rest of the graph running
        (flowgraph.cc:1059-1176 blockSetErroredFromModules)."""
        with self._lock:
            owners = {str(m).split("/", 1)[0] for m in module_names}
            for name in owners:
                rec = self.records.get(name)
                if rec is None:
                    continue
                rec.state = BlockState.ERRORED
                rec.error = error
                rec.block = None
                rec.build = None
                for dn in self._downstream(name):
                    drec = self.records[dn]
                    if drec.state == BlockState.COMPLETE:
                        drec.state = BlockState.INCOMPLETE
                        drec.error = f"producer '{name}' errored"
                        drec.block = None
                        drec.build = None
            self._invalidate()

    def _invalidate(self) -> None:
        self._generation += 1
        if self._scheduler is not None:
            self._scheduler.invalidate()

    # ------------------------------------------------------------------
    # flattened module graph (input to the compiler)
    # ------------------------------------------------------------------
    def flattened(self) -> Tuple[Dict[str, Module],
                                 Dict[str, Dict[str, PortRef]]]:
        """Return (modules, module_inputs) over all COMPLETE blocks, with
        cross-block links resolved to flattened PortRefs."""
        with self._lock:
            modules: Dict[str, Module] = {}
            module_inputs: Dict[str, Dict[str, PortRef]] = {}
            for name in self.order:
                rec = self.records[name]
                if rec.state != BlockState.COMPLETE or rec.build is None:
                    continue
                modules.update(rec.build.modules)
                for mname, ins in rec.build.module_inputs.items():
                    module_inputs[mname] = dict(ins)
            return modules, module_inputs

    # ------------------------------------------------------------------
    # scheduler / compute
    # ------------------------------------------------------------------
    @property
    def scheduler(self):
        from cyberether_tpu.core.scheduler import Scheduler

        if self._scheduler is None:
            with self._lock:           # first-use race (r5 review)
                if self._scheduler is None:
                    self._scheduler = Scheduler(self)
        return self._scheduler

    def set_mesh(self, mesh) -> None:
        """Execute this flowgraph's compiled segments over a device
        mesh (multi-chip; see cyberether_tpu.parallel)."""
        self.scheduler.set_mesh(mesh)

    def compute(self, timeout: Optional[float] = None) -> bool:
        """Run one compute cycle.  Returns True if work was done."""
        return self.scheduler.compute(timeout=timeout)

    def compute_burst(self, cycles: int,
                      timeout: Optional[float] = None) -> int:
        """Run ``cycles`` cycles as one scanned device dispatch per
        segment (see Scheduler.compute_burst)."""
        return self.scheduler.compute_burst(cycles, timeout=timeout)

    def present(self) -> Dict[str, Any]:
        # surface-only graphs (canvas/note panels) never compute; make
        # sure the scheduler classified surfaces before presenting.
        # Bounded to ONE attempt per graph generation: a failing build
        # must not be silently retried at the present-pump rate (each
        # attempt holds the run lock and, on axon, re-enters remote
        # compilation), and the failure is logged, not swallowed
        # (review finding, round 5).
        sch = self.scheduler
        if sch._dirty and \
                getattr(sch, "_present_build_gen", None) \
                != self._generation:
            sch._present_build_gen = self._generation
            try:
                sch._ensure_built()
            except Exception:
                log.exception("present-time scheduler build failed "
                              "(will retry on the next graph edit "
                              "or compute())")
        return sch.present()

    def start(self) -> None:
        self.scheduler.start_sources()

    def stop(self) -> None:
        if self._scheduler is not None:
            self._scheduler.stop_sources()

    # ------------------------------------------------------------------
    # checkpoint / resume: graph topology persists as YAML (to_yaml /
    # from_yaml); these persist the *streaming state* alongside it so a
    # long-running graph resumes exactly where it left off
    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        """Write topology (YAML) + streaming state (npz arrays) to a
        zip container at ``path``.  No pickle anywhere: arrays go
        through ``np.savez`` and the manifest is JSON, so loading an
        untrusted checkpoint never executes code."""
        import io
        import json
        import zipfile

        import jax
        import numpy as np

        self.scheduler.synchronize()
        snap = self.scheduler.state_snapshot()
        manifest = {"version": 1, "cycle": self.scheduler._cycle,
                    "modules": []}
        arrays: Dict[str, Any] = {}
        for mi, name in enumerate(sorted(snap)):
            leaves = jax.tree_util.tree_leaves(snap[name])
            manifest["modules"].append({"name": name,
                                        "leaves": len(leaves)})
            for li, leaf in enumerate(leaves):
                arrays[f"{mi}.{li}"] = np.asarray(leaf)
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        with zipfile.ZipFile(path, "w") as z:
            z.writestr("topology.yaml", self.to_yaml())
            z.writestr("manifest.json", json.dumps(manifest))
            z.writestr("state.npz", buf.getvalue())

    @classmethod
    def load_checkpoint(cls, path: str) -> "Flowgraph":
        """Rebuild the graph from a ``save_checkpoint`` container and
        restore its streaming state.  Leaves are unflattened against
        the rebuilt graph's own state structure (``np.load`` with
        pickle disabled), so nothing in the file is executable."""
        import io
        import json
        import zipfile

        import numpy as np

        with zipfile.ZipFile(path) as z:
            yaml_text = z.read("topology.yaml").decode("utf-8")
            manifest = json.loads(z.read("manifest.json"))
            npz = np.load(io.BytesIO(z.read("state.npz")),
                          allow_pickle=False)
        fg = cls.from_yaml(yaml_text)
        flat = {m["name"]: [npz[f"{mi}.{li}"]
                            for li in range(m["leaves"])]
                for mi, m in enumerate(manifest["modules"])}
        fg.scheduler.state_restore_flat(flat)
        return fg

    def restore_state(self, snapshot: Dict[str, Any]) -> None:
        self.scheduler.state_restore(snapshot)

    # ------------------------------------------------------------------
    # view (read-only snapshot, flowgraph_view.hh:18-94)
    # ------------------------------------------------------------------
    def view(self) -> Dict[str, Any]:
        with self._lock:
            out: Dict[str, Any] = {"name": self.name,
                                   "metadata": dict(self.metadata),
                                   "blocks": {}}
            for name in self.order:
                rec = self.records[name]
                entry: Dict[str, Any] = {
                    "type": rec.type,
                    "state": rec.state.value,
                    "error": rec.error,
                    "device": rec.device.canonical(),
                    "runtime": rec.runtime.value,
                    "provider": rec.provider,
                    "config": dict(rec.raw_config),
                    "inputs": dict(rec.raw_inputs),
                    "meta": dict(rec.meta),
                }
                if rec.build is not None:
                    entry["outputs"] = {
                        p: {
                            "shape": list(rec.build.modules[r.module]
                                          .output_specs[r.port].shape),
                            "dtype": rec.build.modules[r.module]
                            .output_specs[r.port].dtype.value,
                        }
                        for p, r in rec.build.exposed.items()}
                out["blocks"][name] = entry
            return out

    # ------------------------------------------------------------------
    # YAML import/export (v2 schema + v1 migration, flowgraph.cc:309/1253)
    # ------------------------------------------------------------------
    @classmethod
    def from_yaml(cls, text: str, name: str = "main",
                  default_device: Device = Device.TPU) -> "Flowgraph":
        try:
            root = yaml.safe_load(text)
        except yaml.YAMLError as e:
            raise GraphError(f"flowgraph YAML does not parse: {e}")
        if not isinstance(root, dict):
            raise GraphError("flowgraph YAML root must be a mapping")
        root = _migrate_v1_to_v2(root)
        version = str(root.get("version", ""))
        if version not in ("2", "2.0", "2.0.0"):
            raise GraphError(f"unsupported flowgraph version '{version}'")
        fg = cls(name=name, default_device=default_device)
        for key in ("title", "summary", "author", "license", "description"):
            if key in root:
                fg.metadata[key] = root[key]
        graph = root.get("graph", []) or []
        if not isinstance(graph, list):
            raise GraphError("flowgraph 'graph' must be a sequence")
        for e in graph:
            if not isinstance(e, dict) or \
                    not isinstance(e.get("name"), str):
                raise GraphError(
                    "every graph node must be a mapping with a "
                    f"string 'name' (got {e!r})")
        # producers-first topological creation (flowgraph.cc importFromFile)
        entries = {e["name"]: e for e in graph}
        created: set = set()
        remaining = list(graph)
        for _ in range(len(graph) + 1):
            progressed = False
            still: List[Dict[str, Any]] = []
            for e in remaining:
                deps = set()
                for raw in (e.get("input") or {}).values():
                    m = _LINK_RE.match(str(raw).strip())
                    if m and m.group(1) in entries:
                        deps.add(m.group(1))
                if deps <= created:
                    fg._create_from_entry(e)
                    created.add(e["name"])
                    progressed = True
                else:
                    still.append(e)
            remaining = still
            if not progressed:
                break
        for e in remaining:   # cyclic or dangling refs: create anyway,
            fg._create_from_entry(e)   # they settle to INCOMPLETE
        return fg

    def _create_from_entry(self, e: Dict[str, Any]) -> None:
        name = str(e.get("name", ""))
        try:
            self.block_create(
                name=name,
                type=str(e.get("module") or e.get("type")),
                config=e.get("config") or {},
                inputs={k: str(v) for k, v in (e.get("input") or {}).items()},
                device=e.get("device"),
                runtime=e.get("runtime"),
                provider=str(e.get("provider", "generic")),
                meta=e.get("meta") or {})
        except Exception as exc:      # noqa: BLE001 — import isolation
            # One bad entry (unknown type/device, malformed config)
            # must not kill the whole import OR be silently dropped:
            # an ERRORED placeholder keeps the user's node through a
            # load -> save roundtrip, like the reference's parked
            # errored blocks (r5 review finding, confirmed by repro).
            log.warning("import: block '%s' kept as errored "
                        "placeholder: %s", name, exc)
            if name and name not in self.records:
                with self._lock:
                    dev = self.default_device
                    try:
                        if e.get("device") is not None:
                            dev = Device.parse(e["device"])
                    except Exception:
                        pass
                    rec = BlockRecord(
                        name=name,
                        type=str(e.get("module") or e.get("type")),
                        device=dev, runtime=Runtime.JAX,
                        provider=str(e.get("provider", "generic")),
                        raw_config=dict(e.get("config") or {}),
                        raw_inputs={k: str(v) for k, v in
                                    (e.get("input") or {}).items()},
                        meta=dict(e.get("meta") or {}))
                    rec.state = BlockState.ERRORED
                    rec.error = str(exc)
                    self.records[name] = rec
                    self.order.append(name)
                    self._invalidate()

    def to_yaml(self) -> str:
        with self._lock:
            root: Dict[str, Any] = {"version": "2"}
            for key in ("title", "summary", "author", "license",
                        "description"):
                if key in self.metadata:
                    root[key] = self.metadata[key]
            graph: List[Dict[str, Any]] = []
            for name in self.order:
                rec = self.records[name]
                entry: Dict[str, Any] = {
                    "name": name,
                    "module": rec.type,
                    "device": rec.device.canonical(),
                    "runtime": rec.runtime.value,
                    "provider": rec.provider,
                }
                if rec.raw_config:
                    entry["config"] = rec.raw_config
                if rec.raw_inputs:
                    entry["input"] = rec.raw_inputs
                if rec.meta:
                    entry["meta"] = rec.meta
                graph.append(entry)
            root["graph"] = graph
            return yaml.safe_dump(root, sort_keys=False)

    @classmethod
    def from_file(cls, path: str, **kw: Any) -> "Flowgraph":
        with open(path, "r") as f:
            return cls.from_yaml(f.read(), **kw)

    def to_file(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_yaml())


def _normalize_link(link: str) -> str:
    link = link.strip()
    if _LINK_RE.match(link):
        return link
    if "." in link and "${" not in link:
        block, port = link.split(".", 1)
        out = f"${{graph.{block}.output.{port}}}"
        if not _LINK_RE.match(out):
            # a dotted port in the shorthand produces a string the
            # link regex can never match — fail at connect time, not
            # as a permanently-retried INCOMPLETE (r5 review finding)
            raise GraphError(f"invalid link syntax '{link}'")
        return out
    raise GraphError(f"invalid link syntax '{link}'")


def _migrate_v1_to_v2(root: Dict[str, Any]) -> Dict[str, Any]:
    """v1 ('1.0.0', graph as name->block map, 'protocolVersion') -> v2
    (flowgraph.cc:309 MigrateFlowgraphVersion100To200)."""
    root = dict(root)
    if "version" not in root and "protocolVersion" in root:
        root["version"] = root["protocolVersion"]
    if str(root.get("version")) != "1.0.0":
        return root
    graph = root.get("graph")
    if isinstance(graph, dict):
        seq = []
        for name, blk in graph.items():
            if not isinstance(blk, dict):
                raise GraphError(f"block '{name}' must serialize to a map")
            blk = dict(blk)
            blk["name"] = name
            seq.append(blk)
        root["graph"] = seq
    root["version"] = "2"
    root.pop("protocolVersion", None)
    return root
