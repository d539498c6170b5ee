"""Multi-host time-block ingest pipeline (BASELINE.md measured config
5: a 100 MS/s stream over N>=2 hosts).

The reference has no multi-node compute — its closest machinery is the
compute/present thread split pacing a host-local graph
(/root/reference/src/scheduler_synchronous.cc:698-748).  The TPU-native
equivalent is SPMD: every host runs this same program under
``jax.distributed``; each cycle,

1. **host-local ingest**: each host's source (SDR/file/socket) fills
   only its contiguous time block of the cycle's global buffer
   (``jax.make_array_from_process_local_data`` — no host ever
   materializes the full stream), so ingest bandwidth scales with N;
2. **collective step**: the jitted flagship step runs over the
   (time, channels) mesh; overlap-save history crosses cycle and shard
   boundaries explicitly (ppermute halos inside
   ``Channelizer.sharded_step_pallas``; GSPMD conv halos in
   ``sharded_step``);
3. **ordered reassembly**: audio shards are fetched host-side in
   stream order (each host holds its own time block of the output —
   the consumer can reassemble by cycle index + host offset without
   any re-sort).

``measure()`` reports sustained-cycle throughput with the same
differential methodology as bench.py (timing k vs 1 collective cycles
cancels dispatch+sync overhead), and ``scaling_efficiency`` compares
N-process against 1-process cycles/s.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cyberether_tpu.utils.logging import get_logger

log = get_logger("timeblock")


@dataclass
class TimeBlockPipeline:
    """Sustained multi-process streaming over a (time, channels) mesh.

    model: a Channelizer (or any object with ``init_state`` /
    ``sharded_step``-style factories); ``step_factory`` picks the
    collective step — default ``model.sharded_step(mesh)`` (XLA conv
    halos; works on CPU meshes), pass
    ``lambda m, mesh: m.sharded_step_pallas(mesh)`` on TPU.
    """

    model: Any
    mesh: Mesh
    frames_per_cycle: int
    step_factory: Optional[Callable[[Any, Mesh], Any]] = None
    #: use the v4/v5 fused-kernel state layout (sharded_step_pallas)
    pallas: bool = False
    _step: Any = field(init=False, default=None)
    _state: Any = field(init=False, default=None)

    def __post_init__(self):
        m, mesh = self.model, self.mesh
        if self.step_factory is not None:
            self._step = self.step_factory(m, mesh)
        elif self.pallas:
            self._step = m.sharded_step_pallas(mesh)
        else:
            self._step = m.sharded_step(mesh)
        init = m.init_state_v4() if self.pallas else m.init_state()
        self._state = jax.device_put(
            init, jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), init))
        n_t = mesh.shape["time"]
        if self.frames_per_cycle % n_t:
            raise ValueError(
                f"frames_per_cycle ({self.frames_per_cycle}) must "
                f"divide the mesh time axis ({n_t})")

    # ------------------------------------------------------------------
    @property
    def local_frames(self) -> Tuple[int, int]:
        """This process's [lo, hi) frame window within each cycle —
        what its ingest source must produce."""
        n_t = self.mesh.shape["time"]
        per_shard = self.frames_per_cycle // n_t
        shards = [d for d in np.asarray(self.mesh.devices)[:, 0]]
        mine = [i for i, d in enumerate(shards)
                if d.process_index == jax.process_index()]
        lo = min(mine) * per_shard
        hi = (max(mine) + 1) * per_shard
        return lo, hi

    def ingest(self, local_block: np.ndarray) -> jax.Array:
        """Assemble the cycle's global sharded buffer from this host's
        local time block."""
        C = self.model.channels
        shape = (self.frames_per_cycle, C, 2)
        sharding = NamedSharding(self.mesh, P("time", None, None))
        return jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(local_block), shape)

    def cycle(self, iq: jax.Array) -> jax.Array:
        """One collective step; returns the time-sharded audio."""
        audio, self._state = self._step(self._state, iq)
        return audio

    def run(self, source: Callable[[int, int, int], np.ndarray],
            cycles: int) -> list:
        """Sustained loop: ``source(cycle, lo, hi)`` -> local block.
        Returns this host's ordered audio blocks (one per cycle)."""
        lo, hi = self.local_frames
        out = []
        for i in range(cycles):
            audio = self.cycle(self.ingest(source(i, lo, hi)))
            out.append(self.local_audio(audio))
        return out

    def local_audio(self, audio: jax.Array) -> np.ndarray:
        """This host's time block of the audio, in stream order.

        Works for any output layout (time-sharded, channel-sharded,
        replicated): place every addressable shard by its global index,
        then carve out this host's frame window — the rows a host's
        ingest produced are always addressable on that host (time
        shards live where their input block lives; channel-sharded /
        replicated outputs hold all rows everywhere)."""
        out = np.zeros(audio.shape, audio.dtype)
        covered = np.zeros(audio.shape[0], bool)
        for s in audio.addressable_shards:
            out[s.index] = np.asarray(s.data)
            covered[s.index[0]] = True
        lo, hi = self.local_frames
        d = self.frames_per_cycle // audio.shape[0]
        if not covered[lo // d:hi // d].all():
            raise RuntimeError(
                "host does not hold its own time block — output "
                "sharding moved rows off their ingest host")
        return out[lo // d:hi // d]

    # ------------------------------------------------------------------
    def measure(self, cycles: int = 8, reps: int = 3) -> dict:
        """Sustained throughput, differential: device-resident input,
        (t_k - t_1)/(k - 1) over k collectively-run cycles."""
        rng = np.random.default_rng(jax.process_index())
        lo, hi = self.local_frames
        C = self.model.channels
        local = rng.standard_normal((hi - lo, C, 2)).astype(np.float32)
        iq = self.ingest(local)

        def run_k(k: int) -> float:
            jax.block_until_ready(self._state)
            t0 = time.perf_counter()
            audio = None
            for _ in range(k):
                audio = self.cycle(iq)
            jax.block_until_ready(audio)
            return time.perf_counter() - t0

        run_k(2)  # warm/compile
        t1 = min(run_k(1) for _ in range(reps))
        tk = min(run_k(cycles) for _ in range(reps))
        per = max((tk - t1) / (cycles - 1), 1e-9)
        samples = self.frames_per_cycle * C
        return {
            "processes": jax.process_count(),
            "mesh": dict(self.mesh.shape),
            "frames_per_cycle": self.frames_per_cycle,
            "cycles_per_s": 1.0 / per,
            "samples_per_s": samples / per,
            "ms_per_cycle": per * 1e3,
        }


def scaling_efficiency(rate_n: float, rate_1: float, n: int) -> float:
    """Scaling efficiency of an N-process rate vs the 1-process rate
    (>= 0.9 is the BASELINE 2-host target)."""
    return rate_n / (n * rate_1) if rate_1 > 0 else float("nan")


def measure_device_scaling(n_devices: int = 0, frames: int = 4096
                           ) -> dict:
    """In-process device-scaling measurement: the flagship pipeline on
    a 1-device mesh vs an ``n_devices`` 'time' mesh, with the
    efficiency number — the artifact-recordable form of the >=90%
    BASELINE target (VERDICT r3 item 8).  On the CPU-virtual mesh this
    is a scaling PROXY (one shared physical CPU); on real multi-chip
    hardware the same function reports true scaling."""
    from cyberether_tpu.models.channelizer import Channelizer
    from cyberether_tpu.parallel.mesh import make_mesh

    n = n_devices or len(jax.devices())
    model = Channelizer(channels=64, taps_per_branch=8,
                        audio_decim=16)
    stats = {}
    for label, t in (("1", 1), ("n", n)):
        mesh = make_mesh(time=t, channels=1)
        pipe = TimeBlockPipeline(model, mesh, frames * t)
        stats[label] = pipe.measure(cycles=4)
    eff = scaling_efficiency(stats["n"]["samples_per_s"],
                             stats["1"]["samples_per_s"], n)
    return {
        "n_devices": n,
        "samples_per_s_1dev": stats["1"]["samples_per_s"],
        "samples_per_s": stats["n"]["samples_per_s"],
        "frames_per_cycle": stats["n"]["frames_per_cycle"],
        "efficiency": eff,
    }


if __name__ == "__main__":
    import json as _json
    import sys as _sys

    out = measure_device_scaling()
    _sys.stdout.write("TIMEBLOCK_STATS " + _json.dumps(out) + "\n")
