"""Worker for the multi-host time-block ingest pipeline test/bench.

argv: proc_id num_procs port mode
mode = "check" (correctness: ordered reassembly vs single-process
reference over multiple sustained cycles) or "measure" (sustained
throughput JSON on stdout).

Each process owns 2 virtual CPU devices; the global mesh is
(time=2*num_procs, channels=1).
"""

import json
import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "check"

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
if num_procs > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_procs, process_id=proc_id)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from cyberether_tpu.models.channelizer import Channelizer
from cyberether_tpu.parallel.timeblock import TimeBlockPipeline

devs = np.array(jax.devices()).reshape(num_procs * 2, 1)
mesh = Mesh(devs, ("time", "channels"))

model = Channelizer(channels=8, taps_per_branch=4, audio_decim=4,
                    sample_rate=8e5)
frames = 512 if mode == "check" else 4096
pipe = TimeBlockPipeline(model, mesh, frames)

if mode == "check":
    cycles = 3
    full = model.make_input(frames * cycles, seed=31)

    def source(cycle, lo, hi):
        return full[cycle * frames + lo:cycle * frames + hi]

    blocks = pipe.run(source, cycles)
    from jax.experimental import multihost_utils

    mine = np.concatenate(blocks, axis=0)   # my time blocks, in order
    gathered = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(mine), tiled=False))    # (procs, cycles*local, C)
    if proc_id == 0:
        # ordered reassembly: (proc, cycle, local audio) -> stream
        # order is cycle-major, process-minor
        la = gathered.shape[1] // cycles
        g = gathered.reshape(num_procs, cycles, la, -1)
        stream = np.concatenate(
            [g[p, c] for c in range(cycles)
             for p in range(num_procs)], axis=0)
        # single-process sustained reference
        st = model.init_state()
        step = model.jitted_step()
        refs = []
        for c in range(cycles):
            a, st = step(st, jnp.asarray(
                full[c * frames:(c + 1) * frames]))
            refs.append(np.asarray(a))
        ref = np.concatenate(refs, axis=0)
        err = float(np.abs(stream - ref).max())
        print(f"TIMEBLOCK_OK err={err:.2e}", flush=True)
        assert err < 1e-4, err
else:
    stats = pipe.measure(cycles=8)
    if proc_id == 0:
        print("TIMEBLOCK_STATS " + json.dumps(stats), flush=True)
