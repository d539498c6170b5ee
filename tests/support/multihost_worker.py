"""Worker for the two-process multi-host test.

Each process owns 2 virtual CPU devices; the global mesh is
(time=4, channels=1) over both processes.  Each host contributes its
local time-block of the input stream; the sharded channelizer step runs
collectively; process 0 prints a checksum of the gathered audio.
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=num_procs,
                           process_id=proc_id)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cyberether_tpu.models.channelizer import Channelizer

assert jax.process_count() == num_procs
devs = np.array(jax.devices()).reshape(num_procs * 2, 1)
mesh = Mesh(devs, ("time", "channels"))

model = Channelizer(channels=8, taps_per_branch=4, audio_decim=4,
                    sample_rate=8e5)
frames = 256
# deterministic global input; each host slices ITS local time block
full = model.make_input(frames, seed=21)
per_proc = frames // num_procs
local = full[proc_id * per_proc:(proc_id + 1) * per_proc]

sharding = NamedSharding(mesh, P("time", None, None))
iq = jax.make_array_from_process_local_data(sharding, local,
                                            full.shape)
state = jax.device_put(
    model.init_state(),
    jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()),
                           model.init_state()))
step = model.sharded_step(mesh)
audio, _ = step(state, iq)
from jax.experimental import multihost_utils

gathered = np.asarray(multihost_utils.process_allgather(audio,
                                                        tiled=True))
if proc_id == 0:
    # compare against the single-process reference
    ref, _ = model.jitted_step()(model.init_state(), jnp.asarray(full))
    err = float(np.abs(gathered - np.asarray(ref)).max())
    print(f"MULTIHOST_OK err={err:.2e}", flush=True)
    assert err < 1e-4
