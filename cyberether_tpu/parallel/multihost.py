"""Multi-host execution: jax.distributed + host-local ingest shards.

BASELINE.md config 5: a 100 MS/s stream time-block-sharded over N>=2
hosts with halo exchange and spectral reductions.  The reference has no
multi-node compute (SURVEY.md §2.6); this is new capability.

Pattern:

- every host runs the same program under ``jax.distributed``;
- each host's SDR/file source fills ONLY its local time-block shard
  (``make_array_from_process_local_data``), so ingest bandwidth scales
  with hosts;
- the jitted step runs under a global mesh; overlap-save halos move via
  ``ppermute`` on the ``time`` axis (ICI within a slice, DCN across
  hosts) and spectral reductions via ``psum``;
- outputs needed host-side (audio, spectra) are resharded to
  host-local layouts before fetch.

On this single-host image the path is exercised with
``--xla_force_host_platform_device_count`` meshes (tests/models).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from cyberether_tpu.utils.logging import get_logger

log = get_logger("multihost")


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    coordinator = coordinator or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        log.info("single-process run (no coordinator configured)")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes
                          or os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(process_id or os.environ["JAX_PROCESS_ID"]))
    log.info("distributed: process %d/%d",
             jax.process_index(), jax.process_count())


def global_time_mesh(channels: int = 1) -> Mesh:
    """Mesh over ALL devices (all hosts): time-blocks × channels."""
    devs = np.array(jax.devices())
    time = len(devs) // channels
    return Mesh(devs[:time * channels].reshape(time, channels),
                ("time", "channels"))


def host_local_time_shard(mesh: Mesh, global_shape: Sequence[int],
                          local_block: np.ndarray) -> jax.Array:
    """Assemble a globally time-sharded array from this host's local
    ingest block (the multi-host source pattern: each host contributes
    its own contiguous time-block)."""
    sharding = NamedSharding(
        mesh, PartitionSpec("time", *([None] * (len(global_shape) - 1))))
    return jax.make_array_from_process_local_data(
        sharding, local_block, tuple(global_shape))


def reassemble_time_blocks(arr: jax.Array) -> np.ndarray:
    """Fetch a time-sharded result in order on this host (fully
    replicated or host-addressable shards)."""
    return np.asarray(jax.device_get(arr))
