"""Mesh construction and spec->sharding rules.

Axis convention (BASELINE.json / SURVEY.md §2.6):

- ``time``     — time-block (data-parallel) axis: batches of IQ frames
- ``channels`` — channelizer head / filter-bank channel axis

A TensorSpec's signal axes map onto mesh axes: batchAxis -> 'time',
channelAxis -> 'channels'.  Collectives ride ICI: the GSPMD partitioner
inserts halo exchanges for convolutions along sharded time axes and
all-to-alls for channel<->time resharding around the filterbank FFT.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from cyberether_tpu.core.tensor import TensorSpec


def make_mesh(time: int = 1, channels: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (time, channels) mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = time * channels
    if len(devices) < need:
        raise ValueError(
            f"mesh {time}x{channels} needs {need} devices, "
            f"have {len(devices)}")
    arr = np.array(devices[:need]).reshape(time, channels)
    return Mesh(arr, ("time", "channels"))


def spec_sharding(mesh: Mesh, spec: TensorSpec) -> NamedSharding:
    """Derive a NamedSharding from a TensorSpec's signal axes."""
    parts: list = [None] * spec.rank
    if spec.axes.batch is not None and mesh.shape.get("time", 1) > 1:
        parts[spec.axes.batch] = "time"
    if spec.axes.channel is not None and \
            mesh.shape.get("channels", 1) > 1:
        parts[spec.axes.channel] = "channels"
    return NamedSharding(mesh, PartitionSpec(*parts))


def shard_array(mesh: Mesh, spec: TensorSpec, arr) -> jax.Array:
    return jax.device_put(arr, spec_sharding(mesh, spec))
