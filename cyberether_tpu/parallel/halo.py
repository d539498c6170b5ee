"""Explicit halo exchange for time-block sharding.

Overlap-save FIR across a time-sharded stream needs each shard's first
``taps-1`` samples from its left neighbour — the direct cognate of
ring/context-parallel halo patterns (SURVEY.md §5 long-context).  The
boundary samples move with ``jax.lax.ppermute`` over the ``time`` mesh
axis inside ``shard_map``; XLA schedules the permute on ICI and the
local convolutions overlap with it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec
from jax import shard_map


def halo_exchange_left(x: jnp.ndarray, halo: int, axis: int,
                       mesh_axis: str = "time") -> jnp.ndarray:
    """Inside shard_map: prepend the last ``halo`` samples of the LEFT
    neighbour's shard along ``axis``.  The first shard receives zeros
    (stream start — carried state handles real continuity).

    Returns an array extended by ``halo`` along ``axis``.
    """
    n_shards = jax.lax.psum(1, mesh_axis)
    tail = jax.lax.slice_in_dim(x, x.shape[axis] - halo, x.shape[axis],
                                axis=axis)
    # send my tail to my RIGHT neighbour == receive from LEFT
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    recv = jax.lax.ppermute(tail, mesh_axis, perm)
    idx = jax.lax.axis_index(mesh_axis)
    recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
    return jnp.concatenate([recv, x], axis=axis)


def overlap_save_sharded(mesh: Mesh, taps: jnp.ndarray,
                         time_axis: int = 0):
    """Build a sharded streaming FIR: the stream's time-block axis is
    sharded over the mesh 'time' axis; each shard convolves its block
    with a left halo of ``len(taps)-1`` samples exchanged via ppermute.

    Returns ``fn(x, carry) -> (y, new_carry)`` where ``x`` has shape
    (blocks, n) complex64, sharded on axis 0; ``carry`` is the global
    stream tail (taps-1,) feeding the very first shard.
    """
    ntaps = taps.shape[-1]
    halo = ntaps - 1

    def local_fir(x, carry):
        # x: (local_blocks, n); flatten to one local stream
        lb, n = x.shape
        flat = x.reshape(-1)
        ext = halo_exchange_left(flat[None, :], halo, 1)[0]
        idx = jax.lax.axis_index("time")
        # first shard: splice in the carried stream tail instead of 0s
        head = jnp.where(idx == 0, carry.astype(ext.dtype), ext[:halo])
        ext = jnp.concatenate([head, ext[halo:]])
        yr = jnp.convolve(jnp.real(ext), jnp.real(taps[::-1]), "valid") \
            - jnp.convolve(jnp.imag(ext), jnp.imag(taps[::-1]), "valid")
        yi = jnp.convolve(jnp.real(ext), jnp.imag(taps[::-1]), "valid") \
            + jnp.convolve(jnp.imag(ext), jnp.real(taps[::-1]), "valid")
        y = (yr + 1j * yi).astype(x.dtype).reshape(lb, n)
        # new carry: the LAST shard's tail, broadcast by collective
        tail = flat[-halo:]
        last = jax.lax.psum(
            jnp.where(idx == jax.lax.psum(1, "time") - 1, tail, 0.0),
            "time")
        return y, last.astype(carry.dtype)

    spec_x = PartitionSpec("time", None)
    fn = shard_map(
        local_fir, mesh=mesh,
        in_specs=(spec_x, PartitionSpec()),
        out_specs=(spec_x, PartitionSpec()))
    return fn
