"""Host<->device transfer helpers.

The axon TPU backend does not implement complex64 transfers in either
direction.  These helpers keep every boundary real: complex uploads go
as split re/im planes recombined on device; complex downloads split on
device and recombine on host.  On CPU/GPU they are plain pass-throughs
functionally.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def _combine(r, i):
    return (r + 1j * i).astype(jnp.complex64)


@jax.jit
def _split(a):
    # jnp.real/imag outputs can ALIAS the complex buffer, and a d2h of
    # an aliased view still trips the axon complex-transfer gap; stack
    # forces a fresh float32 buffer
    return jnp.stack([jnp.real(a).astype(jnp.float32),
                      jnp.imag(a).astype(jnp.float32)])


def to_device(value: Any):
    """Upload a host array; complex goes as split planes."""
    v = np.asarray(value)
    if np.iscomplexobj(v):
        return _combine(jnp.asarray(v.real.astype(np.float32)),
                        jnp.asarray(v.imag.astype(np.float32)))
    return jnp.asarray(v)


@jax.jit
def _materialize(x):
    """Force a fresh device buffer: axon cannot d2h a view that
    ALIASES another buffer (observed on an f32 validity scalar packed
    into a segment's output tuple alongside complex planes)."""
    if jnp.issubdtype(x.dtype, jnp.bool_):
        return jnp.logical_or(x, False)
    return x + jnp.zeros((), x.dtype)


def fetch(value: Any) -> np.ndarray:
    """Download a device array; complex comes back as split planes."""
    if isinstance(value, np.ndarray):
        return value
    if hasattr(value, "dtype") and \
            jnp.issubdtype(value.dtype, jnp.complexfloating):
        planes = np.asarray(_split(value))
        return (planes[0] + 1j * planes[1]).astype(np.complex64)
    try:
        return np.asarray(value)
    except jax.errors.JaxRuntimeError:
        if not isinstance(value, jax.Array):
            raise
        # aliased-view d2h gap: copy device-side, then download
        return np.asarray(_materialize(value))
