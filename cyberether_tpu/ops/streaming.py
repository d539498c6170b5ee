"""Streaming recurrences, TPU-style.

The reference's streaming kernels are sample-sequential C++ loops
(e.g. AM DC-blocker src/domains/dsp/am/module_impl_native_cpu.cc:70-85,
FM de-emphasis src/domains/dsp/fm/module_impl_native_cpu.cc).  A
sample-loop is the worst possible TPU program, so first-order linear
recurrences are evaluated with ``jax.lax.associative_scan`` — O(log n)
depth of full-width vector ops instead of O(n) scalar steps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def first_order_iir(x: jnp.ndarray, a, y0, axis: int = -1
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate ``y[n] = a * y[n-1] + x[n]`` along ``axis``.

    ``a`` is a scalar (or broadcastable) coefficient; ``y0`` is the value
    of ``y[-1]`` (carried state, broadcastable against ``x`` sans axis).

    Returns ``(y, y_last)`` where ``y_last`` is ``y`` at the final
    position of ``axis`` (the new carry), shaped like ``x`` with ``axis``
    removed.
    """
    axis = axis % x.ndim
    a_arr = jnp.broadcast_to(jnp.asarray(a, dtype=x.dtype), x.shape)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    A, B = jax.lax.associative_scan(combine, (a_arr, x), axis=axis)
    y0e = jnp.expand_dims(jnp.asarray(y0, dtype=x.dtype), axis) \
        if jnp.ndim(y0) != x.ndim else jnp.asarray(y0, dtype=x.dtype)
    y = A * y0e + B
    y_last = jax.lax.index_in_dim(y, x.shape[axis] - 1, axis=axis,
                                  keepdims=False)
    return y, y_last


def moving_sum(x: jnp.ndarray, window: int, axis: int = -1) -> jnp.ndarray:
    """Sliding-window sum over the valid region via cumulative sums:
    ``out[i] = sum(x[i : i+window])`` with ``c[-1] := 0``."""
    axis = axis % x.ndim
    n = x.shape[axis]
    c = jnp.cumsum(x, axis=axis)
    lead = jax.lax.slice_in_dim(c, window - 1, n, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
    if n > window:
        shifted = jnp.concatenate(
            [zero, jax.lax.slice_in_dim(c, 0, n - window, axis=axis)],
            axis=axis)
    else:
        shifted = zero
    return lead - shifted
