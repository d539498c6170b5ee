"""Window functions.

Reference: Blackman window in
/root/reference/src/domains/dsp/window/module_impl_native_cpu.cc:20-35
(coefficients 0.42 / 0.50 / 0.08, N-1 denominator, single-tap = 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def blackman(size: int, dtype=jnp.float32) -> jnp.ndarray:
    if size == 1:
        return jnp.ones((1,), dtype)
    n = jnp.arange(size, dtype=jnp.float64)
    tap = (0.42
           - 0.50 * jnp.cos(2.0 * jnp.pi * n / (size - 1))
           + 0.08 * jnp.cos(4.0 * jnp.pi * n / (size - 1)))
    return tap.astype(dtype)
