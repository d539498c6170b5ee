"""Window functions.

Reference: Blackman window in
/root/reference/src/domains/dsp/window/module_impl_native_cpu.cc:20-35
(coefficients 0.42 / 0.50 / 0.08, N-1 denominator, single-tap = 1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def blackman(size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Computed in float64 on host at trace time (it is a static
    constant folded into the compiled program)."""
    if size == 1:
        return jnp.ones((1,), dtype)
    n = np.arange(size, dtype=np.float64)
    tap = (0.42
           - 0.50 * np.cos(2.0 * np.pi * n / (size - 1))
           + 0.08 * np.cos(4.0 * np.pi * n / (size - 1)))
    return jnp.asarray(tap.astype(np.dtype(dtype) if not
                                  np.issubdtype(np.dtype(dtype),
                                                np.complexfloating)
                                  else np.float64)).astype(dtype)
