"""Fast transcendental approximations.

``approx_log10`` replicates the reference's ``Backend::ApproxLog10``
(/root/reference/include/jetstream/backend/devices/cpu/helpers.hh:61-74,
the frexp + cubic-polynomial trick) with jnp bit operations — the same
numerics the reference's amplitude module produces, and far cheaper on
the VPU than an exact log.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def approx_log10(x: jnp.ndarray) -> jnp.ndarray:
    """log10(|x|) via exponent extraction + mantissa polynomial.
    Matches the reference ApproxLog10 to ~1e-4; x must be > 0."""
    xf = jnp.abs(x).astype(jnp.float32)
    bits = xf.view(jnp.int32) if hasattr(xf, "view") else \
        jnp.asarray(xf).view(jnp.int32)
    e = ((bits >> 23) & 0xFF) - 126                    # frexp exponent
    f_bits = (bits & 0x007FFFFF) | 0x3F000000          # mantissa [.5,1)
    f = f_bits.view(jnp.float32)
    y = jnp.float32(1.23149591368684)
    y = y * f + jnp.float32(-4.11852516267426)
    y = y * f + jnp.float32(6.02197014179219)
    y = y * f + jnp.float32(-3.13396450166353)
    y = y + e.astype(jnp.float32)
    return y * jnp.float32(0.3010299956639812)


def approx_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """Pade(7,6) tanh (Lambert continued fraction), clamped at |x|=4.5
    where tanh is within 2.5e-4 of saturation — transcendental free."""
    xc = jnp.clip(x, -4.5, 4.5)
    x2 = xc * xc
    num = xc * (135135.0 + x2 * (17325.0 + x2 * (378.0 + x2)))
    den = 135135.0 + x2 * (62370.0 + x2 * (3150.0 + x2 * 28.0))
    return num / den
