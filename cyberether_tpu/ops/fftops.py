"""FFT with pocketfft-compatible conventions.

The reference FFT module wraps pocketfft with ``fct = 1.0`` in BOTH
directions (unnormalized,
/root/reference/src/domains/dsp/fft/module_impl_native_cpu.cc:131-168)
and exposes three paths:

- C2C forward/backward (CF32)
- R2C (F32 -> CF32, N/2+1 bins) when ``complexOutput``
- R2R in FFTPACK halfcomplex packing otherwise
  (pocketfft ``r2r_fftpack``: [r0, r1, i1, r2, i2, …])
"""

from __future__ import annotations

import jax.numpy as jnp


def fft_c2c(x: jnp.ndarray, axis: int, forward: bool) -> jnp.ndarray:
    if forward:
        return jnp.fft.fft(x, axis=axis).astype(x.dtype)
    n = x.shape[axis]
    return (jnp.fft.ifft(x, axis=axis) * n).astype(x.dtype)


def fft_r2c(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.fft.rfft(x, axis=axis).astype(jnp.complex64)


def _pack_fftpack(spec: jnp.ndarray, n: int, axis: int) -> jnp.ndarray:
    """rfft output (n//2+1 complex bins) -> FFTPACK real packing of len n:
    [r0, r1, i1, r2, i2, …(, r_{n/2} if n even)]."""
    axis = axis % spec.ndim
    spec = jnp.moveaxis(spec, axis, -1)
    r = jnp.real(spec)
    im = jnp.imag(spec)
    # interleave r[1:], i[1:] then trim
    nb = spec.shape[-1]
    inter = jnp.stack([r[..., 1:], im[..., 1:]], axis=-1)
    inter = inter.reshape(inter.shape[:-2] + (2 * (nb - 1),))
    packed = jnp.concatenate([r[..., :1], inter], axis=-1)[..., :n]
    return jnp.moveaxis(packed, -1, axis)


def _unpack_fftpack(packed: jnp.ndarray, axis: int) -> jnp.ndarray:
    """FFTPACK real packing -> complex rfft-format bins (n//2+1)."""
    axis = axis % packed.ndim
    p = jnp.moveaxis(packed, axis, -1)
    n = p.shape[-1]
    nb = n // 2 + 1
    r0 = p[..., :1]
    if n % 2 == 0:
        body = p[..., 1:-1].reshape(p.shape[:-1] + (nb - 2, 2))
        rn = p[..., -1:]
        real = jnp.concatenate([r0, body[..., 0], rn], axis=-1)
        imag = jnp.concatenate([jnp.zeros_like(r0), body[..., 1],
                                jnp.zeros_like(rn)], axis=-1)
    else:
        body = p[..., 1:].reshape(p.shape[:-1] + (nb - 1, 2))
        real = jnp.concatenate([r0, body[..., 0]], axis=-1)
        imag = jnp.concatenate([jnp.zeros_like(r0), body[..., 1]], axis=-1)
    spec = real + 1j * imag
    return jnp.moveaxis(spec, -1, axis)


def fft_r2r_fftpack(x: jnp.ndarray, axis: int, forward: bool) -> jnp.ndarray:
    """pocketfft ``r2r_fftpack`` with fct=1 both ways (unnormalized)."""
    n = x.shape[axis]
    if forward:
        spec = jnp.fft.rfft(x, axis=axis)
        return _pack_fftpack(spec, n, axis).astype(x.dtype)
    spec = _unpack_fftpack(x, axis)
    out = jnp.fft.irfft(spec, n=n, axis=axis) * n
    return out.astype(x.dtype)
