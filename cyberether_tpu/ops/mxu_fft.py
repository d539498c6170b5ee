"""FFT as MXU matmuls (Cooley-Tukey two-factor decomposition).

XLA's generic FFT runs on the VPU and sits far off roofline for the
mid-sized transforms SDR spectra use (1k-16k points).  Factoring
N = N1*N2 (both <= 128) turns the DFT into two dense matmul stages plus
a twiddle multiply:

    X[N1*k2 + k1] = sum_{n2} W_N^{n2 k1} W_{N2}^{n2 k2}
                    * [ sum_{n1} W_{N1}^{n1 k1} x[N2*n1 + n2] ]

— each stage a (batch*Nother, Nfac) @ (Nfac, Nfac) matmul that maps
straight onto the 128x128 systolic array.  Complex arithmetic is
carried as split re/im float32 planes (also avoids the axon backend's
complex-transfer limitation at program boundaries).

Used by the spectrum pipeline; validated against np.fft to 1e-3
(reference FFT tolerance).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _factor(n: int) -> Tuple[int, int]:
    """Pick N1*N2 = n with both factors <= 128 and as square as
    possible (MXU tiles like fat matrices)."""
    best = None
    for n1 in range(2, 129):
        if n % n1:
            continue
        n2 = n // n1
        if n2 > 128:
            continue
        score = abs(n1 - n2)
        if best is None or score < best[0]:
            best = (score, n1, n2)
    if best is None:
        raise ValueError(f"cannot factor {n} into two factors <= 128")
    return best[1], best[2]


@functools.lru_cache(maxsize=32)
def _plan(n: int):
    """Cache NUMPY factors only — jnp conversion must happen per trace
    (a jnp array created inside one jit trace is a tracer and must not
    leak through the cache into another)."""
    n1, n2 = _factor(n)
    k = np.arange(n1)
    w1 = np.exp(-2j * np.pi * np.outer(k, k) / n1)       # (k1, n1)
    k2 = np.arange(n2)
    w2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)     # (n2, k2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n1))
                / n)                                      # (n2, k1)
    return (n1, n2,
            w1.real.astype(np.float32), w1.imag.astype(np.float32),
            w2.real.astype(np.float32), w2.imag.astype(np.float32),
            tw.real.astype(np.float32), tw.imag.astype(np.float32))


def _cmatmul(ar, ai, br, bi):
    """(ar+i*ai) @ (br+i*bi) with f32 MXU matmuls."""
    rr = jnp.dot(ar, br, preferred_element_type=jnp.float32)
    ii = jnp.dot(ai, bi, preferred_element_type=jnp.float32)
    ri = jnp.dot(ar, bi, preferred_element_type=jnp.float32)
    ir = jnp.dot(ai, br, preferred_element_type=jnp.float32)
    return rr - ii, ri + ir


def fft_mxu_split(xr: jnp.ndarray, xi: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unnormalized forward DFT along the last axis; inputs/outputs are
    split re/im float32 of shape (..., n)."""
    n = xr.shape[-1]
    n1, n2, w1r, w1i, w2r, w2i, twr, twi = map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
        _plan(n))
    lead = xr.shape[:-1]
    b = int(np.prod(lead)) if lead else 1

    # stage 1: A[k1, n2] = sum_n1 W1[k1, n1] x[n1, n2]
    xr2 = xr.reshape(b, n1, n2)
    xi2 = xi.reshape(b, n1, n2)
    # fold batch into n2: (n1, b*n2) matmul
    xr2 = jnp.transpose(xr2, (1, 0, 2)).reshape(n1, b * n2)
    xi2 = jnp.transpose(xi2, (1, 0, 2)).reshape(n1, b * n2)
    ar, ai = _cmatmul(w1r, w1i, xr2, xi2)                 # (k1, b*n2)

    # twiddle: B[k1, b, n2] = A * W_N^{n2 k1}
    ar = ar.reshape(n1, b, n2)
    ai = ai.reshape(n1, b, n2)
    twr_t = twr.T[:, None, :]                             # (k1, 1, n2)
    twi_t = twi.T[:, None, :]
    br_ = ar * twr_t - ai * twi_t
    bi_ = ar * twi_t + ai * twr_t

    # stage 2: X[k1, b, k2] = sum_n2 B[k1, b, n2] W2[n2, k2]
    br2 = br_.reshape(n1 * b, n2)
    bi2 = bi_.reshape(n1 * b, n2)
    cr, ci = _cmatmul(br2, bi2, w2r, w2i)                 # (n1*b, k2)

    # output index: X[N1*k2 + k1] -> (b, k2, k1) -> (b, n)
    cr = cr.reshape(n1, b, n2)
    ci = ci.reshape(n1, b, n2)
    outr = jnp.transpose(cr, (1, 2, 0)).reshape(lead + (n,))
    outi = jnp.transpose(ci, (1, 2, 0)).reshape(lead + (n,))
    return outr, outi


def fft_mxu(x: jnp.ndarray) -> jnp.ndarray:
    """Complex-in/complex-out convenience wrapper (testing)."""
    yr, yi = fft_mxu_split(jnp.real(x).astype(jnp.float32),
                           jnp.imag(x).astype(jnp.float32))
    return (yr + 1j * yi).astype(jnp.complex64)
