"""Pallas TPU kernels for the hot paths.

The graph compiler's XLA output is already fused per segment; these
kernels exist where hand scheduling beats XLA (SURVEY.md §7 step 5):

- ``channelize_demod``: the entire channelizer inner loop — polyphase
  branch FIR + C-point DFT (MXU matmuls) + FM phase-difference demod —
  in ONE VMEM-resident pass.  Input frame windows overlap by P-1, so
  each grid step DMAs its window HBM->VMEM explicitly (BlockSpec tiling
  cannot express overlap); the lag-1 demod carry rides a VMEM scratch
  across the sequential grid steps.

All kernels run under ``interpret=True`` on CPU for testing; the real
TPU path compiles via Mosaic.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """atan2 from basic VPU ops (Mosaic has no atan2 primitive).

    Minimax odd polynomial for atan on [0, 1] with octant reduction;
    max error ~1e-6 rad — far below the FM demod noise floor.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    # range-reduce t in (tan(pi/8), 1] via atan(t) = pi/4 +
    # atan((t-1)/(t+1)), so the polynomial only sees |u| <= 0.4142
    red = t > jnp.float32(0.41421356)
    u = jnp.where(red, (t - 1.0) / (t + 1.0), t)
    z = u * u
    # minimax odd polynomial, err << 1e-7 for |u| <= 0.4142
    p = jnp.float32(6.1687607318e-02)
    p = p * z + jnp.float32(-1.0648017377e-01)
    p = p * z + jnp.float32(1.4253635705e-01)
    p = p * z + jnp.float32(-1.9999158382e-01)
    p = p * z + jnp.float32(3.3333328366e-01)
    a = u - u * z * p
    a = jnp.where(red, jnp.float32(np.pi / 4) + a, a)
    a = jnp.where(ay > ax, jnp.float32(np.pi / 2) - a, a)
    # signbit (not <0) so atan2(+/-0, -0.0) = +/-pi per IEEE, matching
    # XLA's arctan2 bit-for-bit on zero-crossing inputs
    a = jnp.where(jnp.signbit(x), jnp.float32(np.pi) - a, a)
    return jnp.where(jnp.signbit(y), -a, a)


def _channelize_kernel(ext_ref, hp_ref, wr_ref, wi_ref, prev_ref,
                       out_ref, ylast_ref, win, carry, sem, *, P: int,
                       C: int, tile_m: int, ref_gain: float):
    """One grid step: frames [i*tile_m, (i+1)*tile_m)."""
    i = pl.program_id(0)

    # ---- fetch overlapping window HBM -> VMEM -------------------------
    dma = pltpu.make_async_copy(
        ext_ref.at[:, :, pl.ds(i * tile_m, tile_m + P - 1)], win, sem)
    dma.start()
    dma.wait()

    # ---- polyphase branch FIR (VPU, unrolled over P taps) -------------
    zr = jnp.zeros((C, tile_m), jnp.float32)
    zi = jnp.zeros((C, tile_m), jnp.float32)
    for p in range(P):
        h = hp_ref[p, :]
        zr = zr + h[:, None] * win[0, :, p:p + tile_m]
        zi = zi + h[:, None] * win[1, :, p:p + tile_m]

    # ---- C-point DFT as MXU matmuls -----------------------------------
    wr = wr_ref[:, :]
    wi = wi_ref[:, :]
    yr = (jnp.dot(wr, zr, preferred_element_type=jnp.float32)
          - jnp.dot(wi, zi, preferred_element_type=jnp.float32))
    yi = (jnp.dot(wr, zi, preferred_element_type=jnp.float32)
          + jnp.dot(wi, zr, preferred_element_type=jnp.float32))

    # ---- FM demod with lag-1 carry ------------------------------------
    @pl.when(i == 0)
    def _seed():
        carry[0, :, 0] = prev_ref[0, :]
        carry[1, :, 0] = prev_ref[1, :]

    pr = jnp.concatenate([carry[0], yr[:, :-1]], axis=1)
    pi_ = jnp.concatenate([carry[1], yi[:, :-1]], axis=1)
    dr = pr * yr + pi_ * yi
    di = pr * yi - pi_ * yr
    out_ref[:, :] = _atan2(di, dr) * ref_gain

    carry[0, :, 0] = yr[:, -1]
    carry[1, :, 0] = yi[:, -1]

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit_last():
        ylast_ref[0, :] = yr[:, -1]
        ylast_ref[1, :] = yi[:, -1]


def channelize_demod(ext: jnp.ndarray, hp: jnp.ndarray,
                     wr: jnp.ndarray, wi: jnp.ndarray,
                     prev: jnp.ndarray, ref_gain: float,
                     tile_m: int = 512, interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused polyphase channelizer + FM demod.

    ext:  (2, C, M + P - 1) float32 (re/im, branch, frames+history)
    hp:   (P, C) float32 polyphase taps (time-reversed per branch)
    wr/wi: (C, C) float32 DFT matrix parts
    prev: (2, C) float32 last y frame of the previous step

    Returns (demod (C, M) float32, ylast (2, C) float32).
    """
    two, C, extm = ext.shape
    P = hp.shape[0]
    M = extm - (P - 1)
    tile_m = min(tile_m, M)
    assert M % tile_m == 0, (M, tile_m)
    grid = (M // tile_m,)

    out, ylast = pl.pallas_call(
        functools.partial(_channelize_kernel, P=P, C=C, tile_m=tile_m,
                          ref_gain=float(ref_gain)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # ext (HBM)
            pl.BlockSpec((P, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, M), jnp.float32),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, C, tile_m + P - 1), jnp.float32),
            pltpu.VMEM((2, C, 1), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(ext, hp, wr, wi, prev)
    return out, ylast
