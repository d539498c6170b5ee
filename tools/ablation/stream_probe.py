"""HBM streaming floor probe (round 3): what limits a Pallas kernel
that only moves 67 MB through VMEM to ~440 GB/s when XLA-level copies
measure ~2.8 TB/s?

Three kernels over the channelizer's exact working set
((131072, 128) f32 in, reduced out):

A. auto-pipeline copy at the production block size (tile, 128);
   block-size sweep 1-8 MB.
B. manual double-buffered DMA (input/output stay in HBM/ANY; the
   kernel drives make_async_copy chunk by chunk) — the ceiling for a
   hand-pipelined v6 kernel.
C. XLA-level baseline: y = x + 1 (pure fused stream) and jnp.copy.

Run ON TPU: python tools/ablation/stream_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch_time(fn, reps=5):
    ts = []
    for _ in range(reps + 2):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts[2:])
    return ts[len(ts) // 2]


def chain_time(make, k=33, reps=5):
    f1, fk = make(1), make(k)
    jax.block_until_ready(f1())
    jax.block_until_ready(fk())
    t1 = fetch_time(f1, reps)
    tk = fetch_time(fk, reps)
    return max((tk - t1) / (k - 1), 1e-9)


M, W = 131072, 128
BYTES = M * W * 4          # 67 MB per pass


def scan_wrap(step):
    """step(x) -> same-shaped array; each step consumes the previous
    step's output (a real data dependency with ZERO extra traffic —
    perturbation-based chaining would add a full read+write pass)."""
    def make(n):
        @jax.jit
        def f(x):
            def body(carry, _):
                return step(carry), None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out[0, 0]
        return lambda: f(xdev)
    return make


# ---------------------------------------------------------------------
def copy_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :]


def auto_copy(x, tile):
    return pl.pallas_call(
        copy_kernel,
        grid=(M // tile,),
        in_specs=[pl.BlockSpec((tile, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x)


def manual_kernel(x_hbm, o_hbm, scr, sems_in, sems_out, *, chunk, n):
    def get_in(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * chunk, chunk), :],
            scr.at[slot], sems_in.at[slot])

    def put_out(slot, i):
        return pltpu.make_async_copy(
            scr.at[slot], o_hbm.at[pl.ds(i * chunk, chunk), :],
            sems_out.at[slot])

    get_in(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n)
        def _():
            get_in(nxt, i + 1).start()

        get_in(slot, i).wait()

        @pl.when(i >= 2)
        def _():
            put_out(slot, i - 2).wait()

        put_out(slot, i).start()
        return 0

    jax.lax.fori_loop(0, n, body, 0)
    put_out(jax.lax.rem(n - 2, 2), n - 2).wait()
    put_out(jax.lax.rem(n - 1, 2), n - 1).wait()


def manual_copy(x, chunk):
    n = M // chunk
    return pl.pallas_call(
        functools.partial(manual_kernel, chunk=chunk, n=n),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, chunk, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)


if __name__ == "__main__":
    log("devices:", jax.devices())
    float(jnp.zeros((), jnp.float32) + 1)
    log("claim warm")
    rng = np.random.default_rng(0)
    xdev = jax.device_put(
        rng.standard_normal((M, W)).astype(np.float32))

    # C. XLA baselines
    per = chain_time(scan_wrap(lambda x: x + 1.0))
    log(f"XLA x+1 stream: {per*1e3:.3f} ms  "
        f"{2*BYTES/per/1e9:.0f} GB/s (r+w)")

    # A. auto-pipeline copy, tile sweep
    for tile in (2048, 4096, 8192, 16384):
        try:
            per = chain_time(scan_wrap(
                lambda x, t=tile: auto_copy(x, t)))
            log(f"pallas auto-copy tile={tile} "
                f"({tile*W*4>>20} MB blocks x{M//tile}): "
                f"{per*1e3:.3f} ms  {2*BYTES/per/1e9:.0f} GB/s")
        except Exception as e:
            log(f"auto-copy tile={tile} FAILED: {repr(e)[:200]}")

    # B. manual double-buffered DMA
    for chunk in (2048, 8192, 16384):
        try:
            per = chain_time(scan_wrap(
                lambda x, c=chunk: manual_copy(x, c)))
            log(f"pallas manual-DMA chunk={chunk}: {per*1e3:.3f} ms  "
                f"{2*BYTES/per/1e9:.0f} GB/s")
        except Exception as e:
            log(f"manual-DMA chunk={chunk} FAILED: {repr(e)[:300]}")
    log("done")
