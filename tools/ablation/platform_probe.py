"""One-off TPU probe: dispatch floor, HBM streaming rate, MXU rate
(f32 vs bf16, XLA vs Pallas) — calibrates what 'roofline' means on
this backend before more kernel tuning."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.stderr.write(f"devices: {jax.devices()}\n")


def timeit(fn, *args, steps=20):
    out = None
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


rng = np.random.default_rng(0)

# ---- dispatch floor: trivial jitted op ------------------------------
tiny = jax.device_put(np.ones((8, 128), np.float32))
f = jax.jit(lambda x: x + 1.0)
print(f"dispatch floor (tiny add): {timeit(f, tiny, steps=50)*1e3:.3f} ms",
      flush=True)

# ---- HBM streaming: elementwise on 67MB ------------------------------
M = 1 << 17
x2 = jax.device_put(rng.standard_normal((M, 128)).astype(np.float32))
f = jax.jit(lambda x: x * 2.0)
dt = timeit(f, x2, steps=20)
bytes_ = M * 128 * 4 * 2   # read + write
print(f"xla elementwise 67MB: {dt*1e3:.3f} ms = "
      f"{bytes_/dt/1e9:.0f} GB/s", flush=True)

# reduction: read-only traffic
f = jax.jit(lambda x: jnp.sum(x, axis=0))
dt = timeit(f, x2, steps=20)
print(f"xla reduce 67MB: {dt*1e3:.3f} ms = "
      f"{M*128*4/dt/1e9:.0f} GB/s read", flush=True)

# ---- the DFT shape via XLA: (M,128)@(128,128) ------------------------
b = jax.device_put(rng.standard_normal((128, 128)).astype(np.float32))
f = jax.jit(lambda x, b: jnp.dot(x, b,
                                 preferred_element_type=jnp.float32))
dt = timeit(f, x2, b, steps=20)
fl = 2 * M * 128 * 128
print(f"xla dot (M,128)@(128,128) f32: {dt*1e3:.3f} ms = "
      f"{fl/dt/1e12:.1f} Tflop/s = "
      f"{(M*128*4*2)/dt/1e9:.0f} GB/s stream", flush=True)

# ---- MXU rate: chained matmuls, random data --------------------------
for dt_ in (jnp.float32, jnp.bfloat16):
    n = 4096
    a = jax.device_put(
        rng.standard_normal((n, n)).astype(np.float32) * 0.01
    ).astype(dt_)
    w = jax.device_put(
        rng.standard_normal((n, n)).astype(np.float32) * 0.01
    ).astype(dt_)
    CH = 8

    @jax.jit
    def chain(a, w):
        out = a
        for _ in range(CH):
            out = jnp.dot(out, w,
                          preferred_element_type=jnp.float32).astype(dt_)
        return out

    t = timeit(chain, a, w, steps=10)
    fl = CH * 2 * n**3
    print(f"xla matmul chain [{dt_.__name__} {n}]: {t*1e3:.2f} ms = "
          f"{fl/t/1e12:.1f} Tflop/s", flush=True)

# ---- pallas copy kernel: pipeline floor ------------------------------
TM = 2048
grid = M // TM


def k_copy(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :] * 2.0


f = jax.jit(lambda x: pl.pallas_call(
    k_copy,
    grid=(grid,),
    in_specs=[pl.BlockSpec((TM, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((TM, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
)(x))
dt = timeit(f, x2, steps=20)
print(f"pallas copy 67MB (tile {TM}): {dt*1e3:.3f} ms = "
      f"{bytes_/dt/1e9:.0f} GB/s", flush=True)


# ---- pallas DFT matmul, parallel vs arbitrary semantics --------------
def k_dot(x_ref, b_ref, o_ref):
    o_ref[:, :] = jnp.dot(x_ref[:, :], b_ref[:, :],
                          preferred_element_type=jnp.float32)


for sem in (None, "parallel", "arbitrary"):
    params = {}
    if sem:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(sem,))
    f = jax.jit(lambda x, b: pl.pallas_call(
        k_dot,
        grid=(grid,),
        in_specs=[pl.BlockSpec((TM, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((128, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TM, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        **params,
    )(x, b))
    try:
        dt = timeit(f, x2, b, steps=20)
        print(f"pallas dot sem={sem}: {dt*1e3:.3f} ms = "
              f"{fl and (2*M*128*128)/dt/1e12:.1f} Tflop/s", flush=True)
    except Exception as e:
        print(f"pallas dot sem={sem} FAILED: {e!r}"[:300], flush=True)

# ---- pallas dot with bigger tile / 512-wide DFT-as-4x accumulation --
for tm in (512, 4096, 8192):
    g = M // tm
    f = jax.jit(lambda x, b, tm=tm, g=g: pl.pallas_call(
        k_dot,
        grid=(g,),
        in_specs=[pl.BlockSpec((tm, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((128, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, b))
    try:
        dt = timeit(f, x2, b, steps=20)
        print(f"pallas dot tile={tm}: {dt*1e3:.3f} ms = "
              f"{(2*M*128*128)/dt/1e12:.1f} Tflop/s", flush=True)
    except Exception as e:
        print(f"pallas dot tile={tm} FAILED: {e!r}"[:300], flush=True)

print("DONE", flush=True)
