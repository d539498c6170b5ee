"""Probe: does Mosaic lower float16 MXU matmuls, and at what rate?"""
import os, sys, time, traceback
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.stderr.write(f"devices: {jax.devices()}\n")

def kern(a_ref, b_ref, o_ref):
    o_ref[:, :] = jnp.dot(a_ref[:, :], b_ref[:, :],
                          preferred_element_type=jnp.float32)

rng = np.random.default_rng(0)
A = rng.standard_normal((256, 128)).astype(np.float16)
Bm = rng.standard_normal((128, 128)).astype(np.float16)
try:
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(A), jnp.asarray(Bm))
    ref = A.astype(np.float64) @ Bm.astype(np.float64)
    err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
    print(f"pallas f16 matmul OK, rel err vs f64: {err:.3e}", flush=True)
except Exception:
    print("pallas f16 matmul FAILED", flush=True)
    traceback.print_exc()

# rate check at XLA level: f16 vs bf16 vs f32 4096^3 chains
for dt in (jnp.float16, jnp.bfloat16, jnp.float32):
    try:
        n = 4096
        a = jnp.ones((n, n), dt); b = jnp.ones((n, n), dt)
        f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
        for _ in range(3): o = f(a, b)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(10): o = f(a, b)
        jax.block_until_ready(o)
        dtm = (time.perf_counter() - t0) / 10
        print(f"xla matmul[{dt.__name__}]: {2*n**3/dtm/1e12:.1f} Tflop/s", flush=True)
    except Exception:
        print(f"xla matmul[{dt.__name__}] FAILED", flush=True)
        traceback.print_exc()
print("done", flush=True)
