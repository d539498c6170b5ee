"""Round-4 probe K: generic pallas FFT rates + per-dispatch
output-size/chaining anatomy."""
import os, sys, time, traceback
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp
sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.ops.pallas_kernels import fft_pallas
from cyberether_tpu.ops.mxu_fft import fft_mxu


def fetch_time(fn, reps=5):
    ts = []
    for _ in range(reps + 2):
        t0 = time.perf_counter(); float(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts[2:])[len(ts[2:]) // 2]


def scan_steady(make, k=33, reps=5, min_diff_s=0.025):
    f1 = make(1)
    float(f1())
    t1 = fetch_time(f1, reps=reps)
    while True:
        fk = make(k); float(fk())
        tk = fetch_time(fk, reps=reps)
        diff = tk - t1
        if diff >= min_diff_s or k >= 512:
            break
        k *= 4
    return max(diff / (k - 1), 1e-9)


rng = np.random.default_rng(0)
B, n = 4096, 2048
xr = rng.standard_normal((B, n)).astype(np.float32)
xi = rng.standard_normal((B, n)).astype(np.float32)
xr_d = jax.device_put(xr)          # complex h2d is UNIMPLEMENTED on
xi_d = jax.device_put(xi)          # axon — combine INSIDE jit

for name, fn in (
        ("fft-pallas-exact", lambda z: fft_pallas(z, exact=True)),
        ("fft-pallas-fast", lambda z: fft_pallas(z, exact=False)),
        ("fft-xla", jnp.fft.fft),
        ("fft-mxu", fft_mxu)):
    try:
        def mk(k, fn=fn):
            @jax.jit
            def f(zr, zi):
                z = (zr + 1j * zi).astype(jnp.complex64)
                def body(c, _):
                    y = fn(z * (1 + c * 1e-30))
                    return c + jnp.real(y[0, 0]), None
                c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                    length=k)
                return c
            return lambda: f(xr_d, xi_d)
        per = scan_steady(mk)
        print(f"{name}: {per*1e3:.3f} ms = {B*n/per/1e9:.2f} Gsamp/s",
              flush=True)
    except Exception:
        print(f"{name} FAILED", flush=True)
        traceback.print_exc()

# ---- per-dispatch anatomy: output size / chained size ---------------
def loop_unchained(f, arg, steps=40):
    o = f(arg); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(steps):
        o = f(arg)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / steps

small = jax.device_put(jnp.zeros((8, 128), jnp.float32))
big_in = jax.device_put(jnp.zeros((512, 2048), jnp.float32))

f_small_bigout = jax.jit(
    lambda s: jnp.zeros((512, 2048), jnp.float32) + s[0, 0])
print(f"small-in big-out(4MB): "
      f"{loop_unchained(f_small_bigout, small)*1e3:.3f} ms", flush=True)

f_big_small = jax.jit(lambda b: b[0:8, 0:128] + 1.0)
print(f"big-in(4MB) small-out: "
      f"{loop_unchained(f_big_small, big_in)*1e3:.3f} ms", flush=True)

# chained big output -> next input
f_chain_big = jax.jit(lambda b: b + 1.0)
o = f_chain_big(big_in); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(40):
    o = f_chain_big(o)
jax.block_until_ready(o)
print(f"chained big(4MB): {(time.perf_counter()-t0)/40*1e3:.3f} ms",
      flush=True)

# chained small
f_chain_small = jax.jit(lambda s: s + 1.0)
o = f_chain_small(small); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(40):
    o = f_chain_small(o)
jax.block_until_ready(o)
print(f"chained small: {(time.perf_counter()-t0)/40*1e3:.3f} ms",
      flush=True)

# many outputs (10 x 4 MB)
f_many = jax.jit(lambda s: tuple(
    jnp.zeros((512, 2048), jnp.float32) + s[0, 0] + i
    for i in range(10)))
print(f"10 big outputs: {loop_unchained(f_many, small)*1e3:.3f} ms",
      flush=True)
print("done", flush=True)
