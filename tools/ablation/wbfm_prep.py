"""One-off: cost of wbfm prep pieces on the TPU."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.stderr.write(f"{jax.devices()}\n")
from cyberether_tpu.models.wbfm import WbfmReceiver
from cyberether_tpu.ops.firs import windowed_sinc_bandpass

n = 819 * 5120   # divisible by 128 and 40
rng = np.random.default_rng(0)
iq = jax.device_put(rng.standard_normal((n, 2)).astype(np.float32))
x2 = jax.device_put(rng.standard_normal((2, n)).astype(np.float32))

def med(f, a, reps=7):
    for _ in range(2): jax.block_until_ready(f(a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(f(a))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]

def chain_med(mk, k=16):
    f1, fk = jax.jit(mk(1)), jax.jit(mk(k))
    for f in (f1, fk): float(f(iq))
    def m(f, reps=7):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(f(iq))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1:-1][2]
    return max((m(fk) - m(f1)) / (k - 1), 1e-9)

# transpose cost
def mk_t(k):
    def f(a):
        acc = jnp.float32(0)
        cur = a
        for _ in range(k):
            y = cur.T + acc
            acc = acc + y[0, 0] * 1e-20
            cur = a + acc * 1e-20
        return acc
    return f
print(f"iq.T ({n}x2):    {chain_med(mk_t)*1e3:.3f} ms", flush=True)

model = WbfmReceiver()
h = np.asarray(model._taps)
print("taps ends:", h[0], h[-1], flush=True)

# full production step_pallas at 4.2M
st0 = model.init_state()
step = model.jitted_step_pallas()
def mk_prod(k):
    def f(a):
        st = {k2: v for k2, v in st0.items()}
        acc = jnp.float32(0)
        cur = a
        for _ in range(k):
            audio, st = model.step_pallas(st, cur)
            acc = acc + audio[0] * 1e-20
            cur = a + acc * 1e-20
        return acc
    return f
per = chain_med(mk_prod)
print(f"step_pallas (4.2M): {per*1e3:.3f} ms  {n/per/1e9:.2f} Gsamp/s",
      flush=True)

# piece-wise: kernel alone, decim mean, ylast
from cyberether_tpu.ops.pallas_kernels import wbfm_fused
taps_j = model._taps
hist0 = st0["fir_hist"]

def mk_kernel(k):
    def f(a):
        acc = jnp.float32(0); cur = a
        for _ in range(k):
            d = wbfm_fused(cur.T, taps_j, hist0, 1.0)
            acc = acc + d[0] * 1e-20
            cur = a + acc * 1e-20
        return acc
    return f
per = chain_med(mk_kernel)
print(f"wbfm_fused alone:  {per*1e3:.3f} ms", flush=True)

def mk_decim(k):
    def f(a):
        acc = jnp.float32(0); cur = a[:, 0]
        for _ in range(k):
            audio = cur.reshape(-1, 40).mean(-1)
            acc = acc + audio[0] * 1e-20
            cur = a[:, 0] + acc * 1e-20
        return acc
    return f
per = chain_med(mk_decim)
print(f"decim mean:        {per*1e3:.3f} ms", flush=True)

def mk_ylast(k):
    def f(a):
        acc = jnp.float32(0); cur = a.T
        for _ in range(k):
            yl = jnp.concatenate([hist0, cur], axis=-1)[:, -129:] @ taps_j[::-1]
            acc = acc + yl[0] * 1e-20
            cur = a.T + acc * 1e-20
        return acc
    return f
per = chain_med(mk_ylast)
print(f"ylast:             {per*1e3:.3f} ms", flush=True)

# v2 numerics vs XLA step on-device
iqs = model.make_input(5120 * 40)
st_a = model.init_state()
st_b = model.init_state()
a1, _ = model.jitted_step()(st_a, jnp.asarray(iqs))
a2, _ = model.jitted_step_pallas()(st_b, jnp.asarray(iqs))
err = float(jnp.max(jnp.abs(a1 - a2)))
print(f"v2 max audio err vs XLA path: {err:.3e}", flush=True)

# bench-size production rate (1.28M like bench.py)
nb = 1_280_000
iqb = jax.device_put(rng.standard_normal((nb, 2)).astype(np.float32))
def mk_prod_b(k):
    def f(a):
        st = {k2: v for k2, v in st0.items()}
        acc = jnp.float32(0); cur = a
        for _ in range(k):
            audio, st = model.step_pallas(st, cur)
            acc = acc + audio[0] * 1e-20
            cur = a + acc * 1e-20
        return acc
    return f
f1, fk = jax.jit(mk_prod_b(1)), jax.jit(mk_prod_b(16))
for f in (f1, fk): float(f(iqb))
def m2(f, reps=7):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f(iqb))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1:-1][2]
per = max((m2(fk) - m2(f1)) / 15, 1e-9)
print(f"step_pallas v2 (1.28M): {per*1e3:.3f} ms  {nb/per/1e9:.2f} Gsamp/s",
      flush=True)
