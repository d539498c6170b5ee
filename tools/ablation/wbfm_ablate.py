"""One-off TPU ablation: where does wbfm_fused's time go?

Variants (all (2, n) f32 in, (nf,128) f32 out, chained differentially):
  full      — production kernel (4 band matmuls + atan2)
  noatan    — 4 matmuls, discriminator without atan2 (dr + di)
  onlyfir   — 2 matmuls (y only), no delay path, no atan2
  shift     — 2 matmuls + pltpu.roll for y[i-1] + atan2
              (halo sample per tile left unpatched — timing only)
  shiftnoat — shift without atan2
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.ops.pallas_kernels import (_atan2, _wbfm_bands,
                                               wbfm_fused)

T = 129
h = np.hamming(T) * np.sinc(0.4 * (np.arange(T) - (T - 1) / 2))
taps = (h / h.sum()).astype(np.float32)
K = T - 1
n = 1 << 22              # 4.2 Msamp
nf = n // 128
TILE = 512
A, B = _wbfm_bands(taps.tobytes())
rng = np.random.default_rng(0)
x = jax.device_put(rng.standard_normal((2, n)).astype(np.float32))
hist = jnp.zeros((2, K), jnp.float32)


def make_variant(which):
    def kern(xpr_ref, xcr_ref, xpi_ref, xci_ref, a_ref, b_ref, out_ref):
        a1, a2 = a_ref[0:128, :], a_ref[128:256, :]

        def fir(xp, xc, m1, m2):
            return (jnp.dot(xp, m1, preferred_element_type=jnp.float32)
                    + jnp.dot(xc, m2, preferred_element_type=jnp.float32))

        xpr, xcr = xpr_ref[:, :], xcr_ref[:, :]
        xpi, xci = xpi_ref[:, :], xci_ref[:, :]
        yr = fir(xpr, xcr, a1, a2)
        yi = fir(xpi, xci, a1, a2)
        if which == "onlyfir":
            out_ref[:, :] = yr + yi
            return
        if which in ("shift", "shiftnoat"):
            s_r = pltpu.roll(yr, 1, 1)
            s_i = pltpu.roll(yi, 1, 1)
            u_r = pltpu.roll(pltpu.roll(yr, 1, 0), 1, 1)
            u_i = pltpu.roll(pltpu.roll(yi, 1, 0), 1, 1)
            col = jax.lax.broadcasted_iota(jnp.int32, yr.shape, 1)
            pr = jnp.where(col == 0, u_r, s_r)
            pi_ = jnp.where(col == 0, u_i, s_i)
        else:
            b1, b2 = b_ref[0:128, :], b_ref[128:256, :]
            pr = fir(xpr, xcr, b1, b2)
            pi_ = fir(xpi, xci, b1, b2)
        dr = pr * yr + pi_ * yi
        di = pr * yi - pi_ * yr
        if which in ("noatan", "shiftnoat"):
            out_ref[:, :] = dr + di
        else:
            out_ref[:, :] = _atan2(di, dr) * jnp.float32(1.0)

    def run(xa):
        xc = xa.reshape(2, nf, 128)
        hrow = jnp.concatenate(
            [jnp.zeros((2, 128 - K), jnp.float32), hist], axis=-1)
        xp = jnp.concatenate([hrow[:, None, :], xc[:, :-1, :]], axis=1)
        x_spec = pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        m_spec = pl.BlockSpec((256, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(nf // TILE,),
            in_specs=[x_spec, x_spec, x_spec, x_spec, m_spec, m_spec],
            out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nf, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(xp[0], xc[0], xp[1], xc[1], jnp.asarray(A), jnp.asarray(B))
    return run


def chain(run, k):
    @jax.jit
    def f(xa):
        acc = jnp.float32(0.0)
        cur = xa
        for _ in range(k):
            out = run(cur)
            s = jnp.sum(out[:4, :4])
            acc = acc + s
            cur = xa + s * 1e-20
        return acc
    return f


def chain_time(run, k=16):
    f1, fk = chain(run, 1), chain(run, k)
    for f in (f1, fk):
        float(f(x))
    t1 = _med(f1)
    tk = _med(fk)
    return max((tk - t1) / (k - 1), 1e-9)


def _med(f, reps=7):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)[1:-1]
    return ts[len(ts) // 2]


print(f"n={n} samples, tile_r={TILE}", flush=True)
for which in ("full", "noatan", "onlyfir", "shift", "shiftnoat"):
    try:
        per = chain_time(make_variant(which))
        print(f"{which:10s}: {per*1e3:7.3f} ms  "
              f"{n/per/1e9:6.2f} Gsamp/s", flush=True)
    except Exception as e:
        print(f"{which:10s}: FAILED {repr(e)[:200]}", flush=True)

# production path for reference
def prod(xa):
    return wbfm_fused(xa, jnp.asarray(taps), hist, 1.0)
try:
    per = chain_time(prod)
    print(f"{'prod':10s}: {per*1e3:7.3f} ms  "
          f"{n/per/1e9:6.2f} Gsamp/s", flush=True)
except Exception as e:
    print(f"prod       : FAILED {repr(e)[:200]}", flush=True)
