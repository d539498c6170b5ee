"""One-off TPU ablation: where does the channelizer v5 step time go?
Plus MXU f32-vs-bf16 calibration (explains the spectrum bf16 mystery).
"""
import functools
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.models.channelizer import Channelizer
from cyberether_tpu.ops.pallas_kernels import _atan2


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


# ---- MXU calibration: XLA matmul f32 vs bf16 ------------------------
try:
    for dt, n in ((jnp.float32, 4096), (jnp.bfloat16, 4096),
                  (jnp.bfloat16, 8192)):
        a = jnp.ones((n, n), dt)
        b = jnp.ones((n, n), dt)
        f = jax.jit(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32))
        dtm = timeit(f, a, b, steps=10)
        fl = 2 * n**3
        print(f"matmul[{dt.__name__},{n}]: {dtm*1e3:.2f} ms = "
              f"{fl/dtm/1e12:.1f} Tflop/s", flush=True)
except Exception:
    traceback.print_exc()

model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
C, P, D = 64, 8, 16
TM = 2048
M = 1 << 17
rng = np.random.default_rng(1)
iq = jax.device_put(
    rng.standard_normal((M, C, 2)).astype(np.float32))

# ---- correctness with full-band FM carriers ------------------------
try:
    Mc = 8192
    iqc = jax.device_put(model.make_input_full(Mc))
    ref = np.asarray(model.jitted_step()(model.init_state(), iqc)[0])
    for name in ("v4", "v5"):
        got = np.asarray(model.jitted_step_pallas_v4(kernel=name)(
            model.init_state_v4(), iqc)[0])
        print(f"{name} max err vs XLA (full-band FM): "
              f"{np.abs(got - ref).max():.3e}", flush=True)
except Exception:
    traceback.print_exc()

# ---- ablation kernels ------------------------------------------------
hp = np.asarray(model._hp5)           # (P, 2C)
bperm = np.asarray(model._bperm5)     # (2C, 2C)
gain = float(model._fm_ref)
sel = np.kron(np.eye(TM // D, dtype=np.float32),
              np.full((1, D), 1.0 / D, np.float32))

x2 = iq.reshape(M, 2 * C)
grid = M // TM
idx = (np.arange(1, grid)[:, None] * TM - P + np.arange(P)[None, :])
halos = jnp.concatenate([jnp.zeros((1, P, 2 * C)), x2[idx]], 0)
halos = jax.device_put(jax.block_until_ready(halos))


def make_call(kern, out_rows, scratch=True):
    specs = [
        pl.BlockSpec((TM, 2 * C), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, 2 * C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, 2 * C), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * C, 2 * C), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TM // D, TM), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    oc = C if out_rows == TM // D else 2 * C
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=specs,
        out_specs=pl.BlockSpec((out_rows, oc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * out_rows, oc),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM + P, 2 * C), jnp.float32),
                        pltpu.VMEM((TM + 1, 2 * C), jnp.float32)],
    )


def k_full(body, halo, hp_r, b, s, out, win, yall):
    win[0:P, :] = halo[0]
    win[P:P + TM, :] = body[:, :]
    rows = TM + 1
    z = win[0:rows, :] * hp_r[0, :][None, :]
    for p in range(1, P):
        z = z + win[p:p + rows, :] * hp_r[p, :][None, :]
    yall[0:rows, :] = jnp.dot(z, b[:, :],
                              preferred_element_type=jnp.float32)
    yr, yi = yall[1:rows, 0:C], yall[1:rows, C:2 * C]
    pr, pi_ = yall[0:TM, 0:C], yall[0:TM, C:2 * C]
    dr = pr * yr + pi_ * yi
    di = pr * yi - pi_ * yr
    demod = _atan2(di, dr) * gain
    out[:, :] = jnp.dot(s[:, :], demod,
                        preferred_element_type=jnp.float32)


def k_nofir(body, halo, hp_r, b, s, out, win, yall):
    win[0:P, :] = halo[0]
    win[P:P + TM, :] = body[:, :]
    rows = TM + 1
    z = win[0:rows, :]
    yall[0:rows, :] = jnp.dot(z, b[:, :],
                              preferred_element_type=jnp.float32)
    yr, yi = yall[1:rows, 0:C], yall[1:rows, C:2 * C]
    pr, pi_ = yall[0:TM, 0:C], yall[0:TM, C:2 * C]
    dr = pr * yr + pi_ * yi
    di = pr * yi - pi_ * yr
    demod = _atan2(di, dr) * gain
    out[:, :] = jnp.dot(s[:, :], demod,
                        preferred_element_type=jnp.float32)


def k_noatan(body, halo, hp_r, b, s, out, win, yall):
    win[0:P, :] = halo[0]
    win[P:P + TM, :] = body[:, :]
    rows = TM + 1
    z = win[0:rows, :] * hp_r[0, :][None, :]
    for p in range(1, P):
        z = z + win[p:p + rows, :] * hp_r[p, :][None, :]
    yall[0:rows, :] = jnp.dot(z, b[:, :],
                              preferred_element_type=jnp.float32)
    yr, yi = yall[1:rows, 0:C], yall[1:rows, C:2 * C]
    pr, pi_ = yall[0:TM, 0:C], yall[0:TM, C:2 * C]
    di = pr * yi - pi_ * yr
    demod = di * gain
    out[:, :] = jnp.dot(s[:, :], demod,
                        preferred_element_type=jnp.float32)


def k_nodemod(body, halo, hp_r, b, s, out, win, yall):
    win[0:P, :] = halo[0]
    win[P:P + TM, :] = body[:, :]
    rows = TM + 1
    z = win[0:rows, :] * hp_r[0, :][None, :]
    for p in range(1, P):
        z = z + win[p:p + rows, :] * hp_r[p, :][None, :]
    yall[0:rows, :] = jnp.dot(z, b[:, :],
                              preferred_element_type=jnp.float32)
    out[:, :] = jnp.dot(s[:, :], yall[1:rows, 0:C] * gain,
                        preferred_element_type=jnp.float32)


def k_matmul_only(body, halo, hp_r, b, s, out, win, yall):
    y = jnp.dot(body[:, :], b[:, :],
                preferred_element_type=jnp.float32)
    out[:, :] = jnp.dot(s[:, :], y[:, 0:C],
                        preferred_element_type=jnp.float32)


def k_reshape_mean(body, halo, hp_r, b, s, out, win, yall):
    win[0:P, :] = halo[0]
    win[P:P + TM, :] = body[:, :]
    rows = TM + 1
    z = win[0:rows, :] * hp_r[0, :][None, :]
    for p in range(1, P):
        z = z + win[p:p + rows, :] * hp_r[p, :][None, :]
    yall[0:rows, :] = jnp.dot(z, b[:, :],
                              preferred_element_type=jnp.float32)
    yr, yi = yall[1:rows, 0:C], yall[1:rows, C:2 * C]
    pr, pi_ = yall[0:TM, 0:C], yall[0:TM, C:2 * C]
    dr = pr * yr + pi_ * yi
    di = pr * yi - pi_ * yr
    demod = _atan2(di, dr) * gain
    out[:, :] = jnp.mean(demod.reshape(TM // D, D, C), axis=1)


def k_fullrate(body, halo, hp_r, b, s, out, win, yall):
    win[0:P, :] = halo[0]
    win[P:P + TM, :] = body[:, :]
    rows = TM + 1
    z = win[0:rows, :] * hp_r[0, :][None, :]
    for p in range(1, P):
        z = z + win[p:p + rows, :] * hp_r[p, :][None, :]
    yall[0:rows, :] = jnp.dot(z, b[:, :],
                              preferred_element_type=jnp.float32)
    yr, yi = yall[1:rows, 0:C], yall[1:rows, C:2 * C]
    pr, pi_ = yall[0:TM, 0:C], yall[0:TM, C:2 * C]
    dr = pr * yr + pi_ * yi
    di = pr * yi - pi_ * yr
    out[:, 0:C] = _atan2(di, dr) * gain
    out[:, C:2 * C] = dr


cases = [
    ("full", k_full, TM // D),
    ("no-fir", k_nofir, TM // D),
    ("no-atan2", k_noatan, TM // D),
    ("no-demod", k_nodemod, TM // D),
    ("matmul-only", k_matmul_only, TM // D),
    ("reshape-mean", k_reshape_mean, TM // D),
    ("full-rate-out", k_fullrate, TM),
]
args = (x2, halos, jnp.asarray(hp), jnp.asarray(bperm),
        jnp.asarray(sel))
for name, kern, out_rows in cases:
    try:
        call = make_call(kern, out_rows)
        f = jax.jit(lambda *a, call=call: call(*a))
        dt = timeit(f, *args, steps=20)
        print(f"{name}: {dt*1e3:.3f} ms = {M*C/dt/1e9:.2f} Gsamp/s",
              flush=True)
    except Exception as e:
        print(f"{name} FAILED: {e!r}"[:400], flush=True)
print("DONE", flush=True)
