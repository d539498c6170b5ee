"""One-off: where do the channelizer's 4.15 ms/step go?
Times (a) full step_pallas, (b) the kernel alone on a pre-built ext,
(c) the XLA prep alone, (d) tile_m sweep, (e) P=1 (no FIR shifts)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.models.channelizer import Channelizer
from cyberether_tpu.ops.pallas_kernels import channelize_demod

M = 1 << 17


def timeit(fn, *args, steps=10):
    out = None
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
iq = jax.device_put(model.make_input(M))
C, Pt = model.channels, model.taps_per_branch

for tm in (512, 2048, 8192):
    step = model.jitted_step_pallas(tile_m=tm)
    dt = timeit(lambda: step(model.init_state(), iq))
    print(f"step_pallas[tile_m={tm}]: {dt*1e3:.2f} ms "
          f"({M*C/dt/1e9:.2f} GS/s)", flush=True)

for tm in (512, 2048):
    try:
        step = model.jitted_step_pallas(tile_m=tm, variant="v2")
        dt = timeit(lambda: step(model.init_state(), iq))
        print(f"step_pallas_v2[tile_m={tm}]: {dt*1e3:.2f} ms "
              f"({M*C/dt/1e9:.2f} GS/s)", flush=True)
    except Exception as e:
        print(f"v2[tile_m={tm}] failed: {repr(e)[:300]}", flush=True)

# prep alone (transpose + reshape + halo gather feed)
st = model.init_state()


@jax.jit
def prep(state, iq):
    x = jnp.transpose(iq, (2, 1, 0))
    ext3 = jnp.concatenate([state["hist"], x], axis=-1)
    return jnp.transpose(ext3, (2, 0, 1)).reshape(M + Pt - 1, 2 * C)


dt = timeit(lambda: prep(st, iq))
print(f"prep alone: {dt*1e3:.2f} ms", flush=True)

ext = jax.device_put(np.asarray(prep(st, iq)))
hp_k = jnp.transpose(model._rhs[:, 0, :])
prev = st["prev"].reshape(1, 2 * C)

for tm in (512, 2048):
    k = jax.jit(lambda ext: channelize_demod(
        ext, hp_k, model._Wr, model._Wi, prev,
        float(model._fm_ref), tile_m=tm))
    dt = timeit(lambda: k(ext))
    print(f"kernel alone[tile_m={tm}]: {dt*1e3:.2f} ms", flush=True)

m1 = Channelizer(channels=64, taps_per_branch=1, audio_decim=16)
iq1 = jax.device_put(m1.make_input(M))
dt = timeit(lambda: m1.jitted_step_pallas(tile_m=512)(m1.init_state(),
                                                      iq1))
print(f"step_pallas[P=1]: {dt*1e3:.2f} ms", flush=True)
