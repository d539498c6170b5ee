"""One-off: where do the channelizer's 4.15 ms/step go?
Times step_pallas v1/v2/v3 across tile_m, prep alone, kernel alone."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.models.channelizer import Channelizer
from cyberether_tpu.ops.pallas_kernels import channelize_demod

M = 1 << 17


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


model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
iq = jax.device_put(model.make_input(M))
C, Pt = model.channels, model.taps_per_branch

for variant in ("v1", "v2", "v3"):
    st = (model.init_state_v3() if variant == "v3"
          else model.init_state())
    for tm in (512, 2048, 8192):
        try:
            step = model.jitted_step_pallas(tile_m=tm, variant=variant)
            dt = timeit(lambda: step(st, iq))
            print(f"step_pallas_{variant}[tile_m={tm}]: {dt*1e3:.2f} ms"
                  f" ({M*C/dt/1e9:.2f} GS/s)", flush=True)
        except Exception as e:
            print(f"{variant}[tile_m={tm}] failed: {repr(e)[:200]}",
                  flush=True)

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

for variant in ("v1", "v2"):
    for tm in (512, 2048):
        try:
            k = jax.jit(lambda ext: channelize_demod(
                ext, hp_k, model._Wr, model._Wi, prev,
                float(model._fm_ref), tile_m=tm, variant=variant))
            dt = timeit(lambda: k(ext))
            print(f"kernel alone {variant}[tile_m={tm}]: "
                  f"{dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"kernel {variant}[tile_m={tm}] failed: "
                  f"{repr(e)[:200]}", flush=True)

# v3 correctness on device
ref, _ = model.jitted_step()(model.init_state(), iq)
got, _ = model.jitted_step_pallas(tile_m=2048, variant="v3")(
    model.init_state_v3(), iq)
err = np.abs(np.asarray(got) - np.asarray(ref)).max()
print(f"v3 max err vs XLA path: {err:.3e}", flush=True)
