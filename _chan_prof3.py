"""One-off: v4 channelizer kernel on the TPU — correctness (full-band
noise: FM demod of EMPTY channels is +-2pi phase noise, so make_input's
3-carrier signal cannot be compared elementwise), tile/M sweep, and
burst (lax.scan) dispatch to amortize the tunnel floor."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.models.channelizer import Channelizer


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


def noise(model, frames, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((frames, model.channels, 2)) \
        .astype(np.float32)


model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
C = model.channels

# ---- correctness on device (noise input) ---------------------------
Mc = 4096
iqc = jax.device_put(noise(model, Mc, 0))
ref = np.asarray(model.jitted_step()(model.init_state(), iqc)[0])
for name, fn, st in (
    ("v1", lambda s, x: model.step_pallas(s, x, variant="v1"),
     model.init_state()),
    ("v2", lambda s, x: model.step_pallas(s, x, variant="v2"),
     model.init_state()),
    ("v4", lambda s, x: model.step_pallas_v4(s, x),
     model.init_state_v4()),
):
    got = np.asarray(jax.jit(fn)(st, iqc)[0])
    print(f"{name} max err vs XLA (noise): "
          f"{np.abs(got - ref).max():.3e}", flush=True)

# ---- timing ---------------------------------------------------------
M = 1 << 17
iq = jax.device_put(noise(model, M, 1))
for tm in (512, 2048):
    step = model.jitted_step_pallas_v4(tile_m=tm)
    st = model.init_state_v4()
    dt = timeit(lambda: step(st, iq))
    print(f"v4[M=128Ki,tile={tm}]: {dt*1e3:.2f} ms "
          f"({M*C/dt/1e9:.2f} GS/s)", flush=True)

for MM in (1 << 19, 1 << 20):
    try:
        iqL = jax.device_put(noise(model, MM, 2))
        step = model.jitted_step_pallas_v4(tile_m=2048)
        st = model.init_state_v4()
        dt = timeit(lambda: step(st, iqL), steps=10)
        print(f"v4[M={MM>>10}Ki,tile=2048]: {dt*1e3:.2f} ms "
              f"({MM*C/dt/1e9:.2f} GS/s)", flush=True)
        del iqL
    except Exception as e:
        print(f"v4[M={MM}] failed: {repr(e)[:200]}", flush=True)

# ---- burst: K chunks per dispatch via lax.scan ----------------------
K = 8
iqs = jax.device_put(np.stack([noise(model, M, 3 + s)
                               for s in range(K)]))


def make_burst(tm):
    def body(st, one):
        audio, st = model.step_pallas_v4(st, one, tile_m=tm)
        return st, audio

    @jax.jit
    def burst(st, iqs):
        st, audios = jax.lax.scan(body, st, iqs)
        return audios, st
    return burst


for tm in (512, 2048):
    try:
        burst = make_burst(tm)
        st = model.init_state_v4()
        dt = timeit(lambda: burst(st, iqs), steps=10)
        print(f"v4 burst[K=8,M=128Ki,tile={tm}]: {dt*1e3:.2f} ms "
              f"({K*M*C/dt/1e9:.2f} GS/s)", flush=True)
    except Exception as e:
        print(f"burst[tile={tm}] failed: {repr(e)[:200]}", flush=True)

# ---- burst correctness (streaming continuity across chunks) ---------
burst = make_burst(512)
audios, _ = burst(model.init_state_v4(), iqs)
st = model.init_state()
step = model.jitted_step()
outs = []
for s in range(K):
    a, st = step(st, iqs[s])
    outs.append(np.asarray(a))
err = np.abs(np.asarray(audios) - np.stack(outs)).max()
print(f"v4 burst max err vs XLA streaming: {err:.3e}", flush=True)
