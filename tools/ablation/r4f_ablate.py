"""Round-4 ablation F: model-vs-raw channelizer gap (input layout
theory) + dispatch decomposition probe."""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

sys.stderr.write(f"devices: {jax.devices()}\n")

from cyberether_tpu.models.channelizer import Channelizer
from cyberether_tpu.ops.pallas_kernels import channelize_demod_decim_v5


def fetch_time(fn, reps=5):
    ts = []
    for _ in range(reps + 2):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts[2:])
    return ts[len(ts) // 2]


def scan_steady(make, k=33, reps=5, min_diff_s=0.025):
    f1 = make(1)
    t0 = time.perf_counter()
    float(f1())
    compile_s = time.perf_counter() - t0
    t1 = fetch_time(f1, reps=reps)
    while True:
        fk = make(k)
        float(fk())
        tk = fetch_time(fk, reps=reps)
        diff = tk - t1
        if diff >= min_diff_s or k >= 512:
            break
        k *= 4
    return max(diff / (k - 1), 1e-9), compile_s


model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
frames = 1 << 17
C, P = 64, 8
rng = np.random.default_rng(1)
iq_np = rng.standard_normal((frames, C, 2)).astype(np.float32)
iq = jax.device_put(iq_np)                       # (M, 64, 2) layout
x2d = jax.device_put(iq_np.reshape(frames, 128))  # (M, 128) layout

# 1) raw-kernel chain on the (M, 128) array
def mk_raw(nlen):
    @jax.jit
    def f(x2i):
        def body(carry, _):
            hist, acc = carry
            x3 = x2i.reshape(frames // 4096, 4096, 2 * C)
            halos = jnp.concatenate(
                [hist[None], x3[:-1, 4096 - P:, :]], axis=0)
            audio = channelize_demod_decim_v5(
                x2i, halos, model._hp5, model._bperm5,
                float(model._fm_ref), 16, tile_m=4096,
                atan_mode="fast3")
            return (x2i[frames - P:] + 0 * acc,
                    acc + audio[0, 0]), None
        carry, _ = jax.lax.scan(
            body, (jnp.zeros((P, 2 * C)), jnp.float32(0)),
            None, length=nlen)
        return carry[1]
    return lambda: f(x2d)


# 2) model chain on the (M, 64, 2) array (bench configuration)
def mk_model(nlen):
    @jax.jit
    def f(iqi):
        def body(carry, _):
            st, acc = carry
            audio, st = model.step_pallas_v4(st, iqi, tile_m=4096)
            return (st, acc + audio[0, 0]), None
        carry, _ = jax.lax.scan(
            body, (model.init_state_v4(), jnp.float32(0)),
            None, length=nlen)
        return carry[1]
    return lambda: f(iq)


# 3) model chain but the INPUT ARRAY is (M, 128); reshaped to
#    (M, 64, 2) inside jit (XLA cancels the reshape pair) — isolates
#    the device LAYOUT of the (M, 64, 2) input from the model code
def mk_model_flat(nlen):
    @jax.jit
    def f(x2i):
        def body(carry, _):
            st, acc = carry
            audio, st = model.step_pallas_v4(
                st, x2i.reshape(frames, C, 2), tile_m=4096)
            return (st, acc + audio[0, 0]), None
        carry, _ = jax.lax.scan(
            body, (model.init_state_v4(), jnp.float32(0)),
            None, length=nlen)
        return carry[1]
    return lambda: f(x2d)


for name, mk in (("raw-x2", mk_raw), ("model-iq642", mk_model),
                 ("model-flat", mk_model_flat)):
    try:
        per, cs = scan_steady(mk)
        print(f"chan[{name}]: {per*1e3:.3f} ms = "
              f"{frames*64/per/1e9:.2f} G (compile {cs:.1f}s)",
              flush=True)
    except Exception:
        print(f"chan[{name}] FAILED", flush=True)
        traceback.print_exc()

# 4) dispatch decomposition (interactive path)
from cyberether_tpu import Flowgraph

x = jax.device_put(jnp.zeros((8, 128), jnp.float32))
fid = jax.jit(lambda x: x + 1.0)
y = fid(x)
jax.block_until_ready(y)
t0 = time.perf_counter()
y = x
for _ in range(100):
    y = fid(y)
jax.block_until_ready(y)
print(f"bare-dispatch: {(time.perf_counter()-t0)/100*1e3:.3f} "
      f"ms/dispatch", flush=True)

rng = np.random.default_rng(0)
nb, n = 512, 2048
buf = rng.standard_normal((nb, n)).astype(np.float32)
fg = Flowgraph()
fg.block_create("src", "dti", {"shape": [nb, n], "dataType": "F32"})
fg.records["src"].build.modules["src/m"].attach_buffer(buf)
fg.block_create("spec", "spectrum_engine", {"enableScale": True},
                {"buffer": "${graph.src.output.buffer}"})
for _ in range(3):
    assert fg.compute(timeout=60.0)
fg.scheduler.synchronize()
steps = 30
t0 = time.perf_counter()
for _ in range(steps):
    fg.compute(timeout=30.0)
fg.scheduler.synchronize()
print(f"fg.compute() full: "
      f"{(time.perf_counter()-t0)/steps*1e3:.3f} ms/cycle",
      flush=True)

sched = fg.scheduler
seg = next(s for s in sched._segments if hasattr(s, "fn")
           and getattr(s, "ext_inputs", None) is not None)
ext_vals = {}
for kk in seg.ext_inputs:
    v = sched._latest[kk]
    ext_vals[kk] = jax.device_put(np.asarray(v)) \
        if isinstance(v, np.ndarray) else v
ext_valid = {kk: np.float32(1.0) for kk in seg.ext_inputs}
state_sub = {mname: sched._state[mname] for mname in seg.state_modules
             if mname in sched._state}
out = seg.fn(state_sub, ext_vals, ext_valid, {})
jax.block_until_ready(jax.tree_util.tree_leaves(out[0]))
t0 = time.perf_counter()
o = None
st = state_sub
for _ in range(steps):
    o = seg.fn(st, ext_vals, ext_valid, {})
    st = o[2]
jax.block_until_ready(jax.tree_util.tree_leaves(o[0]))
print(f"seg.fn prepared-args: "
      f"{(time.perf_counter()-t0)/steps*1e3:.3f} ms/cycle",
      flush=True)

t0 = time.perf_counter()
for _ in range(steps):
    sched._poll_sources(1.0)
print(f"_poll_sources: "
      f"{(time.perf_counter()-t0)/steps*1e3:.3f} ms/cycle",
      flush=True)
fg.stop()
print("done", flush=True)
