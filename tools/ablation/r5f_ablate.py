"""Round-5 ablation F: ypack + chunked decimation (tile 8192 unlock),
and a wbfm tile sweep."""
import os, sys, time, traceback
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp
sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.models.channelizer import Channelizer
from cyberether_tpu.models.wbfm import WbfmReceiver


def fetch_time(fn, reps=5):
    ts = []
    for _ in range(reps + 2):
        t0 = time.perf_counter(); float(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts[2:])[len(ts[2:]) // 2]


def scan_steady(make, k=33, reps=5, min_diff_s=0.025):
    f1 = make(1)
    t0 = time.perf_counter(); float(f1())
    compile_s = time.perf_counter() - t0
    t1 = fetch_time(f1, reps=reps)
    while True:
        fk = make(k); float(fk())
        tk = fetch_time(fk, reps=reps)
        diff = tk - t1
        if diff >= min_diff_s or k >= 512:
            break
        k *= 4
    return max(diff / (k - 1), 1e-9), compile_s


model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
frames = 1 << 17
rng = np.random.default_rng(1)
x2d = jax.device_put(rng.standard_normal(
    (frames, 128)).astype(np.float32))

# numerics: chunk vs sel on device
try:
    st0 = model.init_state_v4()
    a1, _ = jax.jit(lambda s, x: model.step_pallas_v4(
        s, x.reshape(frames, 64, 2), tile_m=4096))(st0, x2d)
    a2, _ = jax.jit(lambda s, x: model.step_pallas_v4(
        s, x.reshape(frames, 64, 2), tile_m=4096,
        decim_mode="chunk"))(st0, x2d)
    print(f"chan chunk-vs-sel max|diff| (device): "
          f"{float(jnp.abs(a1 - a2).max()):.3e}", flush=True)
except Exception:
    print("chan chunk numerics FAILED", flush=True)
    traceback.print_exc()

for label, tile, dm in (
        ("ypack-sel,t4096", 4096, "sel"),
        ("ypack-chunk,t4096", 4096, "chunk"),
        ("ypack-chunk,t8192", 8192, "chunk"),
        ("ypack-chunk,t16384", 16384, "chunk")):
    try:
        def mk(nn, tile=tile, dm=dm):
            @jax.jit
            def f(x2):
                def body(carry, _):
                    st, acc = carry
                    audio, st = model.step_pallas_v4(
                        st, x2.reshape(frames, 64, 2), tile_m=tile,
                        decim_mode=dm)
                    return (st, acc + audio[0, 0]), None
                carry, _ = jax.lax.scan(
                    body, (model.init_state_v4(), jnp.float32(0)),
                    None, length=nn)
                return carry[1]
            return lambda: f(x2d)
        per, cs = scan_steady(mk)
        print(f"chan[{label}]: {per*1e3:.3f} ms = "
              f"{frames*64/per/1e9:.2f} Gsamp/s (compile {cs:.1f}s)",
              flush=True)
    except Exception:
        print(f"chan[{label}] FAILED", flush=True)
        traceback.print_exc()

# wbfm raw-kernel tile_r sweep (default 512)
from cyberether_tpu.ops.pallas_kernels import wbfm_fused_v2

rx = WbfmReceiver()
n = 8_192_000
iqw = jax.device_put(rng.standard_normal((n, 2)).astype(np.float32))
hist0 = jax.tree_util.tree_map(jnp.asarray,
                               rx.init_state())["fir_hist"]
for tile_r in (256, 512, 1024, 2048, 4096):
    try:
        def mk(k, tile_r=tile_r):
            @jax.jit
            def f(x, h):
                def body(carry, _):
                    acc = carry
                    hp = h * (1 + acc * jnp.float32(1e-30))
                    demod = wbfm_fused_v2(x, rx._taps, hp, rx._ref,
                                          tile_r=tile_r)
                    return acc + demod.reshape(-1)[0], None
                acc, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=k)
                return acc
            return lambda: f(iqw, hist0)
        per, cs = scan_steady(mk)
        print(f"wbfm[tile_r={tile_r}]: {per*1e3:.3f} ms = "
              f"{n/per/1e9:.2f} Gsamp/s (compile {cs:.1f}s)",
              flush=True)
    except Exception:
        print(f"wbfm[tile_r={tile_r}] FAILED", flush=True)
        traceback.print_exc()
print("done", flush=True)
