"""Round-4 probe M: coherent-demod channelizer rate."""
import os, sys, time, traceback
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp
sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.models.channelizer import Channelizer


def fetch_time(fn, reps=5):
    ts = []
    for _ in range(reps + 2):
        t0 = time.perf_counter(); float(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts[2:])[len(ts[2:]) // 2]


def scan_steady(make, k=33, reps=5, min_diff_s=0.025):
    f1 = make(1); float(f1())
    t1 = fetch_time(f1, reps=reps)
    while True:
        fk = make(k); float(fk())
        tk = fetch_time(fk, reps=reps)
        diff = tk - t1
        if diff >= min_diff_s or k >= 512:
            break
        k *= 4
    return max(diff / (k - 1), 1e-9)


model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
frames = 1 << 17
rng = np.random.default_rng(1)
x2d = jax.device_put(rng.standard_normal(
    (frames, 128)).astype(np.float32))

for mode in ("classic", "coherent"):
    try:
        def mk(n, mode=mode):
            @jax.jit
            def f(x2):
                def body(carry, _):
                    st, acc = carry
                    audio, st = model.step_pallas_v4(
                        st, x2.reshape(frames, 64, 2), tile_m=4096,
                        demod_mode=mode)
                    return (st, acc + audio[0, 0]), None
                carry, _ = jax.lax.scan(
                    body, (model.init_state_v4(), jnp.float32(0)),
                    None, length=n)
                return carry[1]
            return lambda: f(x2d)
        per = scan_steady(mk)
        print(f"chan[{mode},t4096]: {per*1e3:.3f} ms = "
              f"{frames*64/per/1e9:.2f} Gsamp/s", flush=True)
    except Exception:
        print(f"chan[{mode}] FAILED", flush=True)
        traceback.print_exc()
print("done", flush=True)
