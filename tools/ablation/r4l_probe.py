"""Round-4 probe L: CS8-ingest channelizer rate + device correctness."""
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

# device correctness: i8 vs f32 on dequantized data
try:
    Mc = 8192
    iqf = model.make_input_full(Mc)
    q = np.clip(np.round(iqf * 127.0), -127, 127).astype(np.int8)
    qd = jax.device_put(q.reshape(Mc, 128))
    fd = jax.device_put(q.astype(np.float32).reshape(Mc, 128))
    af = jax.jit(lambda x: model.step_pallas_v4(
        model.init_state_v4(), x.reshape(Mc, 64, 2), tile_m=512)[0])(fd)
    ai = jax.jit(lambda x: model.step_pallas_v4(
        model.init_state_v4(jnp.int8), x.reshape(Mc, 64, 2),
        tile_m=512)[0])(qd)
    print(f"cs8 vs f32(deq) on device: max diff = "
          f"{np.abs(np.asarray(ai) - np.asarray(af)).max():.3e}",
          flush=True)
except Exception:
    traceback.print_exc()

for tile in (4096, 8192):
    try:
        iq8 = jax.device_put(np.clip(
            rng.standard_normal((frames, 128)) * 64, -127,
            127).astype(np.int8))

        def mk8(n, tile=tile):
            @jax.jit
            def f(x8):
                def body(carry, _):
                    st, acc = carry
                    audio, st = model.step_pallas_v4(
                        st, x8.reshape(frames, 64, 2), tile_m=tile)
                    return (st, acc + audio[0, 0]), None
                carry, _ = jax.lax.scan(
                    body, (model.init_state_v4(jnp.int8),
                           jnp.float32(0)), None, length=n)
                return carry[1]
            return lambda: f(iq8)
        per = scan_steady(mk8)
        print(f"chan[cs8,t{tile}]: {per*1e3:.3f} ms = "
              f"{frames*64/per/1e9:.2f} Gsamp/s", flush=True)
    except Exception:
        print(f"chan[cs8,t{tile}] FAILED", flush=True)
        traceback.print_exc()
print("done", flush=True)
