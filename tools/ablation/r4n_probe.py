"""Round-4 probe N: wbfm coherent rate."""
import os, sys, time, traceback
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp
sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.models.wbfm import WbfmReceiver


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


rx = WbfmReceiver()
n = 8_192_000
iq = jax.device_put(rx.make_input(n))
for mode in ("classic", "coherent"):
    try:
        def mk(k, mode=mode):
            @jax.jit
            def f(x):
                def body(carry, _):
                    st, acc = carry
                    audio, st = rx.step_pallas(st, x,
                                               demod_mode=mode)
                    return (st, acc + audio[0]), None
                carry, _ = jax.lax.scan(
                    body, (rx.init_state(), jnp.float32(0)),
                    None, length=k)
                return carry[1]
            return lambda: f(iq)
        per = scan_steady(mk)
        print(f"wbfm[{mode}]: {per*1e3:.3f} ms = "
              f"{n/per/1e9:.2f} Gsamp/s", flush=True)
    except Exception:
        print(f"wbfm[{mode}] FAILED", flush=True)
        traceback.print_exc()
print("done", flush=True)
