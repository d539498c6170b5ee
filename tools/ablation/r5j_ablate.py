"""Round-5 ablation J: cpack2 at bigger batch tiles via
vmem_limit_bytes (the tb=256 compile was 1.38M over the default 16M
scoped-vmem limit; CompilerParams can raise it)."""
import os, sys, time, traceback
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp
sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.models.spectrum import SpectrumPipeline
from cyberether_tpu.ops.pallas_kernels import spectrum_fused_ct5


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


pipe = SpectrumPipeline(fft_size=2048, batches=4096)
iqs = jax.device_put(pipe.make_input())
win0 = jnp.asarray(np.asarray(pipe._win))
B, n = pipe.batches, pipe.fft_size
co, sc_, of = (float(pipe._coeff), float(pipe._scale),
               float(pipe._offset))
M = 1024 * 1024

for st, tb, vl in (("cpack2", 256, 32 * M), ("cpack2", 256, 64 * M),
                   ("cpack2", 512, 64 * M), ("cpack2", 1024, 96 * M),
                   ("cpack4", 256, 32 * M),
                   ("highest", 256, 32 * M),
                   ("dbatch", 512, 32 * M)):
    try:
        def mk(k, st=st, tb=tb, vl=vl):
            @jax.jit
            def f(x, w):
                def body(acc, _):
                    wp = w * (1 + acc * jnp.float32(1e-30))
                    s = spectrum_fused_ct5(x, wp, co, sc_, of,
                                           stage2=st, tile_b=tb,
                                           vmem_limit=vl)
                    return acc + s[0, 0], None
                acc, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=k)
                return acc
            return lambda: f(iqs, win0)
        per, cs = scan_steady(mk)
        print(f"ct5[{st},tb={tb},vl={vl//M}M]: {per*1e3:.3f} ms = "
              f"{B*n/per/1e9:.2f} G (compile {cs:.1f}s)", flush=True)
    except Exception:
        print(f"ct5[{st},tb={tb},vl={vl//M}M] FAILED", flush=True)
        traceback.print_exc(limit=2)
print("done", flush=True)
