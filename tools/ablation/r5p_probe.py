"""Round-5 ablation N: radix-4 stage 1 A/B — cpack2/cpack4 sweep (signed
twiddle rows, select/neg-free odd branch) — two interleaved passes to
separate claim-mode noise from real deltas."""
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

CFGS = (("cpack5:r4:x", 256, 32 * M), ("cpack5:r4:f", 256, 32 * M),
        ("dbatch:r4:x", 256, None), ("dbatch:r4:f", 256, None))
best = {}
for rnd in (1, 2):
    for st, tb, vl in CFGS:
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
            key = f"{st},tb={tb},vl={vl//M if vl else 16}M"
            best[key] = min(best.get(key, 9e9), per)
            print(f"r{rnd} ct5[{key}]: {per*1e3:.3f} ms = "
                  f"{B*n/per/1e9:.2f} G (compile {cs:.1f}s)",
                  flush=True)
        except Exception:
            print(f"r{rnd} ct5[{st},tb={tb}] FAILED", flush=True)
            traceback.print_exc(limit=2)

print("--- best-of-two ---", flush=True)
for key, per in sorted(best.items(), key=lambda kv: kv[1]):
    print(f"{key}: {per*1e3:.3f} ms = {B*n/per/1e9:.2f} G", flush=True)

try:
    pipe_a = SpectrumPipeline(fft_size=2048, batches=64,
                              fast_math=False)
    iqa = pipe_a.make_input()
    x = (iqa[..., 0].astype(np.float64)
         + 1j * iqa[..., 1].astype(np.float64))
    x = x * np.asarray(pipe_a._win, np.float64)
    spec = np.fft.fft(x, axis=-1)
    db = 10 * np.log10(np.maximum(np.abs(spec) ** 2, 1e-60)) \
        + float(pipe_a._coeff)
    truth = 0.5 + 0.5 * np.tanh(
        4 * ((db * float(pipe_a._scale) + float(pipe_a._offset))
             - 0.5))
    iqa_d = jax.device_put(iqa)
    wina = np.asarray(pipe_a._win)
    coa, sca, ofa = (float(pipe_a._coeff), float(pipe_a._scale),
                     float(pipe_a._offset))
    for st in ():
        got = np.asarray(jax.jit(lambda q, st=st: spectrum_fused_ct5(
            q, wina, coa, sca, ofa, stage2=st, tile_b=64))(iqa_d))
        print(f"ct5[{st}]: max|err| vs f64 = "
              f"{np.abs(got - truth).max():.3e}", flush=True)
except Exception:
    traceback.print_exc()
print("done", flush=True)
