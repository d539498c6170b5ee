"""Round-4 ablation E: ct4 (window-folded, kb-unrolled) timing +
accuracy; channelizer model-path re-measure."""
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
from cyberether_tpu.models.spectrum import SpectrumPipeline
from cyberether_tpu.ops.pallas_kernels import spectrum_fused_ct4


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


pipe = SpectrumPipeline(fft_size=2048, batches=4096)
iqs = jax.device_put(pipe.make_input())
win0 = jnp.asarray(np.asarray(pipe._win))
B, n = pipe.batches, pipe.fft_size
co, sc, of = (float(pipe._coeff), float(pipe._scale),
              float(pipe._offset))

for st, kb in (("default", 1), ("default", 2), ("default", 4),
               ("default", 8), ("x4", 2), ("x4", 4), ("x4", 8),
               ("highest", 2), ("highest", 4), ("highest", 8)):
    try:
        def mk(k, st=st, kb=kb):
            @jax.jit
            def f(x, w):
                def body(acc, _):
                    wp = w * (1 + acc * jnp.float32(1e-30))
                    s = spectrum_fused_ct4(x, wp, co, sc, of,
                                           stage2=st, kb=kb)
                    return acc + s[0, 0], None
                acc, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=k)
                return acc
            return lambda: f(iqs, win0)

        per, cs = scan_steady(mk)
        print(f"ct4[{st},kb={kb}]: {per*1e3:.3f} ms = "
              f"{B*n/per/1e9:.2f} G (compile {cs:.1f}s)", flush=True)
    except Exception:
        print(f"ct4[{st},kb={kb}] FAILED", flush=True)
        traceback.print_exc()

# accuracy on device
try:
    pipe_a = SpectrumPipeline(fft_size=2048, batches=64,
                              fast_math=False)
    iqa = pipe_a.make_input()
    x = (iqa[..., 0].astype(np.float64)
         + 1j * iqa[..., 1].astype(np.float64))
    x = x * np.asarray(pipe_a._win, np.float64)
    spec = np.fft.fft(x, axis=-1)
    mag2 = np.maximum(np.abs(spec) ** 2, 1e-60)
    db = 10 * np.log10(mag2) + float(pipe_a._coeff)
    norm = db * float(pipe_a._scale) + float(pipe_a._offset)
    truth = 0.5 + 0.5 * np.tanh(4 * (norm - 0.5))
    iqa_d = jax.device_put(iqa)
    coa, sca, ofa = (float(pipe_a._coeff), float(pipe_a._scale),
                     float(pipe_a._offset))
    wina = np.asarray(pipe_a._win)
    for st, kb in (("highest", 4), ("x4", 4), ("default", 4)):
        got = np.asarray(jax.jit(
            lambda q, st=st, kb=kb: spectrum_fused_ct4(
                q, wina, coa, sca, ofa, stage2=st, kb=kb))(iqa_d))
        print(f"ct4[{st},kb={kb}]: max|err| vs f64 = "
              f"{np.abs(got - truth).max():.3e}", flush=True)
except Exception:
    traceback.print_exc()

# channelizer model-path re-measure (r4d saw 0.307 once — degraded
# episode or real?)
model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
frames = 1 << 17
rng = np.random.default_rng(1)
iq = jax.device_put(rng.standard_normal(
    (frames, model.channels, 2)).astype(np.float32))
try:
    def mk(nlen):
        @jax.jit
        def f(iq):
            def body(carry, _):
                st, acc = carry
                audio, st = model.step_pallas_v4(st, iq, tile_m=4096)
                return (st, acc + audio[0, 0]), None
            carry, _ = jax.lax.scan(
                body, (model.init_state_v4(), jnp.float32(0)),
                None, length=nlen)
            return carry[1]
        return lambda: f(iq)
    for rep in range(2):
        per, cs = scan_steady(mk)
        print(f"chan[model-default,t4096] rep{rep}: {per*1e3:.3f} ms"
              f" = {frames*64/per/1e9:.2f} G (compile {cs:.1f}s)",
              flush=True)
except Exception:
    traceback.print_exc()

print("done", flush=True)
