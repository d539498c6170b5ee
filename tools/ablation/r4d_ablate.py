"""Round-4 ablation D: ct3 stage decomposition + approx epilogue +
production candidates; channelizer model-path defaults validation."""
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
from cyberether_tpu.ops.pallas_kernels import spectrum_fused_ct3


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


# ---- channelizer through the MODEL path (production defaults) -------
model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
frames = 1 << 17
rng = np.random.default_rng(1)
iq = jax.device_put(rng.standard_normal(
    (frames, model.channels, 2)).astype(np.float32))
try:
    def mk(n):
        @jax.jit
        def f(iq):
            def body(carry, _):
                st, acc = carry
                audio, st = model.step_pallas_v4(st, iq, tile_m=4096)
                return (st, acc + audio[0, 0]), None
            carry, _ = jax.lax.scan(
                body, (model.init_state_v4(), jnp.float32(0)),
                None, length=n)
            return carry[1]
        return lambda: f(iq)
    per, cs = scan_steady(mk)
    print(f"chan[model-default,t4096]: {per*1e3:.3f} ms = "
          f"{frames*64/per/1e9:.2f} G (compile {cs:.1f}s)", flush=True)
except Exception:
    traceback.print_exc()

# ---- ct3 decomposition (default-4M, kb=1) ---------------------------
pipe = SpectrumPipeline(fft_size=2048, batches=4096)
iqs = jax.device_put(pipe.make_input())
win0 = jnp.asarray(np.asarray(pipe.make_input()[0, :, 0] * 0 + 1))
win0 = jnp.asarray(np.asarray(pipe._win))
B, n = pipe.batches, pipe.fft_size
co, sc, of = (float(pipe._coeff), float(pipe._scale),
              float(pipe._offset))


def ct_chain(kw):
    def mk(k):
        @jax.jit
        def f(x, w):
            def body(acc, _):
                wp = w * (1 + acc * jnp.float32(1e-30))
                s = spectrum_fused_ct3(x, wp, co, sc, of, **kw)
                return acc + s[0, 0], None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None,
                                  length=k)
            return acc
        return lambda: f(iqs, win0)
    return mk


for name, kw in (
        ("full-default", dict(stage2="default")),
        ("ep-none", dict(stage2="default", ep="none")),
        ("no-s2", dict(stage2="default", skip=("s2",))),
        ("no-s1", dict(stage2="default", skip=("s1",))),
        ("no-tw", dict(stage2="default", skip=("tw",))),
        ("bare", dict(stage2="default", ep="none",
                      skip=("s1", "s2", "tw"))),
        ("default-apx", dict(stage2="default", ep="approx")),
        ("x4-apx", dict(stage2="x4", ep="approx")),
        ("highest-apx", dict(stage2="highest", ep="approx")),
        ("highest-exact", dict(stage2="highest")),
        ("x4-exact-ep", dict(stage2="x4"))):
    try:
        per, cs = scan_steady(ct_chain(kw))
        print(f"ct3[{name}]: {per*1e3:.3f} ms = "
              f"{B*n/per/1e9:.2f} G (compile {cs:.1f}s)", flush=True)
    except Exception:
        print(f"ct3[{name}] FAILED", flush=True)
        traceback.print_exc()

# ---- accuracy of the candidates on device ---------------------------
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
    for name, kw in (("highest-apx", dict(stage2="highest",
                                          ep="approx")),
                     ("x4-apx", dict(stage2="x4", ep="approx")),
                     ("default-apx", dict(stage2="default",
                                          ep="approx"))):
        got = np.asarray(jax.jit(
            lambda q, kw=kw: spectrum_fused_ct3(
                q, wina, coa, sca, ofa, **kw))(iqa_d))
        print(f"ct3[{name}]: max|err| vs f64 = "
              f"{np.abs(got - truth).max():.3e}", flush=True)
except Exception:
    traceback.print_exc()

print("done", flush=True)
