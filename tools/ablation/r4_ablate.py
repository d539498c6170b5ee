"""Round-4 TPU ablation: channelizer v6 vs v5, CT spectrum ct2 vs ct1.

NOTE: the ct2 kernel measured here was removed after losing
(reproduce via spectrum_fused_ct3(kb=...)); the ct2 cases below are
kept for the record but now raise ImportError if run.

Measures with the bench.py differential-chain method (scan with a
carried dependency).  Run as a single deliberate TPU job:

    timeout 1800 python tools/ablation/r4_ablate.py
"""
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
    per = max(diff / (k - 1), 1e-9)
    return per, compile_s


# ---- channelizer ----------------------------------------------------
model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
frames = 1 << 17
rng = np.random.default_rng(1)
iq = jax.device_put(rng.standard_normal(
    (frames, model.channels, 2)).astype(np.float32))

# correctness on device, full-band FM input
try:
    Mc = 8192
    iqc = jax.device_put(model.make_input_full(Mc))
    ref = np.asarray(model.jitted_step()(model.init_state(), iqc)[0])
    for name in ("v5", "v6"):
        got = np.asarray(model.jitted_step_pallas_v4(kernel=name)(
            model.init_state_v4(), iqc)[0])
        print(f"chan {name} max err vs XLA (device): "
              f"{np.abs(got - ref).max():.3e}", flush=True)
except Exception:
    traceback.print_exc()

for kern, tile, mode in (("v5", 2048, "sel"), ("v6", 2048, "chunk"),
                         ("v6", 2048, "big"), ("v5", 4096, "sel"),
                         ("v6", 4096, "chunk"), ("v6", 8192, "chunk")):
    try:
        def mk(n, kern=kern, tile=tile, mode=mode):
            @jax.jit
            def f(iq):
                def body(carry, _):
                    st, acc = carry
                    audio, st = model.step_pallas_v4(
                        st, iq, tile_m=tile, kernel=kern,
                        decim_mode=mode)
                    return (st, acc + audio[0, 0]), None
                carry, _ = jax.lax.scan(
                    body, (model.init_state_v4(), jnp.float32(0)),
                    None, length=n)
                return carry[1]
            return lambda: f(iq)

        per, compile_s = scan_steady(mk)
        rate = frames * 64 / per
        print(f"chan[{kern},t{tile},{mode}]: {per*1e3:.3f} ms/step = "
              f"{rate/1e9:.2f} Gsamp/s (compile {compile_s:.1f}s)",
              flush=True)
    except Exception:
        print(f"chan[{kern},t{tile},{mode}] FAILED", flush=True)
        traceback.print_exc()

# ---- spectrum accuracy on device vs f64 truth -----------------------
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
    for label, kw in (
            ("ct1-exact", dict(version="ct1", exact=True)),
            ("ct2-highest", dict(stage2="highest")),
            ("ct2-high", dict(stage2="high")),
            ("ct2-default", dict(stage2="default"))):
        got = np.asarray(jax.jit(
            lambda q, kw=kw: pipe_a.step_pallas_ct(q, **kw))(iqa_d))
        print(f"spectrum {label}: max |err| vs f64 = "
              f"{np.abs(got - truth).max():.3e}", flush=True)
except Exception:
    traceback.print_exc()

# ---- spectrum timing ------------------------------------------------
pipe = SpectrumPipeline(fft_size=2048, batches=4096)
iqs = jax.device_put(pipe.make_input())
win0 = jnp.asarray(np.asarray(pipe._win))
B, n = pipe.batches, pipe.fft_size

for label, kw in (
        ("ct1-exact", dict(version="ct1", exact=True)),
        ("ct1-fast", dict(version="ct1", exact=False)),
        ("ct2-highest", dict(stage2="highest")),
        ("ct2-high", dict(stage2="high")),
        ("ct2-default", dict(stage2="default")),
        ("ct2-high-tb256", dict(stage2="high", tb=256)),
        ("ct2-high-g16", dict(stage2="high", gr=16))):
    try:
        tb = kw.pop("tb", 128)
        gr = kw.pop("gr", 8)

        def stepfn(x, w, kw=kw, tb=tb, gr=gr):
            if kw.get("version") == "ct1":
                return pipe.step_pallas_ct(x, win=w, **kw)
            from cyberether_tpu.ops.pallas_kernels import \
                spectrum_fused_ct2  # removed post-ablation
            return spectrum_fused_ct2(
                x, w, float(pipe._coeff), float(pipe._scale),
                float(pipe._offset), tile_b=tb,
                stage2=kw["stage2"], group_rows=gr)

        def mk(k, stepfn=stepfn):
            @jax.jit
            def f(x, w):
                def body(acc, _):
                    wp = w * (1 + acc * jnp.float32(1e-30))
                    s = stepfn(x, wp)
                    return acc + s[0, 0], None
                acc, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=k)
                return acc
            return lambda: f(iqs, win0)

        per, compile_s = scan_steady(mk)
        print(f"spectrum[{label}]: {per*1e3:.3f} ms/step = "
              f"{B*n/per/1e9:.2f} Gsamp/s (compile {compile_s:.1f}s)",
              flush=True)
    except Exception:
        print(f"spectrum[{label}] FAILED", flush=True)
        traceback.print_exc()

print("done", flush=True)
