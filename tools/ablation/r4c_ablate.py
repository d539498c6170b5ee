"""Round-4 ablation C: channelizer atan variants + ct3 kb blocking."""
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
from cyberether_tpu.ops.pallas_kernels import (
    channelize_demod_decim_v5, spectrum_fused_ct3)


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
C, P, D = 64, 8, 16
rng = np.random.default_rng(1)
iq = jax.device_put(rng.standard_normal(
    (frames, model.channels, 2)).astype(np.float32))

# device correctness of the atan variants (full-band FM input)
try:
    Mc = 8192
    iqc = jax.device_put(model.make_input_full(Mc))
    ref = np.asarray(model.jitted_step()(model.init_state(), iqc)[0])
    x2c = iqc.reshape(Mc, 2 * C)
    x3c = x2c.reshape(Mc // 512, 512, 2 * C)
    halosc = jnp.concatenate(
        [jnp.zeros((1, P, 2 * C)), x3c[:-1, 512 - P:, :]], axis=0)
    for am in ("recip", "fast", "fast3", "pack"):
        got = np.asarray(jax.jit(
            lambda x2, h, am=am: channelize_demod_decim_v5(
                x2, h, model._hp5, model._bperm5,
                float(model._fm_ref), D, tile_m=512, atan_mode=am)
        )(x2c, halosc))
        print(f"chan atan={am}: max err vs XLA = "
              f"{np.abs(got - ref).max():.3e}", flush=True)
except Exception:
    traceback.print_exc()


def chan_chain(tile, kw):
    x2 = iq.reshape(frames, 2 * C)
    grid = frames // tile

    def mk(nlen):
        @jax.jit
        def f(x2i):
            def body(carry, _):
                hist, acc = carry
                x3 = x2i.reshape(grid, tile, 2 * C)
                halos = jnp.concatenate(
                    [hist[None], x3[:-1, tile - P:, :]], axis=0)
                audio = channelize_demod_decim_v5(
                    x2i, halos, model._hp5, model._bperm5,
                    float(model._fm_ref), D, tile_m=tile, **kw)
                return (x2i[frames - P:] + 0 * acc,
                        acc + audio[0, 0]), None
            carry, _ = jax.lax.scan(
                body, (jnp.zeros((P, 2 * C)), jnp.float32(0)),
                None, length=nlen)
            return carry[1]
        return lambda: f(x2)
    return mk


for name, kw in (("fastatan", dict(atan_mode="fast")),
                 ("fast3", dict(atan_mode="fast3")),
                 ("pack", dict(atan_mode="pack")),
                 ("pack+gainsel", dict(atan_mode="pack",
                                       gain_in_sel=True)),
                 ("base", {})):
    try:
        per, cs = scan_steady(chan_chain(4096, kw))
        print(f"chan[{name},t4096]: {per*1e3:.3f} ms = "
              f"{frames*64/per/1e9:.2f} G (compile {cs:.1f}s)",
              flush=True)
    except Exception:
        print(f"chan[{name}] FAILED", flush=True)
        traceback.print_exc()

# ---- ct3 kb accuracy on device --------------------------------------
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
    co, sc, of = (float(pipe_a._coeff), float(pipe_a._scale),
                  float(pipe_a._offset))
    wina = np.asarray(pipe_a._win)
    for st, tm, kb in (("highest", True, 4), ("x3", True, 4),
                       ("x4", True, 4)):
        got = np.asarray(jax.jit(
            lambda q: spectrum_fused_ct3(q, wina, co, sc, of,
                                         stage2=st, three_mul=tm,
                                         kb=kb))(iqa_d))
        print(f"ct3[{st},3m={tm},kb={kb}]: max|err| vs f64 = "
              f"{np.abs(got - truth).max():.3e}", flush=True)
except Exception:
    traceback.print_exc()

# ---- ct3 kb timing ---------------------------------------------------
pipe = SpectrumPipeline(fft_size=2048, batches=4096)
iqs = jax.device_put(pipe.make_input())
win0 = jnp.asarray(np.asarray(pipe._win))
B, n = pipe.batches, pipe.fft_size
co, sc, of = (float(pipe._coeff), float(pipe._scale),
              float(pipe._offset))

for st, tm, kb, tb in (
        ("default", True, 4, 256), ("default", True, 8, 256),
        ("x3", True, 4, 256), ("x3", True, 8, 256),
        ("highest", True, 2, 256), ("highest", True, 4, 256),
        ("highest", True, 8, 256), ("highest", True, 16, 256),
        ("highest", False, 8, 256), ("highest", True, 8, 128),
        ("x4", True, 8, 256)):
    try:
        def mk(k, st=st, tm=tm, kb=kb, tb=tb):
            @jax.jit
            def f(x, w):
                def body(acc, _):
                    wp = w * (1 + acc * jnp.float32(1e-30))
                    s = spectrum_fused_ct3(x, wp, co, sc, of,
                                           stage2=st, three_mul=tm,
                                           kb=kb, tile_b=tb)
                    return acc + s[0, 0], None
                acc, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=k)
                return acc
            return lambda: f(iqs, win0)

        per, cs = scan_steady(mk)
        print(f"ct3[{st},3m={tm},kb={kb},tb={tb}]: {per*1e3:.3f} ms"
              f" = {B*n/per/1e9:.2f} G (compile {cs:.1f}s)",
              flush=True)
    except Exception:
        print(f"ct3[{st},3m={tm},kb={kb},tb={tb}] FAILED", flush=True)
        traceback.print_exc()

print("done", flush=True)
