"""Round-5 ablation B: channelizer ypack (full-width lag+atan) and
spectrum hbatch (batched HIGHEST stage 2)."""
import os, sys, time, traceback
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp
sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.models.channelizer import Channelizer
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


model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
frames = 1 << 17
rng = np.random.default_rng(1)
x2d = jax.device_put(rng.standard_normal(
    (frames, 128)).astype(np.float32))

try:
    st0 = model.init_state_v4()
    a_cl, _ = jax.jit(lambda s, x: model.step_pallas_v4(
        s, x.reshape(frames, 64, 2), tile_m=2048,
        atan_mode="fast3"))(st0, x2d)
    a_yp, _ = jax.jit(lambda s, x: model.step_pallas_v4(
        s, x.reshape(frames, 64, 2), tile_m=2048,
        atan_mode="ypack"))(st0, x2d)
    d = float(jnp.abs(a_cl - a_yp).max())
    print(f"chan ypack-vs-classic max|diff| (device): {d:.3e}",
          flush=True)
except Exception:
    print("chan ypack numerics FAILED", flush=True)
    traceback.print_exc()

for label, tile, mode in (
        ("ypack,t1024", 1024, "ypack"),
        ("ypack,t2048", 2048, "ypack"),
        ("ypack,t4096", 4096, "ypack"),
        ("spack,t1024", 1024, "spack")):
    try:
        def mk(nn, tile=tile, mode=mode):
            @jax.jit
            def f(x2):
                def body(carry, _):
                    st, acc = carry
                    audio, st = model.step_pallas_v4(
                        st, x2.reshape(frames, 64, 2), tile_m=tile,
                        atan_mode=mode)
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

pipe = SpectrumPipeline(fft_size=2048, batches=4096)
iqs = jax.device_put(pipe.make_input())
win0 = jnp.asarray(np.asarray(pipe._win))
B, n = pipe.batches, pipe.fft_size
co, sc_, of = (float(pipe._coeff), float(pipe._scale),
               float(pipe._offset))

for st, tb in (("highest", 128), ("hbatch", 128), ("hbatch", 64),
               ("dbatch", 128), ("dbatch", 256)):
    try:
        def mk(k, st=st, tb=tb):
            @jax.jit
            def f(x, w):
                def body(acc, _):
                    wp = w * (1 + acc * jnp.float32(1e-30))
                    s = spectrum_fused_ct5(x, wp, co, sc_, of,
                                           stage2=st, tile_b=tb)
                    return acc + s[0, 0], None
                acc, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=k)
                return acc
            return lambda: f(iqs, win0)
        per, cs = scan_steady(mk)
        print(f"ct5[{st},tb={tb}]: {per*1e3:.3f} ms = "
              f"{B*n/per/1e9:.2f} G (compile {cs:.1f}s)", flush=True)
    except Exception:
        print(f"ct5[{st},tb={tb}] FAILED", flush=True)
        traceback.print_exc()

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
    for st in ("hbatch", "dbatch"):
        got = np.asarray(jax.jit(lambda q, st=st: spectrum_fused_ct5(
            q, wina, co, sc_, of, stage2=st, tile_b=64))(iqa_d))
        print(f"ct5[{st}]: max|err| vs f64 = "
              f"{np.abs(got - truth).max():.3e}", flush=True)
except Exception:
    traceback.print_exc()
print("done", flush=True)
