import sys, time
import numpy as np
import jax
sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.models.wbfm import WbfmReceiver

def time_steps(step, state0, iq, steps=10):
    st = state0
    for _ in range(3):
        audio, st = step(st, iq)
    jax.block_until_ready(audio)
    t0 = time.perf_counter()
    for _ in range(steps):
        audio, st = step(st, iq)
    jax.block_until_ready(audio)
    return (time.perf_counter() - t0) / steps

for impl, fast, fs in (("conv", False, 0), ("fft", False, 8192),
                       ("fft", True, 8192), ("fft", True, 16384),
                       ("fft", True, 32768)):
    rx = WbfmReceiver(fir_impl=impl, fast_atan2=fast)
    n = (1 << 23) // rx.audio_decim * rx.audio_decim
    iq = jax.device_put(rx.make_input(n))
    if impl == "fft" and fs:
        import functools
        from cyberether_tpu.ops import firs
        orig = firs.fir_fft_streaming
        firs_fft = functools.partial(orig, fft_size=fs)
        # monkeypatch fft size for the sweep
        firs.fir_fft_streaming = firs_fft
    step = rx.jitted_step()
    dt = time_steps(step, rx.init_state(), iq)
    if impl == "fft" and fs:
        firs.fir_fft_streaming = orig
    print(f"wbfm[{impl}{'+fastatan' if fast else ''}"
          f"{f' L={fs}' if impl=='fft' else ''}]: "
          f"{n/dt/1e6:.1f} Msamp/s  ({dt*1e3:.2f} ms)", flush=True)
