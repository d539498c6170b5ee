"""One-off: locate v2 on-device error positions."""
import sys
import numpy as np, jax, jax.numpy as jnp
sys.stderr.write(f"{jax.devices()}\n")
from cyberether_tpu.models.wbfm import WbfmReceiver
from cyberether_tpu.ops.pallas_kernels import wbfm_fused

model = WbfmReceiver()
n = 5120 * 40
iqs = jnp.asarray(model.make_input(n))
x = iqs.T
hist = jnp.zeros((2, 128), jnp.float32)

# reference demod from the XLA step (before decimation)
from cyberether_tpu.ops.firs import fir_fft_streaming
filt, _ = jax.jit(fir_fft_streaming)(x, model._taps, hist)
yr, yi = filt[0], filt[1]
pr = jnp.concatenate([jnp.zeros((1,)), yr[:-1]])
pi = jnp.concatenate([jnp.zeros((1,)), yi[:-1]])
ref = np.asarray(jnp.arctan2(pr * yi - pi * yr, pr * yr + pi * yi)
                 * model._ref)

got = np.asarray(jax.jit(lambda x: wbfm_fused(
    x, model._taps, hist, float(model._ref)))(x))
err = np.abs(got - ref)
print("max err", err.max(), "mean", err.mean())
bad = np.where(err > 1e-3)[0]
print("n bad:", bad.size)
if bad.size:
    print("first bad:", bad[:20])
    print("bad % 128 histogram (cols):",
          np.unique(bad % 128, return_counts=True))
    print("bad // (512*128) (tiles):",
          np.unique(bad // (512 * 128), return_counts=True)[0][:20])
    rows = np.unique(bad // 128)
    print("bad rows:", rows[:20], "... count", rows.size)
