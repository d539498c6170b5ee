"""One-off: locate v2 on-device error positions.

Compares the fused kernel against TWO references on the same device:
  ref_fft   — fir_fft_streaming (different FIR algorithm)
  ref_mm    — the identical banded-matmul FIR computed by plain XLA
and correlates the error positions with |y| (discriminator amplitude).
"""
import sys
import numpy as np, jax, jax.numpy as jnp
sys.stderr.write(f"{jax.devices()}\n")
from cyberether_tpu.models.wbfm import WbfmReceiver
from cyberether_tpu.ops.pallas_kernels import wbfm_fused, _wbfm_bands

model = WbfmReceiver()
n = 5120 * 40
iqs = jnp.asarray(model.make_input(n))
x = iqs.T
T = int(model._taps.shape[-1])
K = T - 1
hist = jnp.zeros((2, K), jnp.float32)


def ref_mm(x, hist):
    h = np.asarray(model._taps, np.float32)
    A = jnp.asarray(_wbfm_bands(h.tobytes()))
    nf = x.shape[-1] // 128
    xc = x.reshape(2, nf, 128)
    hrow = jnp.concatenate(
        [jnp.zeros((2, 128 - K), jnp.float32), hist], axis=-1)
    xp = jnp.concatenate([hrow[:, None, :], xc[:, :-1, :]], axis=1)
    y = (jnp.einsum("znc,ck->znk", xp, A[0:128]) +
         jnp.einsum("znc,ck->znk", xc, A[128:256])).reshape(2, -1)
    yr, yi = y[0], y[1]
    pr = jnp.concatenate([jnp.zeros((1,)), yr[:-1]])
    pi = jnp.concatenate([jnp.zeros((1,)), yi[:-1]])
    dem = jnp.arctan2(pr * yi - pi * yr, pr * yr + pi * yi) * model._ref
    amp = jnp.sqrt(yr * yr + yi * yi)
    return dem, amp


ref, amp = jax.jit(ref_mm)(x, hist)
ref = np.asarray(ref)
amp = np.asarray(amp)

got = np.asarray(jax.jit(lambda x: wbfm_fused(
    x, model._taps, hist, float(model._ref)))(x))
err = np.abs(got - ref)
print("vs matmul-XLA ref: max err", err.max(), "mean", err.mean())
bad = np.where(err > 1e-3)[0]
print("n bad:", bad.size)
if bad.size:
    print("amp stats overall: median", np.median(amp), "p1",
          np.percentile(amp, 1))
    print("amp at bad:", np.percentile(amp[bad], [0, 50, 100]))
    # error weighted by amplitude (rad * amp ~ sensitivity-normalized)
    werr = err * amp
    print("amp-weighted err max:", werr.max())
    print("first bad:", bad[:10])
