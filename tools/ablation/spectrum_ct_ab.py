"""A/B the Cooley-Tukey fused spectrum kernel against the full-DFT
kernel on the real chip (differential-chain timing, bench methodology).

Run from /root/repo:  python tools/ablation/spectrum_ct_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

sys.stderr.write(f"{jax.devices()}\n")

from cyberether_tpu.models.spectrum import SpectrumPipeline  # noqa: E402

pipe = SpectrumPipeline(fft_size=2048, batches=4096)
iq = jax.device_put(jnp.asarray(pipe.make_input()))
nsamp = pipe.batches * pipe.fft_size


def chain(stepfn, k):
    @jax.jit
    def f(x):
        acc = jnp.float32(0)
        out = x
        for _ in range(k):
            s = stepfn(out)
            acc = acc + jnp.sum(s[:2, :2])
            out = out + acc * 1e-20
        return acc
    return f


def measure(name, stepfn, reps=3, k=5):
    f1, fk = chain(stepfn, 1), chain(stepfn, k)
    float(f1(iq))  # compile + warm
    float(fk(iq))
    t1 = min(_t(f1) for _ in range(reps))
    tk = min(_t(fk) for _ in range(reps))
    per = (tk - t1) / (k - 1)
    print(f"{name}: {per*1e3:.3f} ms/step = {nsamp/per/1e9:.2f} Gsamp/s")
    return per


def _t(f):
    t0 = time.perf_counter()
    float(f(iq))
    return time.perf_counter() - t0


# correctness first: ct vs dft on device
ref = np.asarray(jax.jit(pipe.step_pallas)(iq))
got = np.asarray(jax.jit(pipe.step_pallas_ct)(iq))
err = np.abs(got - ref)
print("ct vs fused-dft on device: max", err.max(), "q999",
      np.quantile(err, 0.999))

measure("pallas-ct ", pipe.step_pallas_ct)
measure("pallas-f32", pipe.step_pallas)
measure("pallas-b16", lambda x: pipe.step_pallas(x, bf16=True))
