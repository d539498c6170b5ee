"""One-off: fused Pallas WBFM on the real TPU — correctness vs the
XLA conv path, then steady-state timing."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu.models.wbfm import WbfmReceiver

rx = WbfmReceiver(fir_impl="conv", fast_atan2=True)

# correctness on a small block first
n_small = 128 * 40 * 8
iq_s = jax.device_put(rx.make_input(n_small, seed=1))
ref, ref_st = jax.jit(rx.step)(rx.init_state(), iq_s)
got, got_st = rx.jitted_step_pallas()(rx.init_state(), iq_s)
err = np.abs(np.asarray(got) - np.asarray(ref)).max()
print(f"small-block max err vs conv path: {err:.2e}", flush=True)
assert err < 2e-4, err

n = 8_192_000
iq = jax.device_put(rx.make_input(n))


def time_steps(step, state0, steps=10):
    st = state0
    for _ in range(3):
        audio, st = step(st, iq)
    jax.block_until_ready(audio)
    t0 = time.perf_counter()
    for _ in range(steps):
        audio, st = step(st, iq)
    jax.block_until_ready(audio)
    return (time.perf_counter() - t0) / steps


for name, step in (("pallas", rx.jitted_step_pallas()),):
    dt = time_steps(step, rx.init_state())
    print(f"wbfm[{name}]: {n/dt/1e6:.1f} Msamp/s ({dt*1e3:.2f} ms)",
          flush=True)
