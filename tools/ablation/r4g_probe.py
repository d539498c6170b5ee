"""Round-4 probe G: what scales the tunnel's per-dispatch cost?
(arg count, result count, donation, executable size) + flowgraph
channelizer burst with the CF32 source."""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

sys.stderr.write(f"devices: {jax.devices()}\n")


def loop_time(f, args, steps=60):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(steps):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / steps


x = jax.device_put(jnp.zeros((8, 128), jnp.float32))
xs = [jax.device_put(jnp.full((8, 128), i, jnp.float32))
      for i in range(10)]

f1 = jax.jit(lambda x: x + 1.0)
print(f"1-arg 1-res: {loop_time(f1, (x,))*1e3:.3f} ms", flush=True)

f10r = jax.jit(lambda x: tuple(x + i for i in range(10)))
print(f"1-arg 10-res: {loop_time(f10r, (x,))*1e3:.3f} ms", flush=True)

f10a = jax.jit(lambda *xs: sum(xs))
print(f"10-arg 1-res: {loop_time(f10a, tuple(xs))*1e3:.3f} ms",
      flush=True)

fdict = jax.jit(lambda d: {k: v + 1 for k, v in d.items()})
d = {f"k{i}": xs[i] for i in range(10)}
print(f"dict10-arg dict10-res: {loop_time(fdict, (d,))*1e3:.3f} ms",
      flush=True)

fdon = jax.jit(lambda x: x + 1.0, donate_argnums=(0,))
t0 = time.perf_counter()
y = jax.device_put(jnp.zeros((8, 128), jnp.float32))
jax.block_until_ready(y)
steps = 60
t0 = time.perf_counter()
for _ in range(steps):
    y = fdon(y)
jax.block_until_ready(y)
print(f"donated chain: {(time.perf_counter()-t0)/steps*1e3:.3f} ms",
      flush=True)

# big executable, small args: does program size matter?
big = jax.device_put(jnp.zeros((2048, 2048), jnp.float32))
fbig = jax.jit(lambda a: ((a @ a) @ a)[0, 0:128])
print(f"big-exe (3 matmuls 2048^3): "
      f"{loop_time(fbig, (big,))*1e3:.3f} ms  (incl ~3x4.6ms compute)",
      flush=True)

# flowgraph channelizer burst with the CF32 source (bench r4 config)
from cyberether_tpu import Flowgraph

frames = 1 << 17
rng = np.random.default_rng(0)
buf = (rng.standard_normal((frames, 64))
       + 1j * rng.standard_normal((frames, 64))).astype(np.complex64)
fg = Flowgraph()
fg.block_create("src", "dti", {"shape": [frames, 64],
                               "dataType": "CF32"})
fg.records["src"].build.modules["src/m"].attach_buffer(buf)
fg.block_create("chan", "channelizer", {"tileM": 4096},
                {"buffer": "${graph.src.output.buffer}"},
                provider="pallas")
try:
    for _ in range(2):
        assert fg.compute(timeout=120.0)
    for k in (128,):
        for _ in range(2):
            assert fg.scheduler.compute_burst(k, timeout=120.0) == k
        fg.scheduler.synchronize()
        t0 = time.perf_counter()
        nb = 3
        for _ in range(nb):
            assert fg.scheduler.compute_burst(k, timeout=120.0) == k
        fg.scheduler.synchronize()
        dt = (time.perf_counter() - t0) / (nb * k)
        print(f"flowgraph-chan-burst[{k}] cf32: {dt*1e3:.3f} ms/cycle"
              f" = {frames*64/dt/1e9:.2f} G", flush=True)
    # per-dispatch too
    fg.scheduler.synchronize()
    t0 = time.perf_counter()
    steps = 20
    for _ in range(steps):
        fg.compute(timeout=30.0)
    fg.scheduler.synchronize()
    dt = (time.perf_counter() - t0) / steps
    print(f"flowgraph-chan per-dispatch cf32: {dt*1e3:.3f} ms = "
          f"{frames*64/dt/1e9:.2f} G", flush=True)
finally:
    fg.stop()
print("done", flush=True)
