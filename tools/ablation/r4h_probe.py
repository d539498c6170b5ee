"""Round-4 probe H: flowgraph interactive + burst after the h2d-split
ordering and no-donation fixes."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp
sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu import Flowgraph

frames = 1 << 17
rng = np.random.default_rng(0)
buf = (rng.standard_normal((frames, 64))
       + 1j * rng.standard_normal((frames, 64))).astype(np.complex64)
fg = Flowgraph()
fg.block_create("src", "dti", {"shape": [frames, 64], "dataType": "CF32"})
fg.records["src"].build.modules["src/m"].attach_buffer(buf)
fg.block_create("chan", "channelizer", {"tileM": 4096},
                {"buffer": "${graph.src.output.buffer}"}, provider="pallas")
try:
    for _ in range(3):
        assert fg.compute(timeout=120.0)
    k = 128
    for _ in range(2):
        assert fg.scheduler.compute_burst(k, timeout=120.0) == k
    fg.scheduler.synchronize()
    t0 = time.perf_counter(); nb = 3
    for _ in range(nb):
        assert fg.scheduler.compute_burst(k, timeout=120.0) == k
    fg.scheduler.synchronize()
    dt = (time.perf_counter() - t0) / (nb * k)
    print(f"flowgraph-chan-burst[{k}] cf32: {dt*1e3:.3f} ms/cycle = "
          f"{frames*64/dt/1e9:.2f} G", flush=True)
    fg.scheduler.synchronize()
    t0 = time.perf_counter(); steps = 20
    for _ in range(steps):
        fg.compute(timeout=30.0)
    fg.scheduler.synchronize()
    dt = (time.perf_counter() - t0) / steps
    print(f"flowgraph-chan per-dispatch cf32: {dt*1e3:.3f} ms = "
          f"{frames*64/dt/1e9:.2f} G", flush=True)
finally:
    fg.stop()

nb2, n2 = 512, 2048
buf2 = rng.standard_normal((nb2, n2)).astype(np.float32)
fg2 = Flowgraph()
fg2.block_create("src", "dti", {"shape": [nb2, n2], "dataType": "F32"})
fg2.records["src"].build.modules["src/m"].attach_buffer(buf2)
fg2.block_create("spec", "spectrum_engine", {"enableScale": True},
                 {"buffer": "${graph.src.output.buffer}"})
try:
    for _ in range(3):
        assert fg2.compute(timeout=60.0)
    fg2.scheduler.synchronize()
    t0 = time.perf_counter(); steps = 30
    for _ in range(steps):
        fg2.compute(timeout=30.0)
    fg2.scheduler.synchronize()
    dt = (time.perf_counter() - t0) / steps
    print(f"spectrum_engine per-dispatch: {dt*1e3:.3f} ms = "
          f"{nb2*n2/dt/1e9:.2f} G", flush=True)
finally:
    fg2.stop()
print("done", flush=True)
