"""Round-5 sanity G: scheduler-fix regression check on hardware —
flowgraph channelizer burst must stay at the r5 record level."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax
sys.stderr.write(f"devices: {jax.devices()}\n")
from cyberether_tpu import Flowgraph

rng = np.random.default_rng(0)
frames = 1 << 17
buf = rng.standard_normal((frames, 128)).astype(np.float32)
fg = Flowgraph()
fg.block_create("src", "dti", {"shape": [frames, 128],
                               "dataType": "F32"})
fg.records["src"].build.modules["src/m"].attach_buffer(buf)
fg.block_create("rs", "reshape", {"shape": [frames, 64, 2]},
                {"buffer": "${graph.src.output.buffer}"})
fg.block_create("chan", "channelizer", {"tileM": 8192},
                {"buffer": "${graph.rs.output.buffer}"},
                provider="pallas")
try:
    for _ in range(3):
        assert fg.compute(timeout=180.0)
    k = 128
    for _ in range(2):
        assert fg.scheduler.compute_burst(k, timeout=300.0) == k
    fg.scheduler.synchronize()
    t0 = time.perf_counter(); nb = 3
    for _ in range(nb):
        assert fg.scheduler.compute_burst(k, timeout=300.0) == k
    fg.scheduler.synchronize()
    dt = (time.perf_counter() - t0) / (nb * k)
    print(f"flowgraph chan burst[{k}]: {dt*1e3:.3f} ms/cycle = "
          f"{frames*64/dt/1e9:.2f} Gsamp/s", flush=True)
    audio = fg.scheduler.output("chan.audio")
    assert audio is not None and np.isfinite(
        np.asarray(audio)).all()
finally:
    fg.stop()
print("done", flush=True)
