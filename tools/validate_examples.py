"""Run every registered example flowgraph end-to-end on the current
backend (real TPU when run plainly; CPU with JAX_PLATFORMS=cpu) —
two compute cycles each, all blocks must settle COMPLETE."""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from cyberether_tpu.core.flowgraph import Flowgraph  # noqa: E402
from cyberether_tpu.core.registry import registry  # noqa: E402

sys.stderr.write(f"devices: {jax.devices()}\n")
failures = []
for name in registry.list_examples():
    t0 = time.perf_counter()
    fg = None
    try:
        fg = Flowgraph.from_yaml(registry.example(name).yaml_text)
        ok = fg.compute(timeout=300.0) and fg.compute(timeout=300.0)
        bad = {b: fg.block_error(b) for b in fg.records
               if fg.block_state(b).value != "complete"}
        if not ok or bad:
            failures.append((name, bad))
            print(f"{name}: FAILED {bad}", flush=True)
        else:
            print(f"{name}: ok ({time.perf_counter()-t0:.1f}s, "
                  f"{len(fg.records)} blocks)", flush=True)
    except Exception:
        failures.append((name, "exception"))
        print(f"{name}: EXCEPTION", flush=True)
        traceback.print_exc()
    finally:
        if fg is not None:
            fg.stop()
print(("ALL OK" if not failures else f"FAILURES: {failures}"),
      flush=True)
sys.exit(1 if failures else 0)
