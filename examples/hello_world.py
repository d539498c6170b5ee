"""Direct Instance/Flowgraph API usage — the analog of the reference's
examples/jetstream/hello_world.cc (build a graph in code, run it, read
an output).

Run:  python examples/hello_world.py
"""

import numpy as np

from cyberether_tpu import Instance

inst = Instance(headless=True)
fg = inst.flowgraph_create("hello")

fg.block_create("gen", "signal_generator", {
    "signalType": "cosine", "signalDataType": "CF32",
    "sampleRate": 1e6, "frequency": 125e3, "bufferSize": 2048})
fg.block_create("spec", "spectrum_engine",
                {"enableScale": True, "rangeMin": -100, "rangeMax": 0},
                {"buffer": "${graph.gen.output.signal}"})

for _ in range(4):
    fg.compute(timeout=5.0)

spectrum = fg.scheduler.output("spec.buffer")
peak_bin = int(np.argmax(spectrum))
freq = (peak_bin - 1024) * 1e6 / 2048   # fftshifted axis
print(f"peak at bin {peak_bin} -> {freq/1e3:.1f} kHz (expected 125.0)")

inst.destroy()
