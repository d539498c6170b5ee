"""Serve a demo instance for manual browser validation (CPU)."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"; os.environ["PALLAS_AXON_POOL_IPS"] = ""
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cyberether_tpu.core.instance import Instance
from cyberether_tpu.remote.server import RemoteServer

inst = Instance(headless=True)
fg = inst.flowgraph_create("main")
fg.block_create("gen", "signal_generator", {"signalType": "cosine", "signalDataType": "CF32",
    "sampleRate": 1e6, "frequency": 125e3, "bufferSize": 4096})
fg.block_create("spec", "spectrum_engine", {"enableScale": True},
    {"buffer": "${graph.gen.output.signal}"})
fg.block_create("line", "lineplot", {}, {"signal": "${graph.spec.output.buffer}"})
fg.block_create("wtf", "waterfall", {"height": 512}, {"signal": "${graph.spec.output.buffer}"})
fg.block_create("py", "python", {
    "code": "def compute(ctx):\n    # double the input\n    import numpy as np\n    x = ctx.inputs['a']\n    ctx.outputs['out'] = np.asarray(x) * 2.0\n",
    "outputs": ["out:F32:[512, 4096]"], "inputs": ["a"]},
    {"a": "${graph.spec.output.buffer}"}, runtime="host")
server = RemoteServer(inst, port=8901, fps=20)
server.start(); inst.start()
print("serving on 8901", flush=True)
while True:
    time.sleep(1)
