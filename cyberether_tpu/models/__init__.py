"""Flagship pipelines as ready-made, shardable jitted step functions.

These are the hand-optimized, production-shaped models the benchmarks
run (BASELINE.md measured configs); the same capabilities are also
reachable as flowgraphs through the block library.
"""

from cyberether_tpu.models.channelizer import Channelizer  # noqa: F401
from cyberether_tpu.models.spectrum import SpectrumPipeline  # noqa: F401
from cyberether_tpu.models.wbfm import WbfmReceiver  # noqa: F401
