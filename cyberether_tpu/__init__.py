"""CyberEther-TPU: a TPU-native real-time signal processing framework.

A brand-new framework with the capabilities of CyberEther
(luigifcruz/CyberEther): flowgraphs of DSP blocks declared in YAML or
Python are *compiled* into jitted JAX/XLA programs (with Pallas kernels
on the hot paths) instead of being interpreted by a per-device module
scheduler.  Device-resident ``jax.Array`` replaces the reference's
multi-backend tensor subsystem; sharding over ``jax.sharding.Mesh``
(channel / time-block axes, ``ppermute`` halo exchange, ``psum``
reductions) replaces its single-node CUDA/Metal/Vulkan backends.

Reference layer map: /root/reference/docs/architecture.md (see SURVEY.md).
"""

__version__ = "0.1.0"

from cyberether_tpu.core.types import (  # noqa: F401
    DataType,
    Device,
    Runtime,
    Taint,
    Result,
    BlockState,
)
from cyberether_tpu.core.tensor import TensorSpec, SignalAxes  # noqa: F401
from cyberether_tpu.core.registry import registry  # noqa: F401
from cyberether_tpu.core.flowgraph import Flowgraph  # noqa: F401
from cyberether_tpu.core.instance import Instance  # noqa: F401


def _load_domains() -> None:
    """Import all built-in block/module registrations (the analog of the
    reference's static-registration queue drained at startup,
    include/jetstream/registry.hh:74-76)."""
    from cyberether_tpu import blocks  # noqa: F401

    blocks.register_all()
    from cyberether_tpu import examples  # noqa: F401


_load_domains()
