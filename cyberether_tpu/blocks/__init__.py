"""Built-in domain library — blocks & modules.

Mirrors the reference's ``src/domains/{core,dsp,io,ml,visualization}``
inventory (SURVEY.md §2.4) with TPU-native implementations.
"""

from __future__ import annotations

_registered = False


def register_all() -> None:
    global _registered
    if _registered:
        return
    _registered = True
    from cyberether_tpu.blocks import core  # noqa: F401
    from cyberether_tpu.blocks import dsp  # noqa: F401
    from cyberether_tpu.blocks import io  # noqa: F401
    from cyberether_tpu.blocks import visualization  # noqa: F401
    from cyberether_tpu.blocks import ml  # noqa: F401
    from cyberether_tpu.blocks import composites  # noqa: F401
    from cyberether_tpu.blocks import filter_engine  # noqa: F401
    from cyberether_tpu.blocks import psk  # noqa: F401
    from cyberether_tpu.blocks import dti  # noqa: F401
    from cyberether_tpu.blocks import adsb  # noqa: F401
    from cyberether_tpu.blocks import fused  # noqa: F401
