"""Multi-chip scaling: meshes, sharding rules, halo exchange.

The reference's distribution features are remote-UI streaming plus
in-process device segments (SURVEY.md §2.6) — no multi-node compute.
This package provides the TPU-native replacement called for by the
blueprint: ``jax.sharding.Mesh`` axes for channels/time-blocks,
GSPMD-partitioned graph programs, and explicit ``ppermute`` halo
exchange for overlap-save boundaries.
"""

from cyberether_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    spec_sharding,
)
from cyberether_tpu.parallel.halo import (  # noqa: F401
    halo_exchange_left,
    overlap_save_sharded,
)
