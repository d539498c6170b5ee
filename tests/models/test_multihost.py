"""Multi-host helpers on the virtual 8-device mesh."""

import numpy as np

import jax

from cyberether_tpu.parallel.multihost import (
    global_time_mesh,
    host_local_time_shard,
    init_distributed,
    reassemble_time_blocks,
)


def test_init_distributed_noop_without_coordinator():
    init_distributed()   # must not raise on single-process


def test_global_time_mesh_shapes():
    mesh = global_time_mesh(channels=2)
    assert mesh.shape == {"time": 4, "channels": 2}


def test_host_local_shard_roundtrip():
    mesh = global_time_mesh(channels=1)
    x = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    arr = host_local_time_shard(mesh, (8, 16), x)
    assert arr.shape == (8, 16)
    # single-process: local data IS the global array
    np.testing.assert_array_equal(reassemble_time_blocks(arr), x)


def test_sharded_step_from_local_ingest():
    """End-to-end: host-local ingest -> sharded channelizer step."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cyberether_tpu.models.channelizer import Channelizer
    from cyberether_tpu.parallel.mesh import make_mesh

    model = Channelizer(channels=8, taps_per_branch=4, audio_decim=4,
                        sample_rate=8e5)
    mesh = make_mesh(time=8, channels=1)
    frames = 256
    iq = model.make_input(frames, seed=9)
    iq_sharded = host_local_time_shard(mesh, iq.shape, iq)
    state = jax.device_put(
        model.init_state(),
        jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()),
                               model.init_state()))
    step = model.sharded_step(mesh)
    audio, _ = step(state, iq_sharded)
    ref, _ = model.jitted_step()(model.init_state(), jnp.asarray(iq))
    np.testing.assert_allclose(np.asarray(audio), np.asarray(ref),
                               atol=1e-4)
