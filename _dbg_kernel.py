"""Debug: which Mosaic construct breaks v3/v4 on device?

Probes:
  A. 3D VMEM ref leading-dim indexing: y = sum_p x @ w3[p]
  B. scratch write (aligned halo + body) then offset reads
  C. v2 channelizer correctness on device (shares both constructs)
  D. v4 correctness without donation, error localization
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.stderr.write(f"devices: {jax.devices()}\n")


def probe_a():
    P, N = 4, 128

    def kern(x_ref, w_ref, o_ref):
        acc = jnp.dot(x_ref[:, :], w_ref[0],
                      preferred_element_type=jnp.float32)
        for p in range(1, P):
            acc += jnp.dot(x_ref[:, :], w_ref[p],
                           preferred_element_type=jnp.float32)
        o_ref[:, :] = acc

    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, N)).astype(np.float32)
    w = rng.standard_normal((P, N, N)).astype(np.float32)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((256, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((P, N, N), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, N), jnp.float32),
    )(x, w)
    ref = sum(x @ w[p] for p in range(P))
    print(f"A (3D ref index): err {np.abs(np.asarray(out)-ref).max():.2e}",
          flush=True)


def probe_b():
    P, N, T = 8, 128, 256

    def kern(halo_ref, body_ref, o_ref, win):
        win[0:P, :] = halo_ref[:, :]
        win[P:P + T, :] = body_ref[:, :]
        acc = win[0:T, :] * 1.0
        for p in range(1, P + 1):
            acc = acc + win[p:p + T, :]
        o_ref[:, :] = acc

    rng = np.random.default_rng(1)
    halo = rng.standard_normal((P, N)).astype(np.float32)
    body = rng.standard_normal((T, N)).astype(np.float32)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((P, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((T, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T + P, N), jnp.float32)],
    )(halo, body)
    ext = np.concatenate([halo, body], 0)
    ref = sum(ext[p:p + T] for p in range(P + 1))
    print(f"B (scratch offset reads): err "
          f"{np.abs(np.asarray(out)-ref).max():.2e}", flush=True)


def probe_cd():
    from cyberether_tpu.models.channelizer import Channelizer

    model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
    M = 4096
    iq = jax.device_put(model.make_input(M))
    ref, _ = model.jitted_step()(model.init_state(), iq)
    ref = np.asarray(ref)

    for variant in ("v1", "v2"):
        got, _ = jax.jit(lambda s, x: model.step_pallas(
            s, x, variant=variant))(model.init_state(), iq)
        err = np.abs(np.asarray(got) - ref)
        print(f"C {variant}: max err {err.max():.2e} "
              f"at {np.unravel_index(err.argmax(), err.shape)}",
              flush=True)

    got, _ = jax.jit(lambda s, x: model.step_pallas_v4(s, x))(
        model.init_state_v4(), iq)
    err = np.abs(np.asarray(got) - ref)
    bad = np.argwhere(err > 1e-3)
    print(f"D v4: max err {err.max():.2e}, nbad {len(bad)}, "
          f"first bad rows {sorted(set(bad[:, 0]))[:8]}, "
          f"bad cols {sorted(set(bad[:, 1]))[:10]}", flush=True)
    # per-tile pattern? tile_m=512, D=16 -> 32 audio rows per tile
    if len(bad):
        print(f"D v4 bad row%32: {sorted(set(bad[:, 0] % 32))[:8]}",
              flush=True)


probe_a()
probe_b()
probe_cd()
