#!/usr/bin/env python
"""Stage-by-stage hardware profile of the v5 channelizer kernel
(VERDICT r2 item 1: find the 25x roofline gap or prove it structural).

Method: the same scan-chain differential timing as bench.py, applied
to ablated kernel builds (stages progressively removed at trace time).
Stage cost = t(with stage) - t(without).  Run ON TPU only.

Usage: python tools/profile_channelizer.py [tile_m ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from cyberether_tpu.models.channelizer import Channelizer  # noqa: E402
from cyberether_tpu.ops.pallas_kernels import (  # noqa: E402
    _V5_STAGES, channelize_demod_decim_v5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch_time(fn, reps=5):
    ts = []
    for _ in range(reps + 2):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts[2:])
    return ts[len(ts) // 2]


def scan_steady(make, k=33, reps=5):
    f1, fk = make(1), make(k)
    t0 = time.perf_counter()
    float(f1())
    compile_s = time.perf_counter() - t0
    float(fk())
    t1 = fetch_time(f1, reps=reps)
    tk = fetch_time(fk, reps=reps)
    return max((tk - t1) / (k - 1), 1e-9), compile_s


def main():
    tiles = [int(t) for t in sys.argv[1:]] or [2048]
    model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
    frames = 1 << 17
    rng = np.random.default_rng(1)
    iq = jax.device_put(rng.standard_normal(
        (frames, model.channels, 2)).astype(np.float32))
    C, Pt, D = model.channels, model.taps_per_branch, model.audio_decim

    def chain(tile, stages):
        def mk(n):
            @jax.jit
            def f(iq):
                def body(carry, _):
                    st, acc = carry
                    M = iq.shape[0]
                    x2 = iq.reshape(M, 2 * C)
                    grid = M // tile
                    x3 = x2.reshape(grid, tile, 2 * C)
                    halos = jnp.concatenate(
                        [st["hist"][None], x3[:-1, tile - Pt:, :]], 0)
                    audio = channelize_demod_decim_v5(
                        x2, halos, model._hp5, model._bperm5,
                        float(model._fm_ref), D, tile_m=tile,
                        stages=stages)
                    return ({"hist": x2[M - Pt:]},
                            acc + audio[0, 0]), None
                carry, _ = jax.lax.scan(
                    body, (model.init_state_v4(), jnp.float32(0)),
                    None, length=n)
                return carry[1]
            return lambda: f(iq)
        return mk

    # cumulative ablation: remove one stage at a time (tail first)
    ablations = [tuple(_V5_STAGES[:i]) for i in
                 range(len(_V5_STAGES), -1, -1)]
    for tile in tiles:
        log(f"=== tile_m={tile} (grid={frames//tile}) ===")
        prev = None
        for stages in ablations:
            per, comp = scan_steady(chain(tile, stages))
            rate = frames * C / per
            delta = "" if prev is None else f"  (delta {(prev-per)*1e3:+.3f} ms)"
            name = ",".join(stages) or "(stream only)"
            log(f"stages={name:30s} {per*1e3:7.3f} ms  "
                f"{rate/1e6:9.1f} Msamp/s  compile {comp:5.1f}s{delta}")
            prev = per

    # isolated single-stage removals at the first tile
    tile = tiles[0]
    full, _ = scan_steady(chain(tile, tuple(_V5_STAGES)))
    log(f"--- isolated removals (tile_m={tile}, full={full*1e3:.3f} ms)")
    for drop in _V5_STAGES:
        st = tuple(s for s in _V5_STAGES if s != drop)
        per, _ = scan_steady(chain(tile, st))
        log(f"without {drop:6s}: {per*1e3:7.3f} ms  "
            f"(stage cost {(full-per)*1e3:+.3f} ms)")


if __name__ == "__main__":
    main()
