"""Pallas TPU kernels for the hot paths.

The graph compiler's XLA output is already fused per segment; these
kernels exist where hand scheduling beats XLA (SURVEY.md §7 step 5):

- ``channelize_demod``: the entire channelizer inner loop — polyphase
  branch FIR + C-point DFT (MXU matmuls) + FM phase-difference demod —
  in ONE VMEM-resident pass.

Layout: time-major ``(frames, 2*C)`` with re/im packed along the lane
axis — 2*C = 128 for the 64-channel flagship, exactly one TPU lane
register row.  Frame windows overlap by P-1 between grid steps; Mosaic
does not lower dynamic HBM slices inside TC kernels, so the small halo
rows are precomputed as a (grid, P-1, 2C) side input and both inputs
stream through standard (auto-double-buffered) BlockSpec tiling.  The
lag-1 demod carry rides a VMEM scratch across the sequential grid.

All kernels run under ``interpret=True`` on CPU for testing; the real
TPU path compiles via Mosaic.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _atan2(y: jnp.ndarray, x: jnp.ndarray,
           recip: bool = False, newton: bool = True,
           poly3: bool = False) -> jnp.ndarray:
    """atan2 from basic VPU ops (Mosaic has no atan2 primitive).

    Octant reduction + double-angle range reduction + minimax odd
    polynomial; max error ~2e-7 rad.  signbit (not <0) keeps
    atan2(+/-0, -0.0) = +/-pi consistent with XLA/IEEE.

    ONE divide total: the range-reduction test ``lo/hi > tan(pi/8)``
    is hoisted to ``lo > tan(pi/8)*hi`` and the reduced argument
    ``(t-1)/(t+1)`` is computed as ``(lo-hi)/(lo+hi)`` (same value,
    shares the single division) — VPU divides are the poly's most
    expensive ops.  ``recip=True`` (Pallas kernels only) replaces even
    that divide with the hardware approximate reciprocal + one
    Newton-Raphson step (~1e-7 relative — below the poly's own error);
    the exact divide was a measured ~25% of the channelizer demod
    stage.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    red = lo > jnp.float32(0.41421356) * hi
    num = jnp.where(red, lo - hi, lo)
    den = jnp.where(red, lo + hi, hi)
    dsafe = jnp.maximum(den, 1e-30)
    if recip:
        r = pl.reciprocal(dsafe, approx=True)
        if newton:
            r = r * (jnp.float32(2.0) - dsafe * r)  # one Newton step
        # newton=False: raw hardware reciprocal (~1e-4 relative —
        # well inside the demod's 1e-2 tolerance; ablation knob)
        u = num * r
    else:
        u = num / dsafe
    z = u * u
    if poly3:
        # 3-term minimax on the reduced range (max err 7.3e-6 rad —
        # far inside the FM demod's 1e-2 tolerance; saves 2 FMAs on
        # the VPU-issue-bound channelizer demod)
        p = jnp.float32(1.6837577807e-01)
        p = p * z + jnp.float32(-3.3141539781e-01)
        p = p * z + jnp.float32(9.9998249344e-01)
        a = u * p
    else:
        p = jnp.float32(6.1687607318e-02)
        p = p * z + jnp.float32(-1.0648017377e-01)
        p = p * z + jnp.float32(1.4253635705e-01)
        p = p * z + jnp.float32(-1.9999158382e-01)
        p = p * z + jnp.float32(3.3333328366e-01)
        a = u - u * z * p
    a = jnp.where(red, jnp.float32(np.pi / 4) + a, a)
    a = jnp.where(ay > ax, jnp.float32(np.pi / 2) - a, a)
    a = jnp.where(jnp.signbit(x), jnp.float32(np.pi) - a, a)
    return jnp.where(jnp.signbit(y), -a, a)


def _channelize_kernel(body_ref, halo_ref, hp_ref, b_ref,
                       prev_ref, out_ref, ylast_ref, carry, lag, *,
                       P: int, C: int, tile_m: int, ref_gain: float):
    """One grid step: frames [i*tile_m, (i+1)*tile_m).

    body: (tile_m, 2C) — rows ext[i*tile_m+P-1 : (i+1)*tile_m+P-1]
    halo: (1, P-1, 2C) — rows ext[i*tile_m : i*tile_m+P-1]
    """
    i = pl.program_id(0)

    win = jnp.concatenate([halo_ref[0], body_ref[:, :]], axis=0)

    # ---- polyphase branch FIR (VPU, unrolled over P taps) -------------
    # taps arrive duplicated on re|im lanes: hp (P, 2C)
    z = jnp.zeros((tile_m, 2 * C), jnp.float32)
    for p in range(P):
        z = z + win[p:p + tile_m, :] * hp_ref[p, :][None, :]

    # ---- C-point complex DFT as ONE full-width matmul -----------------
    # y = z @ B with B = [[Wr^T, Wi^T], [-Wi^T, Wr^T]] (2C, 2C): the
    # re|im lane packing makes the complex product a single 128-wide
    # real matmul instead of four half-width (C=64) ones
    y = jnp.dot(z, b_ref[:, :], preferred_element_type=jnp.float32)
    yr = y[:, :C]
    yi = y[:, C:]

    # ---- FM demod with lag-1 carry ------------------------------------
    # (Mosaic cannot concatenate vectors with mismatched sublane
    # offsets, so the lagged view is built through a scratch ref:
    # lag[0] = carry, lag[1:] = y[:-1])
    @pl.when(i == 0)
    def _seed():
        carry[0, :] = prev_ref[0, :]

    lag[0, :] = carry[0, :]
    lag[1:tile_m, :C] = yr[0:tile_m - 1, :]
    lag[1:tile_m, C:] = yi[0:tile_m - 1, :]
    pr = lag[0:tile_m, :C]
    pi_ = lag[0:tile_m, C:]
    dr = pr * yr + pi_ * yi
    di = pr * yi - pi_ * yr
    out_ref[:, :] = _atan2(di, dr) * ref_gain

    carry[0, :C] = yr[tile_m - 1, :]     # static index — jnp's -1
    carry[0, C:] = yi[tile_m - 1, :]     # lowers to dynamic_slice

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit_last():
        ylast_ref[0, :C] = yr[tile_m - 1, :]
        ylast_ref[0, C:] = yi[tile_m - 1, :]


def _channelize_kernel_v2(body_ref, halo_ref, bp_ref, prev_ref,
                          out_ref, ylast_ref, carry, win, *,
                          P: int, C: int, tile_m: int, ref_gain: float):
    """MXU-FIR variant: the per-branch taps are folded into P
    pre-multiplied DFT matrices Bp[p] = diag(hp[p]|hp[p]) @ B, so the
    polyphase FIR + DFT collapse into P shifted matmuls
    ``y = sum_p win[p:p+tile_m] @ Bp[p]`` — no VPU multiply-accumulate
    loop, the systolic array does all the arithmetic."""
    i = pl.program_id(0)

    if P > 1:
        win[0:P - 1, :] = halo_ref[0]
    win[P - 1:P - 1 + tile_m, :] = body_ref[:, :]

    # bp arrives flattened (P*2C, 2C) — 3D VMEM ref indexing
    # miscompiles under Mosaic (see _channelize_kernel_v4)
    n = 2 * C
    y = jnp.dot(win[0:tile_m, :], bp_ref[0:n, :],
                preferred_element_type=jnp.float32)
    for p in range(1, P):
        y = y + jnp.dot(win[p:p + tile_m, :],
                        bp_ref[p * n:(p + 1) * n, :],
                        preferred_element_type=jnp.float32)
    yr = y[:, :C]
    yi = y[:, C:]

    @pl.when(i == 0)
    def _seed():
        carry[0, :] = prev_ref[0, :]

    # lag-1 via the win scratch (reused as lag storage after the FIR)
    win[0, :] = carry[0, :]
    win[1:tile_m, :C] = yr[0:tile_m - 1, :]
    win[1:tile_m, C:] = yi[0:tile_m - 1, :]
    pr = win[0:tile_m, :C]
    pi_ = win[0:tile_m, C:]
    dr = pr * yr + pi_ * yi
    di = pr * yi - pi_ * yr
    out_ref[:, :] = _atan2(di, dr) * ref_gain

    carry[0, :C] = yr[tile_m - 1, :]
    carry[0, C:] = yi[tile_m - 1, :]

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit_last():
        ylast_ref[0, :C] = yr[tile_m - 1, :]
        ylast_ref[0, C:] = yi[tile_m - 1, :]


def _channelize_kernel_v4(body_ref, halo_ref, bp_ref, sel_ref,
                          out_ref, win, yall, *,
                          P: int, C: int, tile_m: int, D: int,
                          ref_gain: float):
    """Production variant: parallel grid, interleaved input lanes,
    in-kernel decimation.

    - Input rows are raw ``iq.reshape(M, 2C)`` — re/im interleaved per
      channel.  The lane permutation is folded into the DFT block
      matrices (rows of B reordered), so NO host/XLA transpose runs
      before the kernel (the (2,C,M) transpose prep cost 1.65 ms/step
      at M=128Ki — more than half the step).
    - The demod lag y[m-1] is itself a filterbank output, so the
      kernel computes tile_m+1 frames in one accumulation chain and
      reads the result at two sublane offsets — no sequential carry,
      every grid step independent (v1/v2 serialized the grid on a
      lag carry).
    - The boxcar audio decimation happens in-kernel as a selector
      matmul (D-wide group means), shrinking the kernel's HBM output
      from M*C to M*C/D floats.

    body: (tile_m, 2C) — iq rows [i*tile_m, (i+1)*tile_m)
    halo: (1, P, 2C)   — iq rows [i*tile_m - P, i*tile_m) (tile 0:
          carried history)
    bp:   (P, 2C, 2C)  — lane-permuted, tap-folded DFT block matrices
    sel:  (tile_m // D, tile_m) — boxcar mean selector
    """
    win[0:P, :] = halo_ref[0]
    win[P:P + tile_m, :] = body_ref[:, :]

    # bp arrives FLATTENED to (P*2C, 2C): indexing the leading dim of
    # a 3D VMEM ref (bp_ref[p]) miscompiles under Mosaic on this
    # backend (probe: constant-matrix matmul off by ~0.25); static 2D
    # row slices lower correctly.
    n = 2 * C

    def b_p(p):
        return bp_ref[p * n:(p + 1) * n, :]

    # compute tile_m + 1 output frames in ONE accumulation chain (the
    # extra leading frame is the demod lag); reading y at the two
    # sublane offsets out of a scratch halves the MXU work vs a second
    # shifted accumulation — the kernel is MXU-f32-bound
    rows = tile_m + 1
    acc = jnp.dot(win[0:rows, :], b_p(0),
                  preferred_element_type=jnp.float32)
    for p in range(1, P):
        acc = acc + jnp.dot(win[p:p + rows, :], b_p(p),
                            preferred_element_type=jnp.float32)
    yall[0:rows, :] = acc

    yr, yi = yall[1:rows, 0:C], yall[1:rows, C:n]
    pr, pi_ = yall[0:tile_m, 0:C], yall[0:tile_m, C:n]
    dr = pr * yr + pi_ * yi
    di = pr * yi - pi_ * yr
    demod = _atan2(di, dr) * ref_gain                  # (tile_m, C)
    out_ref[:, :] = jnp.dot(sel_ref[:, :], demod,
                            preferred_element_type=jnp.float32)


_V5_STAGES = ("fir", "dft", "lag", "atan", "sel")


def _channelize_body_v5(body_ref, halo_ref, hp_ref, b_ref, sel_ref,
                        out_ref, win, yall, *,
                        P: int, C: int, tile_m: int, D: int,
                        ref_gain: float,
                        stages: tuple = _V5_STAGES,
                        decim: str = "sel",
                        fir: str = "win",
                        firtree: bool = False,
                        atan_mode: str = "recip",
                        gain_in_sel: bool = False,
                        demod_mode: str = "classic"):
    """Roofline variant: VPU polyphase FIR + ONE DFT matmul.

    v4 folds the taps into P pre-multiplied DFT matrices and pays P
    full (2C, 2C) matmuls per tile — 8x the minimal MXU work for the
    flagship P=8.  Here the FIR is P shifted elementwise FMAs on the
    VPU (z = sum_p win[p:p+rows] * hp[p]) and the MXU runs a single
    (rows, 2C) @ (2C, 2C) lane-permuted DFT.  Everything else (parallel
    grid, interleaved input rows, lag-frame trick, in-kernel selector
    decimation) matches v4.

    body: (tile_m, 2C) — raw interleaved iq rows
    halo: (1, P, 2C)   — previous P rows (tile 0: carried history)
    hp:   (P, 2C)      — kernel-order taps duplicated on re|im lanes
    b:    (2C, 2C)     — lane-permuted DFT block matrix
    sel:  (tile_m // D, tile_m) — boxcar mean selector
    """
    rows = tile_m + 1

    def fir_sum(terms):
        # firtree: pairwise reduction halves the serial FMA-chain
        # depth (8 dependent FMAs -> depth 3) — an ILP experiment for
        # the VPU-issue-bound kernel
        if not firtree:
            z = terms[0]
            for t in terms[1:]:
                z = z + t
            return z
        while len(terms) > 1:
            nxt = [terms[i] + terms[i + 1]
                   for i in range(0, len(terms) - 1, 2)]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]

    # fixed-point ingest (SDR CS8/CS16): the conversion rides the
    # win-copy pass — the kernel streams a quarter/half of the f32
    # HBM traffic, and the FM discriminator is scale-invariant (atan2
    # of a ratio), so the raw integer scale needs no compensation
    # anywhere
    i8 = body_ref.dtype in (jnp.int8, jnp.int16)

    def _cvt(v):
        return v.astype(jnp.float32) if i8 else v

    if fir == "direct" and "fir" in stages and not i8:
        # FIR reads body_ref directly (no win copy); the P
        # halo-touching leading rows come from a small scratch and the
        # two pieces join as an 8-aligned VALUE concat
        nb = rows - P
        zb = fir_sum([body_ref[p:p + nb, :] * hp_ref[p, :][None, :]
                      for p in range(P)])
        win[0:P, :] = halo_ref[0]
        win[P:2 * P, :] = body_ref[0:P, :]
        zh = fir_sum([win[p:p + P, :] * hp_ref[p, :][None, :]
                      for p in range(P)])
        z = jnp.concatenate([zh, zb], axis=0)
    else:
        win[0:P, :] = _cvt(halo_ref[0])
        win[P:P + tile_m, :] = _cvt(body_ref[:, :])
        if "fir" in stages:
            z = fir_sum([win[p:p + rows, :] * hp_ref[p, :][None, :]
                         for p in range(P)])
        else:                       # profiling ablation (tools/)
            z = win[0:rows, :]

    if "dft" in stages:
        y = jnp.dot(z, b_ref[:, :],
                    preferred_element_type=jnp.float32)
    else:
        y = z

    n = 2 * C
    if "yall" in stages:
        # legacy path: bounce y through a VMEM scratch and re-read at
        # the two sublane offsets (kept for A/B profiling; value
        # slicing below avoids the round trip)
        yall[0:rows, :] = y
        yr, yi = yall[1:rows, 0:C], yall[1:rows, C:n]
        pr, pi_ = yall[0:tile_m, 0:C], yall[0:tile_m, C:n]
    else:
        yr, yi = y[1:rows, 0:C], y[1:rows, C:n]
        pr, pi_ = y[0:tile_m, 0:C], y[0:tile_m, C:n]
    if "lag" in stages:
        dr = pr * yr + pi_ * yi
        di = pr * yi - pi_ * yr
    else:
        dr, di = yr, yi
    g = jnp.float32(1.0 if gain_in_sel else ref_gain)
    newt = atan_mode == "recip"
    p3 = atan_mode == "fast3"
    if demod_mode == "coherent" and "atan" in stages \
            and decim == "sel" and sel_ref is not None:
        # coherent discriminator: average the complex lag products
        # over the decimation window FIRST, then take ONE angle per
        # audio sample — D-fold fewer atans, and statistically the
        # better estimator (angle of the averaged autocorrelation vs
        # average of noisy angles).  atan2 of a ratio is
        # scale-invariant, so the boxcar mean needs no normalization
        # bookkeeping.  Opt-in: it is NOT bit-comparable to the
        # reference's per-sample discriminator (second-order in the
        # within-window phase spread).
        # deliberately DEFAULT precision: HIGHEST here was measured
        # 0.377 vs 0.160 ms/step on the full coherent chain (the
        # selector matmul is tile-sized, not small — the ~6-pass cost
        # dominates), and the f32-accumulated bf16 products are ample
        # for demodulated audio (coherent-vs-classic golden at 5e-3)
        drm = jnp.dot(sel_ref[:, :], dr,
                      preferred_element_type=jnp.float32)
        dim = jnp.dot(sel_ref[:, :], di,
                      preferred_element_type=jnp.float32)
        out_ref[:, :] = _atan2(dim, drm, recip=True, newton=newt,
                               poly3=p3) * jnp.float32(ref_gain)
        return
    if "atan" not in stages:
        demod = (di + dr) * g
    elif atan_mode == "ypack" and decim in ("sel", "chunk") \
            and sel_ref is not None and fir != "direct":
        # like spack below, but the PACKING happens one stage earlier,
        # on the filterbank output y itself: the lag products AND the
        # atan chain then both run at full 128-lane width.  The lag
        # adjacency survives packing because each packed row r carries
        # [y[r] | y[h+r]] — both halves' lag-1 neighbours are the
        # packed row above.  Stores are near-free on this backend
        # (r4: removing the win copy changed nothing — the kernel is
        # VPU-ISSUE-bound); arithmetic width is what pays.
        h = tile_m // 2
        # win rows [0:h+1] = packed yr, rows [h+1:2h+2] = packed yi
        win[0:h + 1, 0:C] = y[0:h + 1, 0:C]
        win[0:h + 1, C:n] = y[h:rows, 0:C]
        win[h + 1:2 * h + 2, 0:C] = y[0:h + 1, C:n]
        win[h + 1:2 * h + 2, C:n] = y[h:rows, C:n]
        prp = win[0:h, :]
        yrp = win[1:h + 1, :]
        pip = win[h + 1:2 * h + 1, :]
        yip = win[h + 2:2 * h + 2, :]
        drp = prp * yrp + pip * yip
        dip = prp * yip - pip * yrp
        dp = _atan2(dip, drp, recip=True, newton=newt,
                    poly3=True) * g
        hd = tile_m // (2 * D)
        if decim == "chunk":
            # per-128-row-chunk selector (4 KB) instead of the
            # (h/D, h) matrix whose VMEM footprint blocks tile 8192
            gq = 128 // D
            for q in range(h // 128):
                ap = jnp.dot(sel_ref[:, :],
                             dp[q * 128:(q + 1) * 128, :],
                             preferred_element_type=jnp.float32)
                out_ref[q * gq:(q + 1) * gq, :] = ap[:, 0:C]
                out_ref[hd + q * gq:hd + (q + 1) * gq, :] = \
                    ap[:, C:n]
            return
        ap = jnp.dot(sel_ref[:, :], dp,
                     preferred_element_type=jnp.float32)
        out_ref[0:hd, :] = ap[:, 0:C]
        out_ref[hd:2 * hd, :] = ap[:, C:n]
        return
    elif atan_mode == "spack" and decim == "sel" \
            and sel_ref is not None and fir != "direct":
        # lane-pack the two ROW halves through the (now dead) win
        # scratch: Mosaic rejects offset-64 VALUE concats (the r4
        # "pack" crash) but lane-offset REF stores/reads are legal
        # (the v1 kernel's carry[0, C:] path) — so the ~17-op atan
        # chain runs at full 128-lane vreg width on half the rows
        # instead of half-empty vregs on all of them.  The boxcar
        # selector applies to the packed layout directly (same boxcar
        # pattern on both lane halves), so sel shrinks 4x and the only
        # unpack happens at the DECIMATED size (tile_m/(2D) rows).
        h = tile_m // 2
        win[0:h, 0:C] = dr[0:h, :]
        win[0:h, C:n] = dr[h:tile_m, :]
        win[h:tile_m, 0:C] = di[0:h, :]
        win[h:tile_m, C:n] = di[h:tile_m, :]
        dp = _atan2(win[h:tile_m, :], win[0:h, :], recip=True,
                    newton=newt, poly3=True) * g
        ap = jnp.dot(sel_ref[:, :], dp,
                     preferred_element_type=jnp.float32)
        hd = tile_m // (2 * D)
        out_ref[0:hd, :] = ap[:, 0:C]
        out_ref[hd:2 * hd, :] = ap[:, C:n]
        return
    elif atan_mode.endswith("pack"):
        # pack the two ROW halves onto lanes so the ~20-op atan chain
        # runs at full vreg width instead of C=64 half width
        h = tile_m // 2
        drp = jnp.concatenate([dr[0:h, :], dr[h:tile_m, :]], axis=1)
        dip = jnp.concatenate([di[0:h, :], di[h:tile_m, :]], axis=1)
        dp = _atan2(dip, drp, recip=True, newton=False,
                    poly3=True) * g
        demod = jnp.concatenate([dp[:, 0:C], dp[:, C:n]], axis=0)
    else:
        demod = _atan2(di, dr, recip=True, newton=newt,
                       poly3=p3) * g
    if "sel" not in stages:
        out_ref[:, :] = demod[0:tile_m // D, :]        # ablation
    elif decim == "none":
        out_ref[:, :] = demod        # caller decimates (XLA-side)
    else:
        # boxcar decimation as a selector matmul.  Hardware A/B
        # (round 3): a leading-dim reshape+sum and a roll-tree both
        # lose — the reshape relayout is pathological at C=64 lanes
        # and Mosaic cannot lower the tree's strided row selection —
        # while emitting undecimated rows ("none") pays more in HBM
        # than the matmul costs.  The selector matmul (0.13 ms of a
        # 0.35 ms step) stands as the measured-best option.
        out_ref[:, :] = jnp.dot(sel_ref[:, :], demod,
                                preferred_element_type=jnp.float32)


def _channelize_body_v6(body_ref, halo_ref, hp_ref, b_ref, sel_ref,
                        out_ref, z, hwin, *,
                        P: int, C: int, tile_m: int, D: int,
                        ref_gain: float, decim: str = "chunk"):
    """Round-4 roofline variant: v5 minus two VMEM passes and minus
    the big-selector decimation matmul.

    Changes vs :func:`_channelize_body_v5` (both measured on hardware,
    tools/ablation/chan_ablate.py):

    - NO body->win copy: the FIR reads ``body_ref`` directly with
      shifted static slices for output rows [P, tile_m], and the first
      P rows (the only ones that touch the halo) are patched from a
      tiny (2P, 2C) scratch.  Saves a full-tile VMEM write+read.
    - decimation as PER-CHUNK small matmuls: out[8q:8q+8] =
      sel(8,128) @ demod[128q:128(q+1)] instead of one
      (tile_m/D, tile_m) selector whose matrix is as big as the data
      itself (1 MB of VMEM reads per tile at tile_m=2048) — the sel
      matrix shrinks to 4 KB and K drops 2048 -> 128.  (Requires
      D | 128 and 128 | tile_m.)

    body: (tile_m, 2C) raw interleaved iq rows
    halo: (1, P, 2C) previous P rows
    hp:   (P, 2C) kernel-order taps on interleaved lanes
    b:    (2C, 2C) lane-permuted DFT block matrix
    sel:  (128 // D, 128) boxcar mean selector for one 128-row chunk
    """
    n = 2 * C
    rows = tile_m + 1

    # ---- FIR: interior rows straight from body_ref ------------------
    # z[r] = sum_p win[r+p]*hp[p], win = [halo(P) | body(tile_m)].
    # For r >= P every term reads body: z[P + r'] =
    # sum_p body[r'+p]*hp[p], r' in [0, tile_m-P].
    nb = rows - P
    zb = body_ref[0:nb, :] * hp_ref[0, :][None, :]
    for p in range(1, P):
        zb = zb + body_ref[p:p + nb, :] * hp_ref[p, :][None, :]
    z[P:rows, :] = zb

    # ---- FIR: the P halo-touching rows from a tiny scratch ----------
    hwin[0:P, :] = halo_ref[0]
    hwin[P:2 * P, :] = body_ref[0:P, :]
    zh = hwin[0:P, :] * hp_ref[0, :][None, :]
    for p in range(1, P):
        zh = zh + hwin[p:p + P, :] * hp_ref[p, :][None, :]
    z[0:P, :] = zh

    # ---- C-point DFT: one full-width matmul -------------------------
    y = jnp.dot(z[0:rows, :], b_ref[:, :],
                preferred_element_type=jnp.float32)

    # ---- FM demod (value-sliced lag, hardware reciprocal atan2) -----
    yr, yi = y[1:rows, 0:C], y[1:rows, C:n]
    pr, pi_ = y[0:tile_m, 0:C], y[0:tile_m, C:n]
    dr = pr * yr + pi_ * yi
    di = pr * yi - pi_ * yr
    demod = _atan2(di, dr, recip=True) * ref_gain      # (tile_m, C)

    # ---- boxcar decimation ------------------------------------------
    if decim == "chunk":
        g = 128 // D
        for q in range(tile_m // 128):
            out_ref[q * g:(q + 1) * g, :] = jnp.dot(
                sel_ref[:, :], demod[q * 128:(q + 1) * 128, :],
                preferred_element_type=jnp.float32)
    else:                       # "big": v5's full selector (A/B only)
        out_ref[:, :] = jnp.dot(sel_ref[:, :], demod,
                                preferred_element_type=jnp.float32)


def channelize_demod_decim_v6(x2: jnp.ndarray, halos: jnp.ndarray,
                              hp: jnp.ndarray, bperm: jnp.ndarray,
                              ref_gain: float, decim: int,
                              tile_m: int = 2048,
                              interpret: bool = False,
                              decim_mode: str = "chunk"
                              ) -> jnp.ndarray:
    """v6 wrapper: (M, 2C) interleaved frames -> (M//decim, C) audio.

    Same contract as :func:`channelize_demod_decim_v5`; see
    :func:`_channelize_body_v6` for what changed.  Falls back to the
    big-selector layout when 128 % decim or tile_m % 128 != 0.
    """
    M, twoC = x2.shape
    C = twoC // 2
    P = int(hp.shape[0])
    tile_m = min(tile_m, M)
    assert M % tile_m == 0 and tile_m % decim == 0, (M, tile_m, decim)
    grid_n = M // tile_m
    chunked = (decim_mode == "chunk" and 128 % decim == 0
               and tile_m % 128 == 0)
    if chunked:
        sel = np.kron(np.eye(128 // decim, dtype=np.float32),
                      np.full((1, decim), 1.0 / decim, np.float32))
    else:
        decim_mode = "big"
        sel = np.kron(np.eye(tile_m // decim, dtype=np.float32),
                      np.full((1, decim), 1.0 / decim, np.float32))

    kernel = functools.partial(
        _channelize_body_v6, P=P, C=C, tile_m=tile_m, D=decim,
        ref_gain=float(ref_gain),
        decim="chunk" if chunked else "big")

    return pl.pallas_call(
        kernel,
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((tile_m, twoC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, twoC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, twoC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twoC, twoC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sel.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m // decim, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M // decim, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_m + 1, twoC), jnp.float32),
                        pltpu.VMEM((2 * P, twoC), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, halos, hp, bperm, jnp.asarray(sel))


def perm_channelizer_matrix(wr: np.ndarray, wi: np.ndarray
                            ) -> np.ndarray:
    """Lane-permuted real DFT block matrix for interleaved input rows
    (the v4 permutation without the tap folding): row 2k <- row k of
    [[Wr^T, Wi^T], [-Wi^T, Wr^T]], row 2k+1 <- row C+k."""
    C = wr.shape[0]
    b = np.concatenate(
        [np.concatenate([wr.T, wi.T], axis=1),
         np.concatenate([-wi.T, wr.T], axis=1)], axis=0)   # (2C, 2C)
    perm = np.empty(2 * C, np.int64)
    perm[0::2] = np.arange(C)
    perm[1::2] = np.arange(C) + C
    return b[perm].astype(np.float32)


def channelize_demod_decim_v5(x2: jnp.ndarray, halos: jnp.ndarray,
                              hp: jnp.ndarray, bperm: jnp.ndarray,
                              ref_gain: float, decim: int,
                              tile_m: int = 512,
                              interpret: bool = False,
                              stages: tuple = _V5_STAGES,
                              decim_mode: str = "sel",
                              fir: str = "win",
                              firtree: bool = False,
                              atan_mode: str = "recip",
                              gain_in_sel: bool = False,
                              demod_mode: str = "classic"
                              ) -> jnp.ndarray:
    """v5 wrapper: (M, 2C) interleaved frames -> (M//decim, C) audio
    (``decim_mode="none"``: (M, C) undecimated demod — the caller
    reshape-means in XLA).

    hp: (P, 2C) kernel-order taps duplicated on interleaved lanes
    (``np.repeat(hp_rev, 2, axis=1)``); bperm: (2C, 2C) from
    :func:`perm_channelizer_matrix`.  ``decim_mode``: "sel" selector
    matmul (default, measured-best) or "none" (full-rate demod out;
    the caller decimates).
    """
    M, twoC = x2.shape
    C = twoC // 2
    P = int(hp.shape[0])
    tile_m = min(tile_m, M)
    assert M % tile_m == 0 and tile_m % decim == 0, (M, tile_m, decim)
    grid_n = M // tile_m
    has_sel = decim_mode in ("sel", "chunk") and "sel" in stages
    out_rows = tile_m if decim_mode == "none" else tile_m // decim

    def kernel(*refs):
        if has_sel:
            body, halo, hpr, b, sel = refs[:5]
            out, *scr = refs[5:]
        else:
            body, halo, hpr, b = refs[:4]
            sel = None
            out, *scr = refs[4:]
        _channelize_body_v5(
            body, halo, hpr, b, sel, out, scr[0],
            scr[1] if "yall" in stages else None,
            P=P, C=C, tile_m=tile_m, D=decim,
            ref_gain=float(ref_gain), stages=stages,
            decim=decim_mode, fir=fir, firtree=firtree,
            atan_mode=atan_mode,
            gain_in_sel=gain_in_sel and has_sel,
            demod_mode=demod_mode)

    in_specs = [
        pl.BlockSpec((tile_m, twoC), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, twoC), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, twoC), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((twoC, twoC), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x2, halos, hp, bperm]
    spack = (atan_mode in ("spack", "ypack") and has_sel
             and demod_mode == "classic" and fir != "direct"
             and tile_m % (2 * decim) == 0
             and (tile_m // (2 * decim)) % 8 == 0
             and (atan_mode != "ypack" or P >= 2))
    if atan_mode in ("spack", "ypack") and not spack:
        atan_mode = "fast3"          # alignment fallback
    # chunked decimation only pairs with the ypack layout (its 4 KB
    # selector is what makes tile 8192 fit in scoped vmem)
    chunk = (decim_mode == "chunk" and spack
             and atan_mode == "ypack" and 128 % decim == 0
             and (tile_m // 2) % 128 == 0)
    if decim_mode == "chunk" and not chunk:
        decim_mode = "sel"
    if has_sel:
        gain = float(ref_gain) if gain_in_sel else 1.0
        srows = 128 if chunk else tile_m // (2 if spack else 1)
        sel = np.kron(np.eye(srows // decim, dtype=np.float32),
                      np.full((1, decim), gain / decim, np.float32))
        in_specs.append(pl.BlockSpec((srows // decim, srows),
                                     lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(sel))
    # fixed-point ingest always takes the win-copy path (the
    # conversion rides the copy), so fir="direct" must not shrink the
    # scratch for it
    direct = fir == "direct" and x2.dtype not in (jnp.int8,
                                                  jnp.int16)
    scratch = [pltpu.VMEM((2 * P if direct
                           else tile_m + P, twoC), jnp.float32)]
    if "yall" in stages:      # legacy A/B path only
        scratch.append(pltpu.VMEM((tile_m + 1, twoC), jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(grid_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (grid_n * out_rows, C), jnp.float32),
        scratch_shapes=scratch,
        # every grid step is independent (the lag frame is recomputed
        # from the halo) — parallel semantics lets Mosaic overlap tiles
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)


def channelize_demod_decim(x2: jnp.ndarray, halos: jnp.ndarray,
                           bp: jnp.ndarray, ref_gain: float,
                           decim: int, tile_m: int = 512,
                           interpret: bool = False) -> jnp.ndarray:
    """v4 wrapper: (M, 2C) interleaved frames -> (M//decim, C) audio.

    halos: (grid, P, 2C) — per-tile left halo rows (tile 0 = carried
    stream history; tile i>0 = x2 rows [i*tile_m - P, i*tile_m)).
    bp: (P, 2C, 2C) lane-permuted tap-folded DFT matrices (see
    ``fold_channelizer_matrices``); flattened to (P*2C, 2C) before
    entering the kernel (3D VMEM ref indexing miscompiles).
    """
    M, twoC = x2.shape
    C = twoC // 2
    P = int(bp.shape[0])
    tile_m = min(tile_m, M)
    assert M % tile_m == 0 and tile_m % decim == 0, (M, tile_m, decim)
    grid_n = M // tile_m

    sel = np.kron(np.eye(tile_m // decim, dtype=np.float32),
                  np.full((1, decim), 1.0 / decim, np.float32))

    return pl.pallas_call(
        functools.partial(_channelize_kernel_v4, P=P, C=C,
                          tile_m=tile_m, D=decim,
                          ref_gain=float(ref_gain)),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((tile_m, twoC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, twoC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P * twoC, twoC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m // decim, tile_m),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m // decim, C),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M // decim, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_m + P, twoC), jnp.float32),
                        pltpu.VMEM((tile_m + 1, twoC), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, halos, bp.reshape(P * twoC, twoC), jnp.asarray(sel))


def fold_channelizer_matrices(hp: np.ndarray, wr: np.ndarray,
                              wi: np.ndarray) -> np.ndarray:
    """Fold polyphase taps + complex DFT + input lane permutation into
    P real (2C, 2C) matrices for the v4 kernel.

    With packed lanes z = [re | im] the complex DFT y = z W is the real
    block matmul against B = [[Wr^T, Wi^T], [-Wi^T, Wr^T]].  The v4
    kernel's input rows are INTERLEAVED ([re0, im0, re1, im1, ...]), so
    rows of B are reordered: row 2k <- row k, row 2k+1 <- row C+k.
    Taps fold in as Bp[p] = diag(hp_interleaved[p]) @ B_perm.
    """
    P, C = hp.shape
    b = np.concatenate(
        [np.concatenate([wr.T, wi.T], axis=1),
         np.concatenate([-wi.T, wr.T], axis=1)], axis=0)   # (2C, 2C)
    perm = np.empty(2 * C, np.int64)
    perm[0::2] = np.arange(C)            # interleaved row 2k = re k
    perm[1::2] = np.arange(C) + C        # interleaved row 2k+1 = im k
    b_perm = b[perm]                                       # (2C, 2C)
    hp_int = np.repeat(hp.astype(np.float32), 2, axis=1)   # (P, 2C)
    return (hp_int[:, :, None] * b_perm[None, :, :]).astype(np.float32)


def _log10(x: jnp.ndarray) -> jnp.ndarray:
    """log10 via natural log (Mosaic lowers jnp.log on the VPU)."""
    return jnp.log(x) * jnp.float32(0.43429448190325176)


def _spectrum_dft_kernel(xr_ref, xi_ref, win_ref, c_ref, s_ref,
                         out_ref, *, coeff: float, scale: float,
                         offset: float, bf16: bool):
    """One grid cell: (tile_b) spectra x (tile_k) output bins — window,
    full-DFT matmul against streamed C/S tiles, |.|^2, dB, soft range.
    No in-kernel reshapes (Mosaic rejects minor-dim shape casts) and
    re/im arrive as separate 2D planes (a trailing dim of 2 tiles
    terribly on the 8x128 vregs)."""
    xr = xr_ref[:, :] * win_ref[0, :]             # (B, n)
    xi = xi_ref[:, :] * win_ref[0, :]
    c = c_ref[:, :]                               # (n, K) — already
    sn = s_ref[:, :]                              # bf16 when bf16=True
    if bf16:
        xr = xr.astype(jnp.bfloat16)
        xi = xi.astype(jnp.bfloat16)
    # W = C - iS; y = (xr + i xi) W
    yr = (jnp.dot(xr, c, preferred_element_type=jnp.float32)
          + jnp.dot(xi, sn, preferred_element_type=jnp.float32))
    yi = (jnp.dot(xi, c, preferred_element_type=jnp.float32)
          - jnp.dot(xr, sn, preferred_element_type=jnp.float32))
    mag2 = yr * yr + yi * yi                      # (B, K)
    db = jnp.float32(10.0) * _log10(jnp.maximum(mag2, 1e-60)) \
        + jnp.float32(coeff)
    norm = db * jnp.float32(scale) + jnp.float32(offset)
    out_ref[:, :] = 0.5 + 0.5 * jnp.tanh(4.0 * (norm - 0.5))


@functools.lru_cache(maxsize=8)
def _dft_cs(n: int):
    """Full-DFT cos/sin matrices (numpy — cached values must not be
    tracers)."""
    jk = np.outer(np.arange(n), np.arange(n)) % n
    ang = 2.0 * np.pi * jk / n
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


def spectrum_fused(iq: jnp.ndarray, win: np.ndarray, coeff: float,
                   scale: float, offset: float, tile_b: int = 128,
                   tile_k: int = 128, bf16: bool = False,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused spectrum: (B, N, 2) float32 -> (B, N) float32 in [0,1].

    Grid (B/tile_b, N/tile_k); the x tile persists across the k axis
    while DFT C/S column tiles stream HBM->VMEM (the dominant traffic:
    2 x 4 n^2 bytes per batch tile — hence the bigger default tile_b
    for bf16, whose matrices are half the bytes).  ``bf16`` runs the
    matmuls in bfloat16 with f32 accumulation (display grade; raises
    the spectral noise floor to ~-40 dBFS).

    Why bf16 is only a few percent faster here (measured r2: 6.75 vs
    6.36 Gsamp/s), not the naive 2x: with tile_b=256 the C/S stream is
    amortized over twice the batch rows, so per input sample the kernel
    moves 8 B of x/win and 2*4*n^2/(tile_b*n) = n/32 B of matrices —
    at n=2048 that's 64 B/sample bf16 vs 128+8 at tile_b=128 f32, but
    the kernel is then MXU-bound, and this chip's measured bf16 matmul
    peak is only ~1.3x f32 (293 vs 226 Tflop/s, v5p-class MXU — see
    CLAUDE.md platform notes), not the 2x a v5e would give.  The knob
    stays because bf16 does win and halves VMEM pressure, enabling the
    larger batch tile."""
    B, n, _two = iq.shape
    if bf16 and tile_b == 128:
        tile_b = 256
    tile_b = min(tile_b, B)
    tile_k = min(tile_k, n)
    assert B % tile_b == 0 and n % tile_k == 0, (B, n, tile_b, tile_k)
    cmat, smat = _dft_cs(n)
    if bf16:
        cmat = cmat.astype("bfloat16")
        smat = smat.astype("bfloat16")

    out = pl.pallas_call(
        functools.partial(_spectrum_dft_kernel, coeff=float(coeff),
                          scale=float(scale), offset=float(offset),
                          bf16=bf16),
        grid=(B // tile_b, n // tile_k),
        in_specs=[
            pl.BlockSpec((tile_b, n), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile_k), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile_k), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, tile_k), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(iq[:, :, 0], iq[:, :, 1],
      jnp.asarray(win, jnp.float32).reshape(1, n),
      jnp.asarray(cmat), jnp.asarray(smat))
    return out


def _spectrum_ct_kernel(xr_ref, xi_ref, win_ref, wmr_ref, wmi_ref,
                        twr_ref, twi_ref, c_ref, s_ref, out_ref,
                        xwr, xwi, *,
                        m: int, coeff: float, scale: float,
                        offset: float, exact: bool = True):
    """One grid cell (i, k1): tile_b spectra x ONE 128-bin output
    block of the Cooley-Tukey split n = m x 128.

    With n = 128*n1 + n2 and k = k1 + m*k2 (k1 < m, k2 < 128):

        X[k1 + m k2] = sum_n2 W128^(n2 k2) * Wn^(n2 k1)
                       * [ sum_n1 Wm^(n1 k1) x[128 n1 + n2] ]

    Stage 1 contracts the m chunks (static 128-wide column slices) on
    the VPU with Wm scalars read from SMEM (round-2's version baked
    all m x m scalars in as trace-time constants, fully unrolling both
    loops — the 213 KB MLIR crashed the Mosaic compile helper; making
    k1 a GRID axis shrinks the kernel body 16x and compiles).  The x
    block's index map ignores k1, so Mosaic keeps it VMEM-resident
    across the k1 sweep.  The twiddle is a broadcast row multiply;
    stage 2 is one (tile_b,128)@(128,128) complex matmul on the MXU —
    16x fewer MXU flops than the full-DFT kernel at n=2048.  The
    output block for fixed k1 is the contiguous column slice
    [128 k1, 128 k1 + 128) in PERMUTED order; the caller un-permutes
    with an XLA transpose of the final f32 display values (the
    epilogue is order-independent)."""
    f32 = jnp.float32
    # window the x block ONCE per batch tile (the k1 sweep reuses the
    # scratch; grid order is (i, 0..m-1) so k1==0 refreshes it per i)
    @pl.when(pl.program_id(1) == 0)
    def _window():
        w = win_ref[0, :]
        xwr[:, :] = xr_ref[:, :] * w
        xwi[:, :] = xi_ref[:, :] * w

    # Wm row for this k1 arrives as a pipelined (8, 128) block (rows
    # repeated 8x, n1 on lanes) so every read is static.  (A dynamic
    # SMEM table read works too — the on-device mismatch once blamed
    # on it was actually the default bf16-class matmul precision, see
    # the HIGHEST-precision note below.)
    ar = ai = None
    for n1 in range(m):
        wr = wmr_ref[0, n1]
        wi = wmi_ref[0, n1]
        xcr = xwr[:, n1 * 128:(n1 + 1) * 128]
        xci = xwi[:, n1 * 128:(n1 + 1) * 128]
        t_r = xcr * wr - xci * wi
        t_i = xci * wr + xcr * wi
        ar = t_r if ar is None else ar + t_r
        ai = t_i if ai is None else ai + t_i
    tr = twr_ref[0:1, :]    # (8,128) block of repeated rows (Pallas
    ti = twi_ref[0:1, :]    # needs >=8 sublanes per block); row 0 used
    br = ar * tr - ai * ti
    bi = ar * ti + ai * tr
    # exact=True: HIGHEST precision (3-pass f32 MXU) — necessary for
    # reference-grade output: at default (bf16-class) TPU matmul
    # precision, low bins near the window's sidelobe floor carry ~bf16
    # cancellation error that the dB transform amplifies to tens of dB
    # (measured round 3: the full-DFT paths share one summation
    # structure so their errors cancel pairwise; CT's different
    # structure exposed the true default-precision error).
    # exact=False: default precision — display grade (same error class
    # as the full-DFT paths) at ~1.6x the throughput; measured the
    # fastest spectrum path of all.
    hi = jax.lax.Precision.HIGHEST if exact else None
    yr = (jnp.dot(br, c_ref[:, :], preferred_element_type=f32,
                  precision=hi)
          + jnp.dot(bi, s_ref[:, :], preferred_element_type=f32,
                    precision=hi))
    yi = (jnp.dot(bi, c_ref[:, :], preferred_element_type=f32,
                  precision=hi)
          - jnp.dot(br, s_ref[:, :], preferred_element_type=f32,
                    precision=hi))
    mag2 = yr * yr + yi * yi
    db = f32(10.0) * _log10(jnp.maximum(mag2, 1e-60)) + f32(coeff)
    norm = db * f32(scale) + f32(offset)
    out_ref[:, :] = 0.5 + 0.5 * jnp.tanh(4.0 * (norm - 0.5))


def _pad128(a: np.ndarray) -> np.ndarray:
    """Pad the lane (last) dim up to 128 (vreg row width)."""
    pad = 128 - a.shape[-1]
    if pad <= 0:
        return a
    return np.pad(a, ((0, 0), (0, pad)))


@functools.lru_cache(maxsize=8)
def _ct_mats(n: int):
    """Stage-1 DFT (m, m), twiddle (m, 128) and 128-DFT (128, 128)
    matrices, numpy."""
    m = n // 128
    n2 = np.arange(128)
    k1 = np.arange(m)
    ang_m = 2.0 * np.pi * (np.outer(k1, k1) % m) / m
    ang_t = 2.0 * np.pi * np.outer(k1, n2) / n
    jk = np.outer(n2, n2) % 128
    ang_d = 2.0 * np.pi * jk / 128
    return (np.cos(ang_m).astype(np.float32),
            (-np.sin(ang_m)).astype(np.float32),
            np.cos(ang_t).astype(np.float32),
            (-np.sin(ang_t)).astype(np.float32),
            np.cos(ang_d).astype(np.float32),
            np.sin(ang_d).astype(np.float32))


def spectrum_fused_ct(iq: jnp.ndarray, win: np.ndarray, coeff: float,
                      scale: float, offset: float, tile_b: int = 256,
                      interpret: bool = False,
                      exact: bool = True) -> jnp.ndarray:
    """Fused spectrum via in-kernel Cooley-Tukey (n = m x 128):
    (B, n, 2) float32 -> (B, n) float32 in [0, 1], natural bin order.

    Versus :func:`spectrum_fused` (full-DFT matmul, 16.4 kflop/sample
    at n=2048) this kernel does ~1.2 kflop/sample: the MXU runs only
    the 128-point stage and the m-point stage rides the VPU over
    static column slices (no Mosaic-hostile reshapes).  The XLA-level
    4-step (ops/mxu_fft.py) loses its flop advantage to HBM transpose
    round trips; here all stages stay VMEM-resident.

    This is the REFERENCE-GRADE spectrum path: with its small stage-2
    matmuls at Precision.HIGHEST it measured max 4.7e-5 of an f64
    ground truth on hardware (round 3), where the full-DFT paths at
    the TPU's default matmul precision sit at ~7.6e-2 near the
    window's sidelobe floor (bf16-class cancellation amplified by the
    dB transform).  Throughput cost of exactness: ~12.3 vs ~18.9
    Gsamp/s at default precision; the dft paths remain the
    display-grade speed kings (~25.8 Gsamp/s)."""
    B, n, _two = iq.shape
    assert n % 128 == 0, n
    m = n // 128
    assert m <= 32, f"n={n} needs m<=32 128-chunks (got {m})"
    # largest tile_b <= requested that divides B (ADVICE r2: a bare
    # divisibility assert here failed validated shapes like B=384;
    # fall back 256 -> 128 -> 64 ... -> B itself)
    tile_b = min(tile_b, B)
    while tile_b > 8 and B % tile_b:
        tile_b //= 2
    if B % tile_b:
        tile_b = B
    wmr, wmi, twr, twi, cmat, smat = _ct_mats(n)

    x_spec = pl.BlockSpec((tile_b, n), lambda i, k: (i, 0),
                          memory_space=pltpu.VMEM)
    full = lambda r, c: pl.BlockSpec((r, c), lambda i, k: (0, 0),
                                     memory_space=pltpu.VMEM)
    perm = pl.pallas_call(
        functools.partial(_spectrum_ct_kernel, m=m, coeff=float(coeff),
                          scale=float(scale), offset=float(offset),
                          exact=exact),
        grid=(B // tile_b, m),
        in_specs=[x_spec, x_spec, full(1, n),
                  # per-k1 wm rows and twiddle rows, repeated 8x on
                  # sublanes (blocks need >=8 sublanes or the full
                  # dim); the pipeline does the k1 indexing so every
                  # in-kernel read is static
                  pl.BlockSpec((8, 128), lambda i, k: (k, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda i, k: (k, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda i, k: (k, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda i, k: (k, 0),
                               memory_space=pltpu.VMEM),
                  full(128, 128), full(128, 128)],
        out_specs=pl.BlockSpec((tile_b, 128), lambda i, k: (i, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_b, n), jnp.float32),
                        pltpu.VMEM((tile_b, n), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(iq[:, :, 0], iq[:, :, 1],
      jnp.asarray(win, jnp.float32).reshape(1, n),
      jnp.asarray(np.repeat(_pad128(wmr), 8, axis=0)),
      jnp.asarray(np.repeat(_pad128(wmi), 8, axis=0)),
      jnp.asarray(np.repeat(twr, 8, axis=0)),
      jnp.asarray(np.repeat(twi, 8, axis=0)),
      jnp.asarray(cmat), jnp.asarray(smat))
    # un-permute: natural[k1 + m k2] = perm[128 k1 + k2]
    return perm.reshape(B, m, 128).swapaxes(1, 2).reshape(B, n)


def _alog10(x):
    """In-kernel ApproxLog10 (frexp + cubic, reference
    backend/devices/cpu/helpers.hh:61-74): ~1e-4 of log10 — 1e-5 in
    final display units after the dB/range transform, far below the
    exact path's 2.6e-5 device error.  Mosaic-safe (bitcast, no
    transcendental)."""
    bits = pltpu.bitcast(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 126
    f = pltpu.bitcast((bits & 0x007FFFFF) | 0x3F000000, jnp.float32)
    y = jnp.float32(1.23149591368684)
    y = y * f + jnp.float32(-4.11852516267426)
    y = y * f + jnp.float32(6.02197014179219)
    y = y * f + jnp.float32(-3.13396450166353)
    y = y + e.astype(jnp.float32)
    return y * jnp.float32(0.3010299956639812)


def _atanh_pade(x):
    """Pade(7,6) tanh with the hardware-reciprocal divide (max err
    ~2.5e-4 at the |x|=4.5 clamp, ~1e-7 mid-range)."""
    xc = jnp.clip(x, -4.5, 4.5)
    x2 = xc * xc
    num = xc * (jnp.float32(135135.0)
                + x2 * (jnp.float32(17325.0)
                        + x2 * (jnp.float32(378.0) + x2)))
    den = jnp.float32(135135.0) \
        + x2 * (jnp.float32(62370.0)
                + x2 * (jnp.float32(3150.0) + x2 * jnp.float32(28.0)))
    r = pl.reciprocal(den, approx=True)
    r = r * (jnp.float32(2.0) - den * r)
    return num * r


def _split_bf16(x):
    """Error-free-ish bf16 hi/lo split: x ~= hi + lo with hi, lo bf16
    (residual ~2^-16 relative)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _spectrum_ct3_kernel(xr_ref, xi_ref, win_ref, wmr_ref, wmi_ref,
                         twr_ref, twi_ref, mhi_ref, mlo_ref, out_ref,
                         xwr, xwi, *scratch,
                         m: int, coeff: float, scale: float,
                         offset: float, stage2: str = "x3",
                         three_mul: bool = True, kb: int = 1,
                         ep: str = "exact",
                         skip: tuple = ()):
    """Round-4 CT spectrum: ct1's overlapped per-cell stage 1 (the
    VPU m-point sums hide under the MXU stage 2 across the k1 sweep —
    measured: serializing stage 1 at k1==0 LOSES, tools/ablation
    r4_ablate) + two stage-2 cost cuts:

    - **manual bf16x3 compensated stage 2** (``stage2="x3"``): Mosaic
      cannot lower ``Precision.HIGH`` (NotImplementedError) and
      HIGHEST costs 6 MXU passes (+0.25 ms/step measured).  Each f32
      operand X and constant matrix M split as bf16 hi+lo and the
      product expands Xhi@Mhi + Xhi@Mlo + Xlo@Mhi — 3 one-pass bf16
      matmuls reproducing ~f32 precision (the dropped Xlo@Mlo term is
      ~2^-16 relative).  ``"x4"`` keeps the 4th term (~2^-24) for
      headroom; ``"default"``/``"highest"`` are the one-pass and
      6-pass baselines.
    - **Karatsuba-style 3-multiply complex matmul** (``three_mul``):
      with A=(br+bi)@C, F=br@(C+S), E=bi@(S-C): yr=A+E, yi=A-F —
      3 matmuls instead of 4 against precomputed constant combos
      (25% less stage-2 MXU work).

    mhi/mlo: stacked constant matrices (nm*128, 128) — hi and lo bf16
    planes for x3/x4 (mlo unused as zeros for default/highest, where
    mhi carries f32).  three_mul: rows [C | C+S | S-C]; else [C | S].

    ``kb``: k1 values per grid cell.  kb>1 amortizes the stage-1 VMEM
    reads: an 8-row group loop loads each windowed x chunk into vregs
    ONCE and accumulates ALL kb stage-1 outputs before touching VMEM
    again — stage-1 read traffic drops kb-fold (it was ~1 GB/step at
    kb=1, most of the measured base cost) while the work stays
    distributed across the k1 sweep.
    """
    f32 = jnp.float32
    if kb > 1:
        asr, asi = scratch[0], scratch[1]
    @pl.when(pl.program_id(1) == 0)
    def _window():
        w = win_ref[0, :]
        xwr[:, :] = xr_ref[:, :] * w
        xwi[:, :] = xi_ref[:, :] * w

    tile_b = xwr.shape[0]
    if kb > 1:
        def group(g, carry):
            r0 = pl.multiple_of(g * 8, 8)
            ch = []
            for n1 in range(m):
                ch.append((xwr[pl.ds(r0, 8),
                               n1 * 128:(n1 + 1) * 128],
                           xwi[pl.ds(r0, 8),
                               n1 * 128:(n1 + 1) * 128]))
            for kk in range(kb):
                ar = ai = None
                for n1 in range(m):
                    wr = wmr_ref[kk * 8, n1]
                    wi = wmi_ref[kk * 8, n1]
                    xcr, xci = ch[n1]
                    t_r = xcr * wr - xci * wi
                    t_i = xci * wr + xcr * wi
                    ar = t_r if ar is None else ar + t_r
                    ai = t_i if ai is None else ai + t_i
                asr[pl.ds(kk * tile_b + r0, 8), :] = ar
                asi[pl.ds(kk * tile_b + r0, 8), :] = ai
            return carry

        jax.lax.fori_loop(0, tile_b // 8, group, 0)

    def mm(x, j):
        if stage2 in ("default", "highest"):
            hi = jax.lax.Precision.HIGHEST \
                if stage2 == "highest" else None
            return jnp.dot(x, mhi_ref[j * 128:(j + 1) * 128, :],
                           preferred_element_type=f32, precision=hi)
        xh, xl = _split_bf16(x)
        mh = mhi_ref[j * 128:(j + 1) * 128, :]
        ml = mlo_ref[j * 128:(j + 1) * 128, :]
        acc = (jnp.dot(xh, mh, preferred_element_type=f32)
               + jnp.dot(xh, ml, preferred_element_type=f32)
               + jnp.dot(xl, mh, preferred_element_type=f32))
        if stage2 == "x4":
            acc = acc + jnp.dot(xl, ml, preferred_element_type=f32)
        return acc

    for kk in range(kb):
        if kb > 1:
            ar = asr[kk * tile_b:(kk + 1) * tile_b, :]
            ai = asi[kk * tile_b:(kk + 1) * tile_b, :]
        elif "s1" in skip:              # ablation: stage-1 cost
            ar = xwr[:, 0:128]
            ai = xwi[:, 0:128]
        else:
            ar = ai = None
            for n1 in range(m):
                wr = wmr_ref[0, n1]
                wi = wmi_ref[0, n1]
                xcr = xwr[:, n1 * 128:(n1 + 1) * 128]
                xci = xwi[:, n1 * 128:(n1 + 1) * 128]
                t_r = xcr * wr - xci * wi
                t_i = xci * wr + xcr * wi
                ar = t_r if ar is None else ar + t_r
                ai = t_i if ai is None else ai + t_i
        if "tw" in skip:
            br, bi = ar, ai
        else:
            tr = twr_ref[kk * 8:kk * 8 + 1, :]
            ti = twi_ref[kk * 8:kk * 8 + 1, :]
            br = ar * tr - ai * ti
            bi = ar * ti + ai * tr
        if "s2" in skip:
            yr, yi = br, bi
        elif three_mul:
            a = mm(br + bi, 0)          # (br+bi) @ C
            fmat = mm(br, 1)            # br @ (C+S)
            e = mm(bi, 2)               # bi @ (S-C)
            yr = a + e
            yi = a - fmat
        else:
            yr = mm(br, 0) + mm(bi, 1)
            yi = mm(bi, 0) - mm(br, 1)
        mag2 = yr * yr + yi * yi
        if ep == "none":                # ablation: epilogue cost
            out_ref[:, kk * 128:(kk + 1) * 128] = mag2
            continue
        if ep == "approx":
            db = f32(10.0) * _alog10(jnp.maximum(mag2, 1e-60)) \
                + f32(coeff)
            norm = db * f32(scale) + f32(offset)
            out_ref[:, kk * 128:(kk + 1) * 128] = \
                0.5 + 0.5 * _atanh_pade(4.0 * (norm - 0.5))
        else:
            db = f32(10.0) * _log10(jnp.maximum(mag2, 1e-60)) \
                + f32(coeff)
            norm = db * f32(scale) + f32(offset)
            out_ref[:, kk * 128:(kk + 1) * 128] = \
                0.5 + 0.5 * jnp.tanh(4.0 * (norm - 0.5))


def spectrum_fused_ct3(iq: jnp.ndarray, win: np.ndarray, coeff: float,
                       scale: float, offset: float, tile_b: int = 256,
                       interpret: bool = False, stage2: str = "x3",
                       three_mul: bool = False,
                       kb: int = 1, ep: str = "exact",
                       skip: tuple = ()) -> jnp.ndarray:
    """Fused CT spectrum, round-4 production layout: (B, n, 2) f32 ->
    (B, n) f32 in [0, 1], natural bin order.  See
    :func:`_spectrum_ct3_kernel`."""
    B, n, _two = iq.shape
    assert n % 128 == 0, n
    m = n // 128
    assert m <= 32, f"n={n} needs m<=32 128-chunks (got {m})"
    if m % kb:
        kb = 1
    tile_b = min(tile_b, B)
    while tile_b > 8 and B % tile_b:
        tile_b //= 2
    if B % tile_b:
        tile_b = B
    if tile_b % 8:
        kb = 1
    wmr, wmi, twr, twi, cmat, smat = _ct_mats(n)
    if three_mul:
        mats = [cmat, cmat + smat, smat - cmat]
    else:
        mats = [cmat, smat]
    stacked = np.concatenate(mats, axis=0)          # (nm*128, 128)
    if stage2 in ("x3", "x4"):
        hi = stacked.astype(np.float32).astype("bfloat16")
        lo = (stacked - hi.astype(np.float32)).astype("bfloat16")
        mhi, mlo = hi, lo
    else:
        mhi = stacked.astype(np.float32)
        mlo = np.zeros_like(stacked,
                            dtype="bfloat16")       # placeholder

    x_spec = pl.BlockSpec((tile_b, n), lambda i, k: (i, 0),
                          memory_space=pltpu.VMEM)
    full = lambda r, c: pl.BlockSpec((r, c), lambda i, k: (0, 0),
                                     memory_space=pltpu.VMEM)
    nm = len(mats)
    scratch = [pltpu.VMEM((tile_b, n), jnp.float32),
               pltpu.VMEM((tile_b, n), jnp.float32)]
    if kb > 1:
        scratch += [pltpu.VMEM((kb * tile_b, 128), jnp.float32),
                    pltpu.VMEM((kb * tile_b, 128), jnp.float32)]
    kspec = pl.BlockSpec((kb * 8, 128), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM)
    perm = pl.pallas_call(
        functools.partial(_spectrum_ct3_kernel, m=m,
                          coeff=float(coeff), scale=float(scale),
                          offset=float(offset), stage2=stage2,
                          three_mul=three_mul, kb=kb, ep=ep,
                          skip=skip),
        grid=(B // tile_b, m // kb),
        in_specs=[x_spec, x_spec, full(1, n),
                  kspec, kspec, kspec, kspec,
                  full(nm * 128, 128), full(nm * 128, 128)],
        out_specs=pl.BlockSpec((tile_b, kb * 128),
                               lambda i, k: (i, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(iq[:, :, 0], iq[:, :, 1],
      jnp.asarray(win, jnp.float32).reshape(1, n),
      jnp.asarray(np.repeat(_pad128(wmr), 8, axis=0)),
      jnp.asarray(np.repeat(_pad128(wmi), 8, axis=0)),
      jnp.asarray(np.repeat(twr, 8, axis=0)),
      jnp.asarray(np.repeat(twi, 8, axis=0)),
      jnp.asarray(mhi), jnp.asarray(mlo))
    return perm.reshape(B, m, 128).swapaxes(1, 2).reshape(B, n)


def _spectrum_ct4_kernel(xr_ref, xi_ref, wvr_ref, wvi_ref,
                         twr_ref, twi_ref, mhi_ref, mlo_ref, out_ref,
                         *, m: int, kb: int, coeff: float,
                         scale: float, offset: float,
                         stage2: str = "highest"):
    """Round-4 production CT spectrum kernel.

    Two structural changes over the round-3 layout, both measured
    (tools/ablation/r4d_ablate.py):

    - **window folded into the stage-1 tables**: wv[k1, n1, :] =
      win[n1 chunk] * Wm[k1, n1], so stage 1 reads the RAW x blocks
      directly — no windowing pass, no (tile_b, n) scratches (the
      4 MB they cost now buys pipelining headroom).
    - **kb k1-values per grid cell, straight-line unrolled**: the
      decomposition showed a ~0.26 ms 'bare' floor dominated by
      per-cell overhead at 256 cells/step; kb=4 cuts cells 4x.  (The
      fori_loop register-blocked variant of the same idea was 2-4x
      SLOWER — straight-line full-width ops are the only fast shape
      on this backend.)

    stage2: "default" (1-pass, display), "x4" (manual 4-product bf16
    compensation, ~3.5e-4 of f64 — the bf16 hi+lo representation
    limit), "highest" (6-pass, 2.6e-5 — the reference-grade default).
    """
    f32 = jnp.float32

    def mm(x, j):
        if stage2 in ("default", "highest"):
            hi = jax.lax.Precision.HIGHEST \
                if stage2 == "highest" else None
            return jnp.dot(x, mhi_ref[j * 128:(j + 1) * 128, :],
                           preferred_element_type=f32, precision=hi)
        xh, xl = _split_bf16(x)
        mh = mhi_ref[j * 128:(j + 1) * 128, :]
        ml = mlo_ref[j * 128:(j + 1) * 128, :]
        acc = (jnp.dot(xh, mh, preferred_element_type=f32)
               + jnp.dot(xh, ml, preferred_element_type=f32)
               + jnp.dot(xl, mh, preferred_element_type=f32))
        if stage2 == "x4":
            acc = acc + jnp.dot(xl, ml, preferred_element_type=f32)
        return acc

    for kk in range(kb):
        ar = ai = None
        for n1 in range(m):
            wr = wvr_ref[kk * m + n1:kk * m + n1 + 1, :]
            wi = wvi_ref[kk * m + n1:kk * m + n1 + 1, :]
            xcr = xr_ref[:, n1 * 128:(n1 + 1) * 128]
            xci = xi_ref[:, n1 * 128:(n1 + 1) * 128]
            t_r = xcr * wr - xci * wi
            t_i = xci * wr + xcr * wi
            ar = t_r if ar is None else ar + t_r
            ai = t_i if ai is None else ai + t_i
        tr = twr_ref[kk * 8:kk * 8 + 1, :]
        ti = twi_ref[kk * 8:kk * 8 + 1, :]
        br = ar * tr - ai * ti
        bi = ar * ti + ai * tr
        yr = mm(br, 0) + mm(bi, 1)
        yi = mm(bi, 0) - mm(br, 1)
        mag2 = yr * yr + yi * yi
        db = f32(10.0) * _log10(jnp.maximum(mag2, 1e-60)) + f32(coeff)
        norm = db * f32(scale) + f32(offset)
        out_ref[:, kk * 128:(kk + 1) * 128] = \
            0.5 + 0.5 * jnp.tanh(4.0 * (norm - 0.5))


def spectrum_fused_ct4(iq: jnp.ndarray, win, coeff: float,
                       scale: float, offset: float, tile_b: int = 256,
                       interpret: bool = False,
                       stage2: str = "highest",
                       kb: int = 4) -> jnp.ndarray:
    """Round-4 production CT spectrum: (B, n, 2) f32 -> (B, n) f32 in
    [0, 1], natural bin order.  See :func:`_spectrum_ct4_kernel`."""
    B, n, _two = iq.shape
    assert n % 128 == 0, n
    m = n // 128
    assert m <= 32, f"n={n} needs m<=32 128-chunks (got {m})"
    if m % kb:
        kb = 1
    tile_b = min(tile_b, B)
    while tile_b > 8 and B % tile_b:
        tile_b //= 2
    if B % tile_b:
        tile_b = B
    wmr, wmi, twr, twi, cmat, smat = _ct_mats(n)
    stacked = np.concatenate([cmat, smat], axis=0)  # (2*128, 128)
    if stage2 in ("x3", "x4"):
        mhi = stacked.astype(np.float32).astype("bfloat16")
        mlo = (stacked - mhi.astype(np.float32)).astype("bfloat16")
    else:
        mhi = stacked.astype(np.float32)
        mlo = np.zeros_like(stacked, dtype="bfloat16")

    # window folded into the stage-1 tables (traced — the window may
    # be a live input): wv[k1*m + n1, n2] = win[n1*128+n2]*Wm[k1, n1]
    wchunks = jnp.asarray(win, jnp.float32).reshape(m, 128)
    wvr = (wchunks[None, :, :]
           * jnp.asarray(wmr)[:, :, None]).reshape(m * m, 128)
    wvi = (wchunks[None, :, :]
           * jnp.asarray(wmi)[:, :, None]).reshape(m * m, 128)

    x_spec = pl.BlockSpec((tile_b, n), lambda i, k: (i, 0),
                          memory_space=pltpu.VMEM)
    full = lambda r, c: pl.BlockSpec((r, c), lambda i, k: (0, 0),
                                     memory_space=pltpu.VMEM)
    perm = pl.pallas_call(
        functools.partial(_spectrum_ct4_kernel, m=m, kb=kb,
                          coeff=float(coeff), scale=float(scale),
                          offset=float(offset), stage2=stage2),
        grid=(B // tile_b, m // kb),
        in_specs=[x_spec, x_spec,
                  pl.BlockSpec((kb * m, 128), lambda i, k: (k, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((kb * m, 128), lambda i, k: (k, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((kb * 8, 128), lambda i, k: (k, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((kb * 8, 128), lambda i, k: (k, 0),
                               memory_space=pltpu.VMEM),
                  full(2 * 128, 128), full(2 * 128, 128)],
        out_specs=pl.BlockSpec((tile_b, kb * 128),
                               lambda i, k: (i, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(iq[:, :, 0], iq[:, :, 1], wvr, wvi,
      jnp.asarray(np.repeat(twr, 8, axis=0)),
      jnp.asarray(np.repeat(twi, 8, axis=0)),
      jnp.asarray(mhi), jnp.asarray(mlo))
    return perm.reshape(B, m, 128).swapaxes(1, 2).reshape(B, n)


def _bit_reverse(n: int):
    bits = n.bit_length() - 1
    return [int(format(i, f"0{bits}b")[::-1], 2) for i in range(n)]


def _digit_reverse4(m: int):
    """Base-4 digit-reversed index order (radix-4 DIT input order)."""
    p = 0
    mm = m
    while mm > 1:
        mm //= 4
        p += 1
    out = []
    for i in range(m):
        r, v = 0, i
        for _ in range(p):
            r = r * 4 + (v & 3)
            v >>= 2
        out.append(r)
    return out


def _chunk_fft4(xr_ref, xi_ref, win_ref, m: int):
    """Radix-4 DIT variant of :func:`_chunk_fft` for m a power of 4:
    ~15% fewer VPU flops (3 twiddle cmuls + 8 complex adds per 4
    outputs per DOUBLE level vs 4 cmuls + 8 adds for two radix-2
    levels) and half the level count.  Same contract: (re, im) in
    natural k1 order, full-width values."""
    f32 = jnp.float32
    rev = _digit_reverse4(m)
    re = [None] * m
    im = [None] * m
    for pos, n1 in enumerate(rev):
        xcr = xr_ref[:, n1 * 128:(n1 + 1) * 128]
        xci = xi_ref[:, n1 * 128:(n1 + 1) * 128]
        if win_ref is not None:
            w = win_ref[0, n1 * 128:(n1 + 1) * 128][None, :]
            xcr = xcr * w
            xci = xci * w
        re[pos] = xcr
        im[pos] = xci

    size = 4
    while size <= m:
        q = size // 4
        for start in range(0, m, size):
            for j in range(q):
                a, b, c, d = (start + j, start + j + q,
                              start + j + 2 * q, start + j + 3 * q)

                def tw(idx, k):
                    # x[idx] * W_size^k (W = exp(-2 pi i / size))
                    k %= size
                    if k == 0:
                        return re[idx], im[idx]
                    if 4 * k == size:      # W^{size/4} = -i
                        return im[idx], -re[idx]
                    if 2 * k == size:      # W^{size/2} = -1
                        return -re[idx], -im[idx]
                    if 4 * k == 3 * size:  # W^{3size/4} = +i
                        return -im[idx], re[idx]
                    ang = -2.0 * np.pi * k / size
                    wr_, wi_ = float(np.cos(ang)), float(np.sin(ang))
                    return (re[idx] * f32(wr_) - im[idx] * f32(wi_),
                            im[idx] * f32(wr_) + re[idx] * f32(wi_))

                br_, bi_ = tw(b, j)
                cr_, ci_ = tw(c, 2 * j)
                dr_, di_ = tw(d, 3 * j)
                t0r, t0i = re[a] + cr_, im[a] + ci_
                t1r, t1i = re[a] - cr_, im[a] - ci_
                t2r, t2i = br_ + dr_, bi_ + di_
                t3r, t3i = br_ - dr_, bi_ - di_
                re[a], im[a] = t0r + t2r, t0i + t2i
                re[c], im[c] = t0r - t2r, t0i - t2i
                # -i*t3 = (t3i, -t3r); +i*t3 = (-t3i, t3r)
                re[b], im[b] = t1r + t3i, t1i - t3r
                re[d], im[d] = t1r - t3i, t1i + t3r
        size *= 4
    return re, im


def _chunk_fft(xr_ref, xi_ref, win_ref, m: int, rows=None,
               radix4: bool = False):
    """In-kernel m-point FFT over the CHUNK axis: butterflies combine
    whole (tile_b, 128) chunk values with scalar twiddles — static
    indices, full vreg width, no lane movement.  ``win_ref`` (1, n)
    multiplies per chunk when given (None: pure transform).  ``rows``
    optionally restricts to a static row slice (r0, r1).  Returns
    (re, im): m full-width values in natural k1 order.  ``radix4``
    routes to :func:`_chunk_fft4` when m is a power of 4 (fewer VPU
    flops; different summation order, same exact-f32 grade)."""
    f32 = jnp.float32
    if radix4 and rows is None and m >= 4 and \
            (m & (m - 1)) == 0 and (m.bit_length() - 1) % 2 == 0:
        return _chunk_fft4(xr_ref, xi_ref, win_ref, m)
    rev = _bit_reverse(m)
    re = [None] * m
    im = [None] * m
    r0, r1 = rows if rows is not None else (0, xr_ref.shape[0])
    for pos, n1 in enumerate(rev):
        xcr = xr_ref[r0:r1, n1 * 128:(n1 + 1) * 128]
        xci = xi_ref[r0:r1, n1 * 128:(n1 + 1) * 128]
        if win_ref is not None:
            w = win_ref[0, n1 * 128:(n1 + 1) * 128][None, :]
            xcr = xcr * w
            xci = xci * w
        re[pos] = xcr
        im[pos] = xci

    # iterative DIT radix-2 (forward: W = exp(-2 pi i j / size))
    size = 2
    while size <= m:
        half = size // 2
        for start in range(0, m, size):
            for j in range(half):
                ang = -2.0 * np.pi * j / size
                wr_ = float(np.cos(ang))
                wi_ = float(np.sin(ang))
                a = start + j
                b = start + j + half
                if j == 0:               # twiddle = 1
                    tr, ti = re[b], im[b]
                elif 4 * j == size:      # twiddle = -i
                    tr, ti = im[b], -re[b]
                else:
                    tr = re[b] * f32(wr_) - im[b] * f32(wi_)
                    ti = im[b] * f32(wr_) + re[b] * f32(wi_)
                re[b] = re[a] - tr
                im[b] = im[a] - ti
                re[a] = re[a] + tr
                im[a] = im[a] + ti
        size *= 2
    return re, im


def _fft_ct_kernel(xr_ref, xi_ref, twr_ref, twi_ref, c_ref, s_ref,
                   or_ref, oi_ref, *, m: int, exact: bool):
    """Generic n = m x 128 forward C2C FFT (no window, no epilogue):
    chunk-axis FFT stage 1 + per-k1 twiddle + 128-point MXU DFT.
    Outputs re/im planes in PERMUTED order; the caller un-permutes
    with a free-ish XLA transpose.  ``exact=True`` uses the round-5
    cpack5 structure (one exact VPU DIF level + complex-packed
    64-point sub-DFT matmuls at HIGHEST — half the MAC passes, see
    :func:`_spectrum_ct5_kernel`); the display tier keeps the direct
    1-pass 128-DFT (the packing VPU ops would cost more than the
    halved single pass saves)."""
    f32 = jnp.float32
    re, im = _chunk_fft(xr_ref, xi_ref, None, m, radix4=True)
    if exact and m >= 2:
        hi = jax.lax.Precision.HIGHEST
        ME = c_ref[:, :]            # [[C64,-S64],[S64,C64]]
        MO = s_ref[:, :]            # odd-bin matrix (W128 absorbed)
        mask = jax.lax.broadcasted_iota(
            jnp.int32, (1, 128), 1) < 64
        tb = xr_ref.shape[0]
        g = 4 if m % 4 == 0 else (2 if m % 2 == 0 else 1)
        for k0 in range(0, m, g):
            ues, uos = [], []
            for kk in range(k0, k0 + g):
                tr = twr_ref[kk * 8:kk * 8 + 1, :]
                ti = twi_ref[kk * 8:kk * 8 + 1, :]
                br = re[kk] * tr - im[kk] * ti
                bi = re[kk] * ti + im[kk] * tr
                P = jnp.where(mask, br, bi)
                Q = jnp.where(mask, bi, br)
                rQ = pltpu.roll(Q, 64, 1)
                ues.append(P + rQ)
                uos.append(P - rQ)
            YE = jnp.dot(jnp.concatenate(ues, axis=0), ME,
                         preferred_element_type=f32, precision=hi)
            YO = jnp.dot(jnp.concatenate(uos, axis=0), MO,
                         preferred_element_type=f32, precision=hi)
            rYE = pltpu.roll(YE, 64, 1)
            rYO = pltpu.roll(YO, 64, 1)
            for p in range(g):
                rows = slice(p * tb, (p + 1) * tb)
                c0 = (k0 + p) * 128
                or_ref[:, c0:c0 + 128] = \
                    jnp.where(mask, YE[rows, :], rYO[rows, :])
                oi_ref[:, c0:c0 + 128] = \
                    jnp.where(mask, rYE[rows, :], YO[rows, :])
        return
    hi = jax.lax.Precision.HIGHEST if exact else None
    for k1 in range(m):
        tr = twr_ref[k1 * 8:k1 * 8 + 1, :]
        ti = twi_ref[k1 * 8:k1 * 8 + 1, :]
        br = re[k1] * tr - im[k1] * ti
        bi = re[k1] * ti + im[k1] * tr
        yr = (jnp.dot(br, c_ref[:, :], preferred_element_type=f32,
                      precision=hi)
              + jnp.dot(bi, s_ref[:, :], preferred_element_type=f32,
                        precision=hi))
        yi = (jnp.dot(bi, c_ref[:, :], preferred_element_type=f32,
                      precision=hi)
              - jnp.dot(br, s_ref[:, :], preferred_element_type=f32,
                        precision=hi))
        or_ref[:, k1 * 128:(k1 + 1) * 128] = yr
        oi_ref[:, k1 * 128:(k1 + 1) * 128] = yi


def fft_pallas(x: jnp.ndarray, tile_b: int = 128,
               interpret: bool = False,
               exact: bool = True) -> jnp.ndarray:
    """General-purpose forward C2C FFT on the last axis via the ct5
    kernel structure: (..., n) complex64 -> (..., n) complex64,
    natural bin order.  Needs n = m*128 with m a power of two <= 32
    (the caller picks another provider otherwise).

    ``exact=True`` runs the 128-point stage at HIGHEST precision
    (module-grade, ~1e-6 relative of ||x||); False at default matmul
    precision (display grade, ~2x faster).  The fft module's
    provider='pallas' route (reference cognate: the per-provider FFT
    implementations, src/domains/dsp/fft/)."""
    n = x.shape[-1]
    assert n % 128 == 0, n
    m = n // 128
    assert m & (m - 1) == 0 and m <= 32, m
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    xb = x.reshape(B, n)
    tile_b = min(tile_b, B)
    while tile_b > 1 and B % tile_b:
        tile_b //= 2
    _, _, twr, twi, cmat, smat = _ct_mats(n)
    packed = exact and m >= 2
    if packed:
        # cpack5 matrices (shared helper — see spectrum cpack5)
        cmat, smat = _cpack5_mats()

    x_spec = pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    full = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_fft_ct_kernel, m=m, exact=exact),
        grid=(B // tile_b,),
        in_specs=[x_spec, x_spec,
                  full(m * 8, 128), full(m * 8, 128),
                  full(128, 128), full(128, 128)],
        out_specs=[pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((B, n), jnp.float32)] * 2,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(jnp.real(xb).astype(jnp.float32),
      jnp.imag(xb).astype(jnp.float32),
      jnp.asarray(np.repeat(twr, 8, axis=0)),
      jnp.asarray(np.repeat(twi, 8, axis=0)),
      jnp.asarray(cmat), jnp.asarray(smat))
    y = (yr + 1j * yi).astype(jnp.complex64)
    if packed:
        # perm[:, 128*k1 + 64*par + r] holds bin k1 + m*(2r + par)
        return y.reshape(B, m, 2, 64).transpose(0, 3, 2, 1) \
            .reshape(*lead, n)
    # un-permute: natural[k1 + m k2] = perm[128 k1 + k2]
    return y.reshape(B, m, 128).swapaxes(1, 2).reshape(*lead, n)


@functools.lru_cache(maxsize=1)
def _cpack5_mats():
    """Complex-packed 64-point sub-DFT matrices shared by the cpack
    tiers of :func:`spectrum_fused_ct5` and :func:`fft_pallas` —
    even = [[C64,-S64],[S64,C64]] on [ur|ui] lanes; odd = the same
    with the W128 twiddle ABSORBED (P1[j,t] = cos(2*pi*j*(2t+1)/128),
    entries rounded once from f64): [[P1,-P2],[-P2,-P1]] consuming
    A1 = [D_r|-D_i] directly."""
    jr = np.outer(np.arange(64), np.arange(64)) % 64
    ang = 2.0 * np.pi * jr / 64
    c64, s64 = np.cos(ang), np.sin(ang)
    me = np.block([[c64, -s64], [s64, c64]]).astype(np.float32)
    jj, tt = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    ango = 2.0 * np.pi * (jj * (2 * tt + 1) % 128) / 128
    p1, p2 = np.cos(ango), np.sin(ango)
    mo = np.block([[p1, -p2], [-p2, -p1]]).astype(np.float32)
    return me, mo


def _spectrum_ct5_kernel(xr_ref, xi_ref, win_ref, twr_ref, twi_ref,
                         mhi_ref, mlo_ref, out_ref, sc, *,
                         m: int, tile_b: int, coeff: float,
                         scale: float, offset: float,
                         stage2: str = "highest",
                         stage1: str = "r4",
                         fastlog: bool = False):
    """Round-4 final CT spectrum: stage 1 as a RADIX-2 FFT over the
    chunk axis.

    ct4 computes the m-point stage-1 DFT directly (m MACs per k1 =
    m^2 full-width VPU ops per batch tile — the measured ~0.22 ms
    dominating every precision tier).  The m-point transform's
    butterflies combine whole (tile_b, 128) chunk VALUES with scalar
    twiddles: every index is a STATIC python-level choice, every op is
    full vreg width, nothing moves across lanes — exactly the shape
    this backend runs fast.  m log2(m) butterfly ops replace m^2 MACs
    (16-pt: ~5x fewer stage-1 flops).  All m k1-bins are produced in
    ONE grid cell (the butterfly outputs are named values, so the
    bit-reversal is free static selection); stage 2 + epilogue run per
    k1 inside the cell.

    Stage-1 arithmetic stays on the VPU's true-f32 ALUs, so the exact
    path's accuracy is preserved (FFT rounding is O(log m * eps),
    at-or-below the direct summation's).
    """
    f32 = jnp.float32

    def mm(x, j):
        if stage2 in ("default", "highest"):
            hi = jax.lax.Precision.HIGHEST \
                if stage2 == "highest" else None
            return jnp.dot(x, mhi_ref[j * 128:(j + 1) * 128, :],
                           preferred_element_type=f32, precision=hi)
        xh, xl = _split_bf16(x)
        mh = mhi_ref[j * 128:(j + 1) * 128, :]
        ml = mlo_ref[j * 128:(j + 1) * 128, :]
        acc = (jnp.dot(xh, mh, preferred_element_type=f32)
               + jnp.dot(xh, ml, preferred_element_type=f32)
               + jnp.dot(xl, mh, preferred_element_type=f32))
        if stage2 == "x4":
            acc = acc + jnp.dot(xl, ml, preferred_element_type=f32)
        return acc

    if stage2.startswith("hsplit"):
        # exact tier, overlap experiment: process the batch tile in S
        # independent row slices, emitting each slice's stage-1 VPU
        # butterflies and stage-2 HIGHEST matmuls as separate chains —
        # the slices share no data, so the scheduler MAY overlap slice
        # i+1's VPU stage 1 under slice i's exposed MXU stage 2.
        S = int(stage2[6:] or 2)
        hi = jax.lax.Precision.HIGHEST
        step = tile_b // S
        for s in range(S):
            r0, r1 = s * step, (s + 1) * step
            re_s, im_s = _chunk_fft(xr_ref, xi_ref, win_ref, m,
                                    rows=(r0, r1))
            for k1 in range(m):
                tr = twr_ref[k1 * 8:k1 * 8 + 1, :]
                ti = twi_ref[k1 * 8:k1 * 8 + 1, :]
                br = re_s[k1] * tr - im_s[k1] * ti
                bi = re_s[k1] * ti + im_s[k1] * tr
                cmt = mhi_ref[0:128, :]
                smt = mhi_ref[128:256, :]

                def d(x, mm_):
                    return jnp.dot(x, mm_,
                                   preferred_element_type=f32,
                                   precision=hi)

                yr = d(br, cmt) + d(bi, smt)
                yi = d(bi, cmt) - d(br, smt)
                mag2 = yr * yr + yi * yi
                db = f32(10.0) * _log10(jnp.maximum(mag2, 1e-60)) \
                    + f32(coeff)
                norm = db * f32(scale) + f32(offset)
                out_ref[r0:r1, k1 * 128:(k1 + 1) * 128] = \
                    0.5 + 0.5 * jnp.tanh(4.0 * (norm - 0.5))
        return

    re, im = _chunk_fft(xr_ref, xi_ref, win_ref, m,
                        radix4=(stage1 == "r4"))

    def epilogue_mag2(mag2):
        # fastlog = the reference's own ApproxLog10
        # (backend/devices/cpu/helpers.hh:61-74 port): ~1e-5 in final
        # display units — below the exact tier's device error
        lg = _alog10 if fastlog else _log10
        db = f32(10.0) * lg(jnp.maximum(mag2, 1e-60)) + f32(coeff)
        norm = db * f32(scale) + f32(offset)
        return 0.5 + 0.5 * jnp.tanh(4.0 * (norm - 0.5))

    def epilogue(yr, yi):
        return epilogue_mag2(yr * yr + yi * yi)

    if stage2 == "hfft64":
        # exact tier, round-5 production: one DIF radix-2 level splits
        # the 128-point lane DFT into even/odd 64-point DFTs (lane-
        # half sums/differences through the scratch), and ALL 2m
        # sub-transforms batch into four (2m*tile_b, 64) HIGHEST
        # matmuls — half the exact-path MXU MACs of the direct
        # 128-point stage 2, with the butterfly exact on the VPU.
        # (fft64 unbatched lost 1.7x: m separate K=64 matmuls pad;
        # hbatch alone was neutral: the 6-pass cost is real work, not
        # call overhead — r5a/r5b ablations.)
        tb = tile_b
        hi = jax.lax.Precision.HIGHEST
        t64r = mlo_ref[128:129, 0:64]
        t64i = mlo_ref[129:130, 0:64]
        c64 = mlo_ref[0:64, 0:64]
        s64 = mlo_ref[64:128, 0:64]
        er, ei, orr, oi_ = [], [], [], []
        for k1 in range(m):
            tr = twr_ref[k1 * 8:k1 * 8 + 1, :]
            ti = twi_ref[k1 * 8:k1 * 8 + 1, :]
            br = re[k1] * tr - im[k1] * ti
            bi = re[k1] * ti + im[k1] * tr
            sc[0:tb, :] = br
            sc[tb:2 * tb, :] = bi
            brL, brH = sc[0:tb, 0:64], sc[0:tb, 64:128]
            biL, biH = sc[tb:2 * tb, 0:64], sc[tb:2 * tb, 64:128]
            er.append(brL + brH)
            ei.append(biL + biH)
            cR, cI = brL - brH, biL - biH
            orr.append(cR * t64r - cI * t64i)
            oi_.append(cI * t64r + cR * t64i)
        UR = jnp.concatenate(er + orr, axis=0)    # (2m*tb, 64)
        UI = jnp.concatenate(ei + oi_, axis=0)
        VR = (jnp.dot(UR, c64, preferred_element_type=f32,
                      precision=hi)
              + jnp.dot(UI, s64, preferred_element_type=f32,
                        precision=hi))
        VI = (jnp.dot(UI, c64, preferred_element_type=f32,
                      precision=hi)
              - jnp.dot(UR, s64, preferred_element_type=f32,
                        precision=hi))
        for k1 in range(m):
            e0, o0 = k1 * tb, (m + k1) * tb
            out_ref[:, k1 * 128:k1 * 128 + 64] = epilogue(
                VR[e0:e0 + tb, :], VI[e0:e0 + tb, :])
            out_ref[:, k1 * 128 + 64:(k1 + 1) * 128] = epilogue(
                VR[o0:o0 + tb, :], VI[o0:o0 + tb, :])
        return

    if stage2 in ("cpack", "cpack6"):
        # exact tier, round-5 production candidate: the 6-pass HIGHEST
        # stage 2 is AT the bf16 MXU roofline (4*B*m*128^2 MACs * 6
        # passes ~= the measured 0.18-0.22 ms — k6/hbatch proved no
        # same-MAC reformulation can win), so the MAC COUNT must drop.
        # One DIF radix-2 level (exact f32 on the VPU) splits the
        # 128-point lane DFT into even/odd 64-point COMPLEX sub-DFTs;
        # each complex 64-DFT is one real (128,128) matrix
        # [[C64,-S64],[S64,C64]] acting on [ur|ui] lane-packed rows —
        # FULL MXU tiles (fft64's K=64/N=64 matmuls padded 4x and
        # lost 1.7x despite the same MAC cut), half the MAC passes.
        # k1 values are processed in PAIRS so the mag2/epilogue chain
        # repacks onto full 128-lane vregs (the ypack lesson: half-
        # width VPU chains cost ~2x issue slots).  All lane-offset
        # moves ride the scratch ref (legal), never value concats.
        tb = tile_b
        hi = jax.lax.Precision.HIGHEST
        M2 = mhi_ref[0:128, :]
        if stage2 == "cpack6":
            M2h = mlo_ref[130:130 + 768, :]
        t64r = mlo_ref[128:129, 0:64]
        t64i = mlo_ref[129:130, 0:64]
        # sc (8tb, 128): [0:2tb] br/bi staging, [2tb:6tb] packed U
        # then Y, [6tb:8tb] mag2 repack / epilogue staging
        for k1 in range(0, m, 2):
            for half, kk in enumerate((k1, k1 + 1)):
                tr = twr_ref[kk * 8:kk * 8 + 1, :]
                ti = twi_ref[kk * 8:kk * 8 + 1, :]
                br = re[kk] * tr - im[kk] * ti
                bi = re[kk] * ti + im[kk] * tr
                sc[0:tb, :] = br
                sc[tb:2 * tb, :] = bi
                brL, brH = sc[0:tb, 0:64], sc[0:tb, 64:128]
                biL, biH = sc[tb:2 * tb, 0:64], sc[tb:2 * tb, 64:128]
                cR, cI = brL - brH, biL - biH
                u0 = 2 * tb + half * 2 * tb
                sc[u0:u0 + tb, 0:64] = brL + brH
                sc[u0:u0 + tb, 64:128] = biL + biH
                sc[u0 + tb:u0 + 2 * tb, 0:64] = \
                    cR * t64r - cI * t64i
                sc[u0 + tb:u0 + 2 * tb, 64:128] = \
                    cI * t64r + cR * t64i
            U = sc[2 * tb:6 * tb, :]
            if stage2 == "cpack6":
                uh = U.astype(jnp.bfloat16)
                r1 = U - uh.astype(f32)
                um = r1.astype(jnp.bfloat16)
                ul = (r1 - um.astype(f32)).astype(jnp.bfloat16)
                U6 = jnp.concatenate(
                    [uh, uh, uh, um, um, ul], axis=1)
                Y = jnp.dot(U6, M2h, preferred_element_type=f32)
            else:
                Y = jnp.dot(U, M2, preferred_element_type=f32,
                            precision=hi)
            sc[2 * tb:6 * tb, :] = Y
            yr = sc[2 * tb:6 * tb, 0:64]
            yi = sc[2 * tb:6 * tb, 64:128]
            mag2 = yr * yr + yi * yi             # (4tb, 64)
            sc[6 * tb:8 * tb, 0:64] = mag2[0:2 * tb, :]
            sc[6 * tb:8 * tb, 64:128] = mag2[2 * tb:4 * tb, :]
            ep = epilogue_mag2(sc[6 * tb:8 * tb, :])  # (2tb, 128)
            sc[0:2 * tb, :] = ep
            # lanes [0:64] = k1's bins, [64:128] = (k1+1)'s; rows
            # [0:tb] = even sub-DFT, [tb:2tb] = odd — same permuted
            # layout as fft64 (wrapper un-permutes)
            out_ref[:, k1 * 128:k1 * 128 + 64] = sc[0:tb, 0:64]
            out_ref[:, k1 * 128 + 64:(k1 + 1) * 128] = \
                sc[tb:2 * tb, 0:64]
            out_ref[:, (k1 + 1) * 128:(k1 + 1) * 128 + 64] = \
                sc[0:tb, 64:128]
            out_ref[:, (k1 + 1) * 128 + 64:(k1 + 2) * 128] = \
                sc[tb:2 * tb, 64:128]
        return

    if stage2 in ("cpack2", "cpack4"):
        # cpack with ZERO scratch round trips: the lane-half
        # sums/differences ride pltpu.roll(·, 64) (both halves appear
        # at full width, duplicated/negated), iota-selects build the
        # [ur|ui] complex packing as pure value ops, and U stacks as
        # a row-concat VALUE straight into the half-MAC matmul.  The
        # scratch formulation above measured +0.08 ms of staging;
        # this one's packing is ~13 full-width VPU ops per k1.
        # cpack4 additionally packs k1-PAIRS onto lane halves for the
        # epilogue (no duplicate-lane waste, ~9 fewer ops/k1).
        tb = tile_b
        hi = jax.lax.Precision.HIGHEST
        M2 = mhi_ref[0:128, :]
        cdup = mlo_ref[128:129, :]           # [cos | cos] W128^j
        sdup = mlo_ref[129:130, :]           # [sin | sin]
        mask = jax.lax.broadcasted_iota(
            jnp.int32, (1, 128), 1) < 64

        def pack_u(kk):
            # trimmed packing algebra (bit-identical to the direct
            # er/ei/ofr/ofi formulation — same operand order): with
            # P = [brL|biH], Q = [biL|brH] (selects) and roll swapping
            # halves, U_even = P + roll(Q) = [E_r|E_i] in ONE add, and
            # A1 = P - roll(Q) = [D_r|-D_i], A2 = Q - roll(P) =
            # [D_i|-D_r] combine with the SIGNED twiddle rows
            # cneg = [cos|-cos], sdup = [sin|sin] to give
            # U_odd = A1*cneg + A2*sdup = [O_r|O_i] directly — no
            # final select/negate (17 ops/k1 vs 21 for the direct
            # form).
            tr = twr_ref[kk * 8:kk * 8 + 1, :]
            ti = twi_ref[kk * 8:kk * 8 + 1, :]
            br = re[kk] * tr - im[kk] * ti
            bi = re[kk] * ti + im[kk] * tr
            P = jnp.where(mask, br, bi)
            Q = jnp.where(mask, bi, br)
            rP = pltpu.roll(P, 64, 1)
            rQ = pltpu.roll(Q, 64, 1)
            return P + rQ, (P - rQ) * cdup + (Q - rP) * sdup

        g = 4 if stage2 == "cpack4" and m % 4 == 0 else 2
        for k0 in range(0, m, g):
            us = []
            for kk in range(k0, k0 + g):
                us.extend(pack_u(kk))
            U = jnp.concatenate(us, axis=0)  # (2g*tb, 128)
            Y = jnp.dot(U, M2, preferred_element_type=f32,
                        precision=hi)
            ysq = Y * Y
            mag2d = ysq + pltpu.roll(ysq, 64, 1)   # dup halves
            if g == 2:
                ep = epilogue_mag2(mag2d)
                for p in range(2):
                    out_ref[:, (k0 + p) * 128:(k0 + p + 1) * 128] = \
                        jnp.where(mask,
                                  ep[2 * p * tb:(2 * p + 1) * tb, :],
                                  ep[(2 * p + 1) * tb:
                                     (2 * p + 2) * tb, :])
                continue
            # cpack4: lanes L <- pair (k0, k0+1), lanes H <- pair
            # (k0+2, k0+3); epilogue runs exactly once per element
            c01 = jnp.where(mask, mag2d[0:2 * tb, :],
                            mag2d[4 * tb:6 * tb, :])
            c23 = jnp.where(mask, mag2d[2 * tb:4 * tb, :],
                            mag2d[6 * tb:8 * tb, :])
            epA = epilogue_mag2(c01)         # L: k0,   H: k0+2
            epB = epilogue_mag2(c23)         # L: k0+1, H: k0+3
            for p, ep in ((0, epA), (1, epB)):
                ev, od = ep[0:tb, :], ep[tb:2 * tb, :]
                out_ref[:, (k0 + p) * 128:(k0 + p + 1) * 128] = \
                    jnp.where(mask, ev, pltpu.roll(od, 64, 1))
                out_ref[:, (k0 + 2 + p) * 128:
                        (k0 + 3 + p) * 128] = \
                    jnp.where(mask, pltpu.roll(ev, 64, 1), od)
        return

    if stage2 == "cpack5":
        # cpack with the W128 odd-branch twiddle ABSORBED into the odd
        # sub-DFT matrix: the odd-bin DFT matrix
        # P1[j,t] = cos(2*pi*j*(2t+1)/128), P2 = sin(...) is
        # k1-independent, so M_odd = [[P1,-P2],[-P2,-P1]] consumes
        # A1 = P - roll(Q) = [D_r|-D_i] DIRECTLY — the per-k1 pack
        # drops to 11 ops (twiddle 6, selects 2, roll 1, add/sub 2),
        # entries are rounded ONCE from f64 (more exact than the
        # runtime f32 twiddle multiply), and with evens/odds in
        # separate matmuls the epilogue pack is one select per k1.
        tb = tile_b
        hi = jax.lax.Precision.HIGHEST
        ME = mhi_ref[0:128, :]
        MO = mlo_ref[0:128, :]
        mask = jax.lax.broadcasted_iota(
            jnp.int32, (1, 128), 1) < 64

        g = 4 if m % 4 == 0 else 2
        for k0 in range(0, m, g):
            ues, uos = [], []
            for kk in range(k0, k0 + g):
                tr = twr_ref[kk * 8:kk * 8 + 1, :]
                ti = twi_ref[kk * 8:kk * 8 + 1, :]
                br = re[kk] * tr - im[kk] * ti
                bi = re[kk] * ti + im[kk] * tr
                P = jnp.where(mask, br, bi)
                Q = jnp.where(mask, bi, br)
                rQ = pltpu.roll(Q, 64, 1)
                ues.append(P + rQ)           # [E_r | E_i]
                uos.append(P - rQ)           # [D_r | -D_i]
            YE = jnp.dot(jnp.concatenate(ues, axis=0), ME,
                         preferred_element_type=f32, precision=hi)
            YO = jnp.dot(jnp.concatenate(uos, axis=0), MO,
                         preferred_element_type=f32, precision=hi)
            sqE, sqO = YE * YE, YO * YO
            mE = sqE + pltpu.roll(sqE, 64, 1)    # dup mag2 halves
            mO = sqO + pltpu.roll(sqO, 64, 1)
            for p in range(g):
                comb = jnp.where(mask, mE[p * tb:(p + 1) * tb, :],
                                 mO[p * tb:(p + 1) * tb, :])
                out_ref[:, (k0 + p) * 128:(k0 + p + 1) * 128] = \
                    epilogue_mag2(comb)
        return

    if stage2 in ("k6", "k5"):
        # exact tier, round-5: manual HIGHEST with the splitting
        # hoisted OUT of the matmul.  Builtin HIGHEST runs ~28x off
        # the MAC roofline because its 6 passes interleave VPU operand
        # splitting with the MXU, serializing against stage 1 (hbatch
        # proved call-count is not the cost).  Here each batched
        # operand splits into 3 bf16 planes ONCE (xh+xm+xl carries the
        # full 24-bit mantissa), the planes stack along K at 128-lane-
        # aligned offsets (legal, unlike mid-lane concats), and ONE
        # pure-bf16 K=6*128 matmul computes all six >=2^-24 cross
        # terms with exact bf16 products and f32 MXU accumulation —
        # no per-pass VPU work, so Mosaic can pipeline stage 2 against
        # the next cell's stage-1 butterflies.  k5 drops the x_h*M_l
        # term (~2^-24) for one fewer K block.
        nterm = 6 if stage2 == "k6" else 5
        kk = nterm * 128
        brs, bis = [], []
        for k1 in range(m):
            tr = twr_ref[k1 * 8:k1 * 8 + 1, :]
            ti = twi_ref[k1 * 8:k1 * 8 + 1, :]
            brs.append(re[k1] * tr - im[k1] * ti)
            bis.append(re[k1] * ti + im[k1] * tr)
        BR = jnp.concatenate(brs, axis=0)
        BI = jnp.concatenate(bis, axis=0)

        def split6(v):
            h1 = v.astype(jnp.bfloat16)
            r1 = v - h1.astype(f32)
            h2 = r1.astype(jnp.bfloat16)
            r2 = r1 - h2.astype(f32)
            h3 = r2.astype(jnp.bfloat16)
            parts = ([h1, h1, h1, h2, h2, h3] if nterm == 6
                     else [h1, h1, h1, h2, h3])   # k5 drops xm*Mm
            return jnp.concatenate(parts, axis=1)

        X6r = split6(BR)
        X6i = split6(BI)
        C6 = mlo_ref[0:kk, :]
        S6 = mlo_ref[kk:2 * kk, :]
        YR = (jnp.dot(X6r, C6, preferred_element_type=f32)
              + jnp.dot(X6i, S6, preferred_element_type=f32))
        YI = (jnp.dot(X6i, C6, preferred_element_type=f32)
              - jnp.dot(X6r, S6, preferred_element_type=f32))
        tb = tile_b
        for k1 in range(m):
            out_ref[:, k1 * 128:(k1 + 1) * 128] = epilogue(
                YR[k1 * tb:(k1 + 1) * tb, :],
                YI[k1 * tb:(k1 + 1) * tb, :])
        return

    if stage2 in ("hbatch", "dbatch"):
        # batch ALL m k1-blocks into four big (m*tile_b, 128) matmuls:
        # the per-call overhead, not the MAC count, dominates stage 2
        # (measured: 64 HIGHEST 128^3 matmuls = 0.18 ms where the MAC
        # roofline is ~7 us) — row-concat of the k1 values is lane-
        # aligned and legal, and one M=m*tile_b matmul amortizes the
        # MXU pipeline fill m-fold.
        hi = (jax.lax.Precision.HIGHEST if stage2 == "hbatch"
              else None)
        brs, bis = [], []
        for k1 in range(m):
            tr = twr_ref[k1 * 8:k1 * 8 + 1, :]
            ti = twi_ref[k1 * 8:k1 * 8 + 1, :]
            brs.append(re[k1] * tr - im[k1] * ti)
            bis.append(re[k1] * ti + im[k1] * tr)
        BR = jnp.concatenate(brs, axis=0)
        BI = jnp.concatenate(bis, axis=0)
        cm = mhi_ref[0:128, :]
        sm = mhi_ref[128:256, :]

        def big(xx, mm_):
            return jnp.dot(xx, mm_, preferred_element_type=f32,
                           precision=hi)

        YR = big(BR, cm) + big(BI, sm)
        YI = big(BI, cm) - big(BR, sm)
        tb = tile_b
        for k1 in range(m):
            out_ref[:, k1 * 128:(k1 + 1) * 128] = epilogue(
                YR[k1 * tb:(k1 + 1) * tb, :],
                YI[k1 * tb:(k1 + 1) * tb, :])
        return

    # per-k1: twiddle row multiply, stage 2, epilogue — all static
    for k1 in range(m):
        tr = twr_ref[k1 * 8:k1 * 8 + 1, :]
        ti = twi_ref[k1 * 8:k1 * 8 + 1, :]
        br = re[k1] * tr - im[k1] * ti
        bi = re[k1] * ti + im[k1] * tr
        if stage2 == "fft64":
            # exact stage 2, one DIF radix-2 level deeper (VERDICT r4
            # item 5): the 128-point lane DFT splits into even/odd
            # 64-point DFTs fed by lane-half sums/differences.  The
            # halves are contiguous lane slices, reachable through a
            # VMEM scratch (offset-64 REF reads are legal; value
            # concats are not), and the four HIGHEST matmuls shrink
            # K=128,N=128 -> K=64,N=64 — 4x fewer MACs through the
            # 6-pass path, with the extra butterfly exact on the VPU.
            tb = tile_b
            sc[0:tb, :] = br
            sc[tb:2 * tb, :] = bi
            brL, brH = sc[0:tb, 0:64], sc[0:tb, 64:128]
            biL, biH = sc[tb:2 * tb, 0:64], sc[tb:2 * tb, 64:128]
            t64r = mlo_ref[128:129, 0:64]
            t64i = mlo_ref[129:130, 0:64]
            c64 = mlo_ref[0:64, 0:64]
            s64 = mlo_ref[64:128, 0:64]
            aR, aI = brL + brH, biL + biH
            cR, cI = brL - brH, biL - biH
            oR = cR * t64r - cI * t64i
            oI = cI * t64r + cR * t64i
            hi = jax.lax.Precision.HIGHEST

            def dft64(ur, ui):
                vr = (jnp.dot(ur, c64, preferred_element_type=f32,
                              precision=hi)
                      + jnp.dot(ui, s64, preferred_element_type=f32,
                                precision=hi))
                vi = (jnp.dot(ui, c64, preferred_element_type=f32,
                              precision=hi)
                      - jnp.dot(ur, s64, preferred_element_type=f32,
                                precision=hi))
                return vr, vi

            yrE, yiE = dft64(aR, aI)
            yrO, yiO = dft64(oR, oI)
            # lane layout [even | odd]; the wrapper un-permutes with a
            # pure XLA transpose (k = k1 + m*(2r+par))
            out_ref[:, k1 * 128:k1 * 128 + 64] = epilogue(yrE, yiE)
            out_ref[:, k1 * 128 + 64:(k1 + 1) * 128] = \
                epilogue(yrO, yiO)
            continue
        yr = mm(br, 0) + mm(bi, 1)
        yi = mm(bi, 0) - mm(br, 1)
        out_ref[:, k1 * 128:(k1 + 1) * 128] = epilogue(yr, yi)


def spectrum_fused_ct5(iq: jnp.ndarray, win, coeff: float,
                       scale: float, offset: float, tile_b: int = 0,
                       interpret: bool = False,
                       stage2: str = "highest",
                       vmem_limit: Optional[int] = None,
                       stage1: str = "r4",
                       fastlog: bool = False) -> jnp.ndarray:
    """Fused CT spectrum with FFT-structured stage 1: (B, n, 2) f32 ->
    (B, n) f32 in [0, 1], natural bin order.  Requires m = n/128 to be
    a power of two (falls back to the caller's ct4 otherwise).  See
    :func:`_spectrum_ct5_kernel`."""
    B, n, _two = iq.shape
    assert n % 128 == 0, n
    m = n // 128
    assert m & (m - 1) == 0 and m <= 32, \
        f"ct5 needs a power-of-two chunk count <= 32 (got {m})"
    if not tile_b:
        # measured (r4j/r5b): the 1-pass display tiers gain from the
        # bigger batch tile; the multi-pass tiers' extra stage-2
        # operands put tile 256 over the DEFAULT scoped-vmem limit —
        # the cpack tiers raise it (r5j: vmem_limit_bytes) and run
        # best at 256
        tile_b = 256 if stage2 in ("default", "dbatch", "cpack2",
                                   "cpack4", "cpack5") else 128
    tile_b = min(tile_b, B)
    while tile_b > 8 and B % tile_b:
        tile_b //= 2
    if B % tile_b:
        tile_b = B
    wmr, wmi, twr, twi, cmat, smat = _ct_mats(n)
    stacked = np.concatenate([cmat, smat], axis=0)
    if stage2 in ("x3", "x4"):
        mhi = stacked.astype(np.float32).astype("bfloat16")
        mlo = (stacked - mhi.astype(np.float32)).astype("bfloat16")
    elif stage2 in ("k6", "k5"):
        # mlo = the K-stacked bf16 term matrices [C6; S6], each block
        # row pairing one operand split plane (see kernel): order
        # [Mh; Mm; Ml; Mh; Mm; Mh] (k5 drops the Ml block)
        def split3(mat):
            h1 = mat.astype("bfloat16")
            r1 = mat - h1.astype(np.float32)
            h2 = r1.astype("bfloat16")
            r2 = r1 - h2.astype(np.float32)
            h3 = r2.astype("bfloat16")
            return h1, h2, h3

        def stack6(mat):
            h1, h2, h3 = split3(mat)
            blocks = ([h1, h2, h3, h1, h2, h1] if stage2 == "k6"
                      else [h1, h2, h3, h1, h1])
            return np.concatenate(blocks, axis=0)

        mhi = stacked.astype(np.float32)
        mlo = np.concatenate([stack6(cmat), stack6(smat)], axis=0)
    elif stage2 in ("cpack", "cpack6", "cpack2", "cpack4", "cpack5"):
        if m < 2:
            stage2 = "highest"
            mhi = stacked.astype(np.float32)
            mlo = np.zeros_like(stacked, dtype="bfloat16")
        else:
            # mhi = the complex-packed 64-DFT matrix; for cpack5 mlo
            # is the W128-absorbed odd-bin matrix (shared helper);
            # other tiers pack W128 twiddle rows (+ the k6-style
            # K-stacked split planes for cpack6) into mlo
            M2, M_odd = _cpack5_mats()
            mhi = M2
            if stage2 == "cpack5":
                mlo = M_odd
            else:
                rows = 898 if stage2 == "cpack6" else 130
                tbl = np.zeros((rows, 128), np.float32)
                j = np.arange(64)
                if stage2 in ("cpack2", "cpack4"):
                    # roll-based packing: signed full-width twiddle
                    # rows — cneg = [cos|-cos] pairs with
                    # A1 = [D_r|-D_i] and sdup = [sin|sin] with
                    # A2 = [D_i|-D_r] so the odd sub-DFT input lands
                    # as [O_r|O_i] with no select
                    tbl[128, 0:64] = np.cos(2.0 * np.pi * j / 128)
                    tbl[128, 64:128] = -tbl[128, 0:64]
                    tbl[129, 0:64] = np.sin(2.0 * np.pi * j / 128)
                    tbl[129, 64:128] = tbl[129, 0:64]
                else:
                    tbl[128, 0:64] = np.cos(2.0 * np.pi * j / 128)
                    tbl[129, 0:64] = -np.sin(2.0 * np.pi * j / 128)
                if stage2 == "cpack6":
                    h1 = M2.astype("bfloat16")
                    r1 = M2 - h1.astype(np.float32)
                    h2 = r1.astype("bfloat16")
                    h3 = (r1 - h2.astype(np.float32)) \
                        .astype("bfloat16")
                    blocks = [h1, h2, h3, h1, h2, h1]
                    tbl[130:898, :] = np.concatenate(
                        [b.astype(np.float32) for b in blocks],
                        axis=0)
                mlo = tbl
    elif stage2 in ("fft64", "hfft64"):
        # mlo repurposed as the DIF table: 64-point DFT matrices at
        # rows [0:64] (cos) / [64:128] (sin), the W128^j odd-branch
        # twiddle at rows 128 (re) / 129 (im), lanes [0:64]
        mhi = stacked.astype(np.float32)
        jr = np.outer(np.arange(64), np.arange(64)) % 64
        ang = 2.0 * np.pi * jr / 64
        tbl = np.zeros((256, 128), np.float32)
        tbl[0:64, 0:64] = np.cos(ang)
        tbl[64:128, 0:64] = np.sin(ang)
        j = np.arange(64)
        tbl[128, 0:64] = np.cos(2.0 * np.pi * j / 128)
        tbl[129, 0:64] = -np.sin(2.0 * np.pi * j / 128)
        mlo = tbl
    else:
        mhi = stacked.astype(np.float32)
        mlo = np.zeros_like(stacked, dtype="bfloat16")

    if (vmem_limit is None and tile_b >= 256
            and stage2.startswith("cpack")):
        # the packed tiers' live values put tile>=256 ~1.4M over the
        # default 16M scoped-vmem limit; 16M of headroom per extra
        # 256 rows measured fastest (r5j/r5m)
        vmem_limit = (16 + 16 * (tile_b // 256)) * 1024 * 1024

    x_spec = pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    full = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    perm = pl.pallas_call(
        functools.partial(_spectrum_ct5_kernel, m=m, tile_b=tile_b,
                          coeff=float(coeff), scale=float(scale),
                          offset=float(offset), stage2=stage2,
                          stage1=stage1, fastlog=fastlog),
        grid=(B // tile_b,),
        in_specs=[x_spec, x_spec, full(1, n),
                  full(m * 8, 128), full(m * 8, 128),
                  full(mhi.shape[0], 128), full(mlo.shape[0], 128)],
        out_specs=pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM(
            ((8 if stage2 in ("cpack", "cpack6") else 2) * tile_b,
             128), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(iq[:, :, 0], iq[:, :, 1],
      jnp.asarray(win, jnp.float32).reshape(1, n),
      jnp.asarray(np.repeat(twr, 8, axis=0)),
      jnp.asarray(np.repeat(twi, 8, axis=0)),
      jnp.asarray(mhi), jnp.asarray(mlo))
    if stage2 in ("fft64", "hfft64", "cpack", "cpack6",
                  "cpack2", "cpack4", "cpack5"):
        # perm[:, 128*k1 + 64*par + r] holds bin k1 + m*(2r + par)
        return perm.reshape(B, m, 2, 64).transpose(0, 3, 2, 1) \
            .reshape(B, n)
    return perm.reshape(B, m, 128).swapaxes(1, 2).reshape(B, n)


# (the round-4 "ct2" experiment — stage 1 serialized at k1==0 with a
# fori_loop register-blocked row sweep — measured 0.6-1.6 ms vs ct1's
# 0.44 on hardware and was removed; the same idea is reproducible via
# spectrum_fused_ct3(kb=...).  Findings: CLAUDE.md round-4 notes.)


@functools.lru_cache(maxsize=8)
def _wbfm_bands(hkey: bytes):
    """FIR band matrix (256, 128): a 256-sample [prev_row | cur_row]
    window producing 128 outputs."""
    hv = np.frombuffer(hkey, np.float32)
    T = hv.shape[0]
    A = np.zeros((256, 128), np.float32)
    for j in range(128):
        for k in range(T):
            A[128 + j - k, j] = hv[k]
    return A


def _wbfm_kernel(xpr_ref, xcr_ref, xpi_ref, xci_ref, hr_ref, hi_ref,
                 a_ref, out_ref, *, ref_gain: float):
    """One grid step: ``tile_r`` rows of 128 samples each.

    y  = FIR(x) = [xp | xc] @ A                (banded MXU matmuls)
    yd = y[i-1] — the SAME y lane/sublane-rolled one sample back in
         row-major order (exact value reuse, no second matmul); the
         tile's first sample takes its predecessor from a precomputed
         per-tile halo scalar (h*_ref)
    demod = atan2(Im(yd^* . y), Re(yd^* . y)) * ref_gain
    """
    a1, a2 = a_ref[0:128, :], a_ref[128:256, :]

    def fir(xp, xc):
        return (jnp.dot(xp, a1, preferred_element_type=jnp.float32)
                + jnp.dot(xc, a2, preferred_element_type=jnp.float32))

    yr = fir(xpr_ref[:, :], xcr_ref[:, :])
    yi = fir(xpi_ref[:, :], xci_ref[:, :])

    col = jax.lax.broadcasted_iota(jnp.int32, yr.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, yr.shape, 0)

    def delayed(y, halo):
        s = pltpu.roll(y, 1, 1)            # [r, c] = y[r, c-1 (wrap)]
        u = pltpu.roll(s, 1, 0)            # [r, 0] = y[r-1, 127]
        d = jnp.where(col == 0, u, s)
        return jnp.where((col == 0) & (row == 0), halo, d)

    t = pl.program_id(0)
    pr = delayed(yr, hr_ref[0, t])
    pi_ = delayed(yi, hi_ref[0, t])
    dr = pr * yr + pi_ * yi
    di = pr * yi - pi_ * yr
    out_ref[:, :] = _atan2(di, dr, recip=True) * jnp.float32(ref_gain)


def wbfm_fused(x: jnp.ndarray, taps: jnp.ndarray, hist: jnp.ndarray,
               ref_gain: float, tile_r: int = 512,
               interpret: bool = False) -> jnp.ndarray:
    """Fused WBFM front end: channel FIR + FM phase discriminator in
    one VMEM pass (reference cognates: filter + fm modules,
    src/domains/dsp/{filter_taps,fm}/).

    x:    (2, n) float32 re/im, n % 128 == 0
    taps: (T,) float32 real channel filter, T <= 129
    hist: (2, T-1) float32 trailing samples of the previous block
    Returns demod (n,) float32; the caller handles audio decimation
    (XLA reshape+mean) and the new history (``x[:, -K:]``).

    The discriminator's lag-1 sample y[i-1] is the FIR output itself
    rolled one sample back inside the tile (bit-identical reuse); each
    tile's first sample gets its predecessor from a per-tile halo FIR
    scalar computed on the XLA side.  Rows are zero-padded up to a
    ``tile_r`` multiple rather than shrinking the tile (small tiles
    were a measured 4x kernel slowdown at nf % 512 != 0)."""
    T = int(taps.shape[-1])
    K = T - 1
    assert T <= 129, "wbfm_fused supports up to 129 taps"
    n = x.shape[-1]
    assert n % 128 == 0, n
    nf = n // 128
    h = np.asarray(taps, np.float32)
    A = _wbfm_bands(h.tobytes())

    tile_r = max(1, min(tile_r, nf))
    pad = (-nf) % tile_r
    nfp = nf + pad

    # rows of the current block and the rows one frame back (row 0's
    # previous frame is the zero-padded history)
    xc = x.reshape(2, nf, 128)
    hrow = jnp.concatenate(
        [jnp.zeros((2, 128 - K), jnp.float32), hist.astype(jnp.float32)],
        axis=-1) if K < 128 else hist.astype(jnp.float32)
    xp = jnp.concatenate([hrow[:, None, :], xc[:, :-1, :]], axis=1)
    if pad:
        z = jnp.zeros((2, pad, 128), jnp.float32)
        xc = jnp.concatenate([xc, z], axis=1)
        xp = jnp.concatenate([xp, z], axis=1)

    # per-tile halo: y[i*tile_r*128 - 1] for each grid step i — the FIR
    # output at the sample just before the tile (col 127 of row
    # i*tile_r - 1; tile 0's "row -1" is the zero-padded history row).
    # Computed with the SAME banded matmul the kernel runs so the MXU
    # numerics match bit-for-bit: a plain dot differs by ~1e-3 in the
    # lag-1 value, which shows up as a per-tile-boundary discriminator
    # error (measured 2.8e-3 rad on device).  ntiles is small, so the
    # stacked window matmul is trivial work.
    ntiles = nfp // tile_r
    aj = jnp.asarray(A)
    wp_rows = [jnp.zeros((2, 128), jnp.float32)] + [
        xp[:, t * tile_r - 1, :] for t in range(1, ntiles)]
    wc_rows = [hrow] + [xc[:, t * tile_r - 1, :]
                        for t in range(1, ntiles)]
    wp = jnp.stack(wp_rows, axis=0).reshape(ntiles * 2, 128)
    wc = jnp.stack(wc_rows, axis=0).reshape(ntiles * 2, 128)
    hy = (jnp.dot(wp, aj[0:128], preferred_element_type=jnp.float32)
          + jnp.dot(wc, aj[128:256],
                    preferred_element_type=jnp.float32))[:, 127]
    halo = hy.reshape(ntiles, 2).T            # (2, ntiles)

    x_spec = pl.BlockSpec((tile_r, 128), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, ntiles), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    m_spec = pl.BlockSpec((256, 128), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_wbfm_kernel, ref_gain=float(ref_gain)),
        grid=(ntiles,),
        in_specs=[x_spec, x_spec, x_spec, x_spec, h_spec, h_spec,
                  m_spec],
        out_specs=pl.BlockSpec((tile_r, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nfp, 128), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(xp[0], xc[0], xp[1], xc[1], halo[0:1], halo[1:2],
      jnp.asarray(A))
    return out.reshape(nfp * 128)[:n]


@functools.lru_cache(maxsize=8)
def _wbfm_bands_v2(hkey: bytes):
    """Interleaved band matrices M1/M2 (256, 256) for the v2 WBFM
    kernel: input rows are RAW ``iq.reshape(nf, 256)`` (re/im
    interleaved on lanes), the de-interleave is folded into the
    matrices (even rows feed the yr columns 0:128, odd rows the yi
    columns 128:256), and the one-row shift rides the [prev | cur]
    band split: yall = wprev @ M1 + wcur @ M2."""
    A = _wbfm_bands(hkey)                       # (256, 128) [prev|cur]
    M1 = np.zeros((256, 256), np.float32)
    M2 = np.zeros((256, 256), np.float32)
    M1[0::2, 0:128] = A[0:128]
    M1[1::2, 128:256] = A[0:128]
    M2[0::2, 0:128] = A[128:256]
    M2[1::2, 128:256] = A[128:256]
    return M1, M2


def _wbfm_kernel_v2(body_ref, halo_ref, hr_ref, hi_ref, m1_ref,
                    m2_ref, *rest, tile_r: int,
                    ref_gain: float, fast3: bool, crows: int = 0):
    """One grid step, v2 layout: ``tile_r`` interleaved rows of 128
    complex samples.  FIR + de-interleave as two banded MXU matmuls,
    then the roll-based lag-1 discriminator of the v1 kernel.

    ``crows`` (opt-in coherent discriminator): group-average the
    complex lag products over the audio-decimation window BEFORE the
    angle — the flat-order D-sample groups tile as ``crows`` rows per
    chunk (lcm(D, 128)/128), summed by per-row selector matmuls
    against a lane-padded S table; one atan per audio sample."""
    if crows:
        sel_ref, out_ref, win = rest
    else:
        out_ref, win = rest
    win[0:1, :] = halo_ref[0]
    win[1:tile_r + 1, :] = body_ref[:, :]
    yall = (jnp.dot(win[0:tile_r, :], m1_ref[:, :],
                    preferred_element_type=jnp.float32)
            + jnp.dot(win[1:tile_r + 1, :], m2_ref[:, :],
                      preferred_element_type=jnp.float32))
    yr = yall[:, 0:128]
    yi = yall[:, 128:256]

    col = jax.lax.broadcasted_iota(jnp.int32, yr.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, yr.shape, 0)

    def delayed(y, halo):
        s = pltpu.roll(y, 1, 1)            # [r, c] = y[r, c-1 (wrap)]
        u = pltpu.roll(s, 1, 0)            # [r, 0] = y[r-1, 127]
        d = jnp.where(col == 0, u, s)
        return jnp.where((col == 0) & (row == 0), halo, d)

    t = pl.program_id(0)
    pr = delayed(yr, hr_ref[0, t])
    pi_ = delayed(yi, hi_ref[0, t])
    dr = pr * yr + pi_ * yi
    di = pr * yi - pi_ * yr
    if crows:
        nch = tile_r // crows
        d3r = dr.reshape(nch, crows, 128)
        d3i = di.reshape(nch, crows, 128)
        ar = ai = None
        # DEFAULT precision on purpose — see the channelizer coherent
        # branch: HIGHEST was a measured 2.4x step cost for no audible
        # precision need
        for r in range(crows):
            s_r = sel_ref[r * 128:(r + 1) * 128, :]
            tr_ = jnp.dot(d3r[:, r, :], s_r,
                          preferred_element_type=jnp.float32)
            ti_ = jnp.dot(d3i[:, r, :], s_r,
                          preferred_element_type=jnp.float32)
            ar = tr_ if ar is None else ar + tr_
            ai = ti_ if ai is None else ai + ti_
        out_ref[:, :] = _atan2(ai, ar, recip=True, newton=not fast3,
                               poly3=fast3) * jnp.float32(ref_gain)
        return
    out_ref[:, :] = _atan2(di, dr, recip=True, newton=not fast3,
                           poly3=fast3) * jnp.float32(ref_gain)


def wbfm_fused_v2(iq: jnp.ndarray, taps: jnp.ndarray,
                  hist: jnp.ndarray, ref_gain: float,
                  tile_r: int = 512, interpret: bool = False,
                  fast3: bool = True,
                  coherent_decim: int = 0) -> jnp.ndarray:
    """Round-4 WBFM front end: NO prep passes.

    The v1 kernel streamed TWO row-planes per component (xp = the
    rows shifted one back, built by an XLA concat) after an XLA
    transpose of the (n, 2) input — ~3 full HBM round trips of prep
    before the kernel ran (STATUS round-4 item 4).  Here the kernel
    consumes ``iq.reshape(nf, 256)`` — a FREE reshape of the raw
    input — the re/im de-interleave is folded into the band matrices
    (:func:`_wbfm_bands_v2`), and the one-row shift comes from a
    per-tile halo row + an in-kernel 1-row scratch copy.  HBM traffic
    drops from ~5 passes to [read input once + write demod once].

    iq:   (n, 2) float32 raw interleaved IQ, n % 128 == 0
    taps: (T,) float32 real channel filter, T <= 129
    hist: (2, T-1) float32 trailing samples of the previous block
    Returns demod (n,) float32 (caller decimates + carries history) —
    EXCEPT with ``coherent_decim=D``, which averages the complex lag
    products over D-sample windows in-kernel and returns
    already-decimated audio of shape (n // D,).
    """
    T = int(taps.shape[-1])
    K = T - 1
    assert T <= 129, "wbfm_fused_v2 supports up to 129 taps"
    n = iq.shape[0]
    assert n % 128 == 0, n
    nf = n // 128
    h = np.asarray(taps, np.float32)
    M1, M2 = _wbfm_bands_v2(h.tobytes())

    crows = 0
    gper = 0
    if coherent_decim:
        D = int(coherent_decim)
        import math as _math

        crows = _math.lcm(D, 128) // 128    # rows per group-chunk
        if crows > 16:
            raise ValueError(
                f"coherent_decim={D} needs a {crows * 128}-row "
                "selector table (lcm(D,128)/128 > 16) — over the "
                "scoped-vmem budget; use a D sharing more factors "
                "with 128 or the classic mode")
        gper = crows * 128 // D             # audio samples per chunk
        assert gper <= 128, (D, gper)
        # tile must hold whole group-chunks AND keep both the input
        # block (tile_r rows) and the output block (tile_r/crows
        # rows) sublane-aligned: tile_r % (8 * crows) == 0
        L = 8 * crows
        tile_r = max(L, (tile_r // L) * L)
        # short-input clamp must KEEP the L-multiple invariant (the
        # kernel reshapes each tile to (nch, crows, 128)); zero-pad
        # covers the remainder and the output is sliced to n//D below
        tile_r = min(tile_r, -(-nf // L) * L)
    else:
        tile_r = max(1, min(tile_r, nf))
    pad = (-nf) % tile_r
    nfp = nf + pad
    ntiles = nfp // tile_r

    iq2 = iq.reshape(nf, 256)
    if pad:
        iq2 = jnp.concatenate(
            [iq2, jnp.zeros((pad, 256), jnp.float32)], axis=0)

    # history as the interleaved previous row (last K samples sit at
    # the row's tail; earlier lanes are zero — outside the band)
    hrow = jnp.zeros((256,), jnp.float32)
    if K:
        hk = hist.astype(jnp.float32).T.reshape(2 * K)   # re/im pairs
        hrow = hrow.at[256 - 2 * K:].set(hk)
    # per-tile halo rows: row i*tile_r - 1 (tile 0: the history row)
    if ntiles > 1:
        iq3 = iq2.reshape(ntiles, tile_r, 256)
        halos = jnp.concatenate(
            [hrow[None, None, :], iq3[:-1, tile_r - 1:, :]], axis=0)
    else:
        halos = hrow[None, None, :]

    # per-tile lag scalar: FIR output at the sample just before the
    # tile — computed with the SAME banded matmuls for bit-identical
    # numerics (a plain dot differs ~1e-3 in the lag value: a visible
    # per-tile-boundary discriminator error)
    m1j, m2j = jnp.asarray(M1), jnp.asarray(M2)
    # row two before each tile's start; with tile_r == 1 the t=1 tile's
    # "two before" is the history row itself — a raw iq2[-1] would wrap
    # to the LAST row and corrupt the lag-1 carry (ADVICE r4)
    wp_rows = [jnp.zeros((256,), jnp.float32)] + [
        (hrow if t * tile_r - 2 < 0 else iq2[t * tile_r - 2, :])
        for t in range(1, ntiles)]
    wc_rows = [hrow] + [iq2[t * tile_r - 1, :]
                        for t in range(1, ntiles)]
    wp = jnp.stack(wp_rows, axis=0)
    wc = jnp.stack(wc_rows, axis=0)
    hy = (jnp.dot(wp, m1j, preferred_element_type=jnp.float32)
          + jnp.dot(wc, m2j, preferred_element_type=jnp.float32))
    hr = hy[:, 127].reshape(1, ntiles)
    hi_ = hy[:, 255].reshape(1, ntiles)

    in_specs = [
        pl.BlockSpec((tile_r, 256), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 256), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ntiles), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, ntiles), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((256, 256), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((256, 256), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [iq2, halos, hr, hi_, m1j, m2j]
    if crows:
        # lane-padded selector table S (crows*128, 128): column g of
        # row-block r sums the samples of flat-order group g that land
        # in chunk-row r; lanes >= gper are zero (atan2(0,0) = 0)
        D = int(coherent_decim)
        S = np.zeros((crows * 128, 128), np.float32)
        for r in range(crows):
            for lane in range(128):
                g = (r * 128 + lane) // D
                S[r * 128 + lane, g] = 1.0 / D
        in_specs.append(pl.BlockSpec((crows * 128, 128),
                                     lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(S))
        out_rows = tile_r // crows
        out_shape = jax.ShapeDtypeStruct((nfp // crows, 128),
                                         jnp.float32)
    else:
        out_rows = tile_r
        out_shape = jax.ShapeDtypeStruct((nfp, 128), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_wbfm_kernel_v2, tile_r=tile_r,
                          ref_gain=float(ref_gain), fast3=fast3,
                          crows=crows),
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tile_r + 1, 256), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)
    if crows:
        # (nfp/crows, 128) rows of gper valid lanes -> flat audio
        return out[:, :gper].reshape(-1)[:n // int(coherent_decim)]
    return out.reshape(nfp * 128)[:n]


def channelize_demod(ext: jnp.ndarray, hp: jnp.ndarray,
                     wr: jnp.ndarray, wi: jnp.ndarray,
                     prev: jnp.ndarray, ref_gain: float,
                     tile_m: int = 512, interpret: bool = False,
                     variant: str = "v1"
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused polyphase channelizer + FM demod (time-major layout).

    ext:  (M + P - 1, 2C) float32 — frames+history, re in [:, :C],
          im in [:, C:]
    hp:   (P, C) float32 polyphase taps (conv layout: tap p applies to
          frame offset p within the window); duplicated across re|im
          lanes before entering the kernel
    wr/wi: (C, C) float32 DFT matrix parts (y[c] = sum_k W[c,k] z[k]);
          packed into the (2C, 2C) real block form for the MXU
    prev: (1, 2C) float32 last y frame of the previous step

    Returns (demod (M, C) float32, ylast (1, 2C) float32).
    """
    extm, twoC = ext.shape
    C = twoC // 2
    P = hp.shape[0]
    M = extm - (P - 1)
    tile_m = min(tile_m, M)
    assert M % tile_m == 0, (M, tile_m)
    grid_n = M // tile_m

    body = ext[P - 1:]                                   # (M, 2C)
    if P > 1:
        idx = (np.arange(grid_n)[:, None] * tile_m
               + np.arange(P - 1)[None, :])
        halos = ext[idx]                                 # (g, P-1, 2C)
    else:
        halos = jnp.zeros((grid_n, 0, twoC), ext.dtype)

    bmat = jnp.concatenate(
        [jnp.concatenate([wr.T, wi.T], axis=1),
         jnp.concatenate([-wi.T, wr.T], axis=1)], axis=0)   # (2C, 2C)
    hp_dup = jnp.concatenate([hp, hp], axis=1)              # (P, 2C)

    out_specs = [
        pl.BlockSpec((tile_m, C), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * C), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((M, C), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
    ]
    body_spec = pl.BlockSpec((tile_m, 2 * C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, P - 1, 2 * C),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    prev_spec = pl.BlockSpec((1, 2 * C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    if variant == "v2":
        # taps folded into P pre-multiplied DFT matrices (MXU does the
        # FIR arithmetic too); flattened 2D for the VMEM ref
        bp = (hp_dup[:, :, None] * bmat[None, :, :]).reshape(
            P * 2 * C, 2 * C)
        out, ylast = pl.pallas_call(
            functools.partial(_channelize_kernel_v2, P=P, C=C,
                              tile_m=tile_m,
                              ref_gain=float(ref_gain)),
            grid=(grid_n,),
            in_specs=[
                body_spec, halo_spec,
                pl.BlockSpec((P * 2 * C, 2 * C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                prev_spec,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((1, 2 * C), jnp.float32),
                pltpu.VMEM((tile_m + P - 1, 2 * C), jnp.float32),
            ],
            interpret=interpret,
        )(body, halos, bp, prev)
        return out, ylast

    out, ylast = pl.pallas_call(
        functools.partial(_channelize_kernel, P=P, C=C, tile_m=tile_m,
                          ref_gain=float(ref_gain)),
        grid=(grid_n,),
        in_specs=[
            body_spec, halo_spec,
            pl.BlockSpec((P, 2 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * C, 2 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            prev_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, 2 * C), jnp.float32),
            pltpu.VMEM((tile_m, 2 * C), jnp.float32),
        ],
        interpret=interpret,
    )(body, halos, hp_dup, bmat, prev)
    return out, ylast
