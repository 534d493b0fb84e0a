"""Fused pillar-feature-net Pallas kernel: sorted points → canvas rows.

Collapses the eval-mode pillar pipeline (decorate → PFN layer(s) → per-pillar
max → emit rows) into ONE kernel that streams sorted rows through VMEM:
HBM traffic drops from ~15 array passes (the XLA segmented-scan formulation,
~30 ms/iter for nuScenes 8×250k on v5e) to one read of the raw sorted points
plus one write of the output rows.

Replaces (for inference) the XLA path in ops/pillar_ops.py, which remains
the train-mode and CPU path. Reference semantics: hard_voxelize first-P
capping (paddle3d/ops/voxel/voxelize_op.cu:158) + PillarFeatureNet
decoration/max (paddle3d/models/voxel_encoders/pillar_encoder.py:64,109),
with this repo's deterministic sorted-arrival order.

Design notes (see also sorted_scatter.py):
  * CHANNEL-MAJOR layout [C, T]: rows live on lanes, so every segment
    reduction is a lane-roll + key-guard + combine, and the PFN matmuls are
    natural [units, C] @ [C, T] MXU products. The raw sorted columns come
    straight from the multi-operand sort — no transpose on the input side.
  * Every per-pillar reduction spans ≤ max_points consecutive rows (the
    stable sort puts a pillar's kept rows at its segment head), so 5
    key-guarded doubling steps (±31 rows) compute exact ranks, means and
    maxes entirely in VMEM.
  * Halos: each grid step sees [prev | cur | next] blocks of the padded
    input via three BlockSpec views (Mosaic double-buffers them); one pad
    block on each side covers the boundary cases (front keys −1 never equal
    real keys; back keys are the sentinel).
  * The max_voxels cap is a global head-count prefix: a scalar SMEM carry
    accumulated across the (sequential) row-block grid.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_pfn_rows"]

_SENT = 2**31 - 1
_NEG = -1e9


def _decorate(P, maxV, nx, R, H, with_distance, vx, vy, x_off, y_off,
              kp_ref, kc_ref, kn_ref, pp_ref, pc_ref, pn_ref, carry_ref):
    """Shared decorate block: halo-concat keys/points, segment masks,
    rank/cap, per-pillar means, PFN input features. Returns
    (x [C_dec, T], keep, emit, k, dists, same_dn, same_up, rdn, rup)."""
    blk = pl.program_id(1)

    @pl.when(blk == 0)
    def _():
        carry_ref[0, 0] = 0

    k = jnp.concatenate(
        [kp_ref[0, :, R - H:], kc_ref[0], kn_ref[0, :, :H]], axis=-1)
    pts = jnp.concatenate(
        [pp_ref[0, :, R - H:], pc_ref[0], pn_ref[0, :, :H]],
        axis=-1).astype(jnp.float32)
    T = R + 2 * H

    def rdn(x, d):
        return pltpu.roll(x, d, axis=1)          # row i reads i-d

    def rup(x, d):
        return pltpu.roll(x, T - d, axis=1)      # row i reads i+d

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    valid = k < _SENT

    # distance-d same-key masks, both directions (shared by all scans);
    # doubling until the window 2^K−1 ≥ P: the rank count must distinguish
    # rank P−1 (kept) from rank P (dropped), so the window has to reach P
    # rows back; halo H covers it — see fused_pfn_rows
    dists = []
    d = 1
    while 2 * d - 1 < P:
        dists.append(d)
        d *= 2
    dists.append(d)
    same_dn = {d: k == rdn(k, d) for d in dists}
    same_up = {d: k == rup(k, d) for d in dists}

    # in-segment rank: backward same-key count via guarded doubling
    cnt = jnp.ones((1, T), jnp.int32)
    for d in dists:
        cnt = cnt + jnp.where(same_dn[d], rdn(cnt, d), 0)
    rank = cnt - 1

    head = (k != rdn(k, 1)) & valid
    tail = k != rup(k, 1)

    # global pillar ordinal: heads in the CENTRAL region only (halo heads
    # belong to neighbouring blocks), zero-fill full-tile prefix + carry
    hc = jnp.where(head & (lane >= H) & (lane < H + R), 1, 0)
    hp = hc
    d = 1
    while d < T:
        hp = hp + jnp.where(lane >= d, rdn(hp, d), 0)
        d *= 2
    vox = carry_ref[0, 0] + hp - 1
    carry_ref[0, 0] = carry_ref[0, 0] + jnp.sum(hc)

    keep = valid & (rank < P) & (vox < maxV)
    emit = keep & (tail | (rank == P - 1))
    fkeep = keep.astype(jnp.float32)

    # per-pillar xyz mean over kept rows: backward + forward bounded sums
    s4 = jnp.concatenate([pts[:3] * fkeep, fkeep], axis=0)   # [4, T]
    ps = s4
    fs = s4
    for d in dists:
        ps = ps + jnp.where(same_dn[d], rdn(ps, d), 0.)
        fs = fs + jnp.where(same_up[d], rup(fs, d), 0.)
    tot = ps + fs - s4
    count = jnp.maximum(tot[3:4], 1.)
    mean = tot[:3] / count

    xc = k - (k // nx) * nx
    yc = k // nx
    cx = xc.astype(jnp.float32) * vx + x_off
    cy = yc.astype(jnp.float32) * vy + y_off

    feats = [pts, pts[:3] - mean, pts[0:1] - cx, pts[1:2] - cy]
    if with_distance:
        feats.append(jnp.sqrt(jnp.sum(pts[:3] * pts[:3], axis=0,
                                      keepdims=True)))
    x = jnp.concatenate(feats, axis=0) * fkeep                # [C_dec, T]
    return x, keep, emit, k, dists, same_dn, same_up, rdn, rup


def _kernel(C_in, u1, u2, n_layers, P, maxV, nx, R, H, with_distance,
            occupancy, vx, vy, x_off, y_off,
            kp_ref, kc_ref, kn_ref, pp_ref, pc_ref, pn_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, out_ref, carry_ref):
    x, keep, emit, k, dists, same_dn, same_up, rdn, rup = _decorate(
        P, maxV, nx, R, H, with_distance, vx, vy, x_off, y_off,
        kp_ref, kc_ref, kn_ref, pp_ref, pc_ref, pn_ref, carry_ref)
    T = R + 2 * H

    w1 = w1_ref[...]
    y = jnp.maximum(
        jax.lax.dot_general(w1, x.astype(w1.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + b1_ref[...], 0.)                                    # [u1, T]
    # NOTE: the [u1, T] max scans below are VPU↔VMEM-bandwidth bound (~15
    # array passes/block). Running them in bf16 would halve the traffic
    # and stay EXACT (bf16 rounding is monotone, so max commutes with it),
    # but Mosaic cannot lane-roll sub-32-bit vectors ("Rotate with
    # non-32-bit data not implemented" — bf16 packs sublane pairs, not
    # lane pairs, so a lane roll has no cheap packed form). f32 it stays.
    neg = jnp.asarray(_NEG, y.dtype)

    if n_layers == 2:
        ym = jnp.where(keep, y, neg)
        for d in dists:
            dn = jnp.where(same_dn[d], rdn(ym, d), neg)
            up = jnp.where(same_up[d], rup(ym, d), neg)
            ym = jnp.maximum(ym, jnp.maximum(dn, up))
        x2 = jnp.concatenate([y, ym], axis=0)                 # [2*u1, T]
        w2 = w2_ref[...]
        t = jnp.maximum(
            jax.lax.dot_general(w2, x2.astype(w2.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + b2_ref[...], 0.).astype(y.dtype)                # [u2, T]
    else:
        t = y

    tm = jnp.where(keep, t, neg)
    for d in dists:
        tm = jnp.maximum(
            tm, jnp.where(same_dn[d], rdn(tm, d), neg))
    out = jnp.where(emit, tm, jnp.asarray(0., tm.dtype))
    if occupancy:
        out = jnp.concatenate([out, emit.astype(tm.dtype)], axis=0)
    out_ref[0] = out[:, H:H + R].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_layers", "P", "maxV", "nx", "vx", "vy", "x_off",
                     "y_off", "with_distance", "occupancy", "interpret",
                     "block_rows", "padded_out"))
def fused_pfn_rows(keys, pts_t, w1t, b1, w2t, b2, *, n_layers, P, maxV, nx,
                   vx, vy, x_off, y_off, with_distance=False,
                   occupancy=False, interpret=False, block_rows=8192,
                   padded_out=False):
    """Sorted pillar rows → emitted canvas rows, one fused kernel.

    Args:
        keys: [B, N] int32 cell keys, SORTED ascending (sentinel 2^31-1 for
            out-of-range rows).
        pts_t: [B, C_in, N] the matching sorted point columns.
        w1t: [u1, C_dec] BN-folded first-layer weight (C_dec = C_in + 5
            (+1 with_distance)); b1: [u1, 1].
        w2t: [u2, 2*u1] second-layer weight ([y, segmax] order) or None;
            b2: [u2, 1] or None.
        padded_out: return the FULL padded buffer [B, u_out, ≥n+block_rows]
            (≥ one whole zero block past n, output dtype = w1t.dtype) — the
            exact channel-major input sorted_segment_sum_cm wants, so the
            scatter pays no pad/transpose prologue (measured 6.2 ms at the
            nuScenes 8×250k shape).
    Returns:
        rows [B, u_out(+1 if occupancy), N] — each pillar's feature on its
        emission row, zero elsewhere; feed (keys, rows) to
        sorted_segment_sum_cm (padded_out) or (keys, rows^T) to
        sorted_segment_sum for the canvas.
    """
    b, c_in, n = pts_t.shape
    R = block_rows
    # halo covers the widest reduction window (2^K − 1 rows with
    # 2^K − 1 ≥ P, matching the kernel's doubling), rounded so T = R + 2H
    # stays a lane multiple
    span = 1
    while span - 1 < P:
        span *= 2
    H = max(64, -(-(span - 1) // 64) * 64)
    nb = -(-n // R)
    if padded_out:
        # one extra all-sentinel block guarantees ≥ R zero rows past n for
        # the scatter's window overreach (views read ≤ n + nviews*W + scap)
        nb += 1
    npad = nb * R
    u1 = w1t.shape[0]
    u2 = w2t.shape[0] if n_layers == 2 else u1

    # pad: one full block front (keys -1, never equal to a real key) + tail
    # to a block multiple + one block back (sentinel)
    keys_p = jnp.concatenate([
        jnp.full((b, 1, R), -1, jnp.int32),
        keys[:, None, :],
        jnp.full((b, 1, npad - n + R), np.int32(_SENT)),
    ], axis=-1)
    pts_p = jnp.pad(pts_t, ((0, 0), (0, 0), (R, npad - n + R)))

    if n_layers != 2:
        w2t = jnp.zeros((1, 1), w1t.dtype)
        b2 = jnp.zeros((1, 1), jnp.float32)

    c_out = (u2 + 1) if occupancy else u2
    kspec = lambda off: pl.BlockSpec(
        (1, 1, R), lambda bi, blk: (bi, 0, blk + off))
    pspec = lambda off: pl.BlockSpec(
        (1, c_in, R), lambda bi, blk: (bi, 0, blk + off))
    wspec = lambda shape: pl.BlockSpec(shape, lambda bi, blk: (0, 0))

    out = pl.pallas_call(
        functools.partial(
            _kernel, c_in, u1, u2, n_layers, P, maxV, nx, R, H,
            with_distance, occupancy, float(vx), float(vy), float(x_off),
            float(y_off)),
        grid=(b, nb),
        in_specs=[
            kspec(0), kspec(1), kspec(2),
            pspec(0), pspec(1), pspec(2),
            wspec(w1t.shape), wspec(b1.shape),
            wspec(w2t.shape), wspec(b2.shape),
        ],
        out_specs=pl.BlockSpec((1, c_out, R),
                               lambda bi, blk: (bi, 0, blk)),
        out_shape=jax.ShapeDtypeStruct(
            (b, c_out, npad), w1t.dtype if padded_out else pts_t.dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(keys_p, keys_p, keys_p, pts_p, pts_p, pts_p, w1t, b1, w2t, b2)
    if padded_out:
        return out
    return out[:, :, :n]
