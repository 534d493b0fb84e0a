"""Rotated BEV IoU and 3D NMS as fixed-shape XLA programs.

TPU-native replacement for the reference CUDA module
(reference: paddle3d/ops/iou3d_nms/iou3d_nms_kernel.cu:275,292,310 — rotated
IoU via cross-product line intersection; bitmask-block greedy NMS).

Design (v5e-profiled):
  1. all-pairs intersection areas via a no-compaction Sutherland–Hodgman
     clip: each clip stage emits exactly 2 slots per edge, with outside
     vertices replaced by their projection onto the clip line (collinear
     excursions telescope in the shoelace sum, keeping the area exact) —
     slot-list elementwise program that XLA fuses end-to-end: 6.8 ms for
     8x1000x1000 (the rolled/stacked form took 110 ms; scatter-based 45 s);
  2. greedy suppression as a lax.scan over score-ordered IoU rows.
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .box_ops import boxes_to_corners_bev

__all__ = [
    "boxes_iou_bev", "boxes_overlap_bev", "boxes_iou3d", "nms_bev",
    "rotate_nms_pcdet", "suppress",
]

def _pairwise_intersection_area(ca: jnp.ndarray,
                                cb: jnp.ndarray) -> jnp.ndarray:
    """All-pairs convex-quad intersection areas, scatter-free.

    ca [N,4,2], cb [M,4,2] (CCW) -> [N,M].

    No-compaction Sutherland–Hodgman: the polygon buffer doubles per clip
    stage (2 slots per edge) instead of compacting via scatters; outside
    vertices are emitted as their orthogonal projection onto the clip line,
    whose shoelace contribution telescopes to the exact chord.

    Slot-LIST formulation: every polygon slot is its own [N, M] array and
    there are NO roll/stack/reshape ops between clip stages, so XLA fuses
    the whole 4-stage chain into a handful of elementwise loops instead of
    materializing [N, M, k, 2] buffers in HBM per stage — measured 6.8 ms
    vs 110 ms for 8x1000x1000 on v5e (16x).
    """
    eps = 1e-7
    ax = [ca[:, j, 0][:, None] for j in range(4)]   # [N, 1]
    ay = [ca[:, j, 1][:, None] for j in range(4)]
    bx = [cb[:, j, 0][None, :] for j in range(4)]   # [1, M]
    by = [cb[:, j, 1][None, :] for j in range(4)]

    # circumscribed-circle guard: provably-disjoint pairs are exactly 0
    # (also removes f32 shoelace residue on far-apart pairs)
    cax = sum(ax) * 0.25
    cay = sum(ay) * 0.25
    cbx = sum(bx) * 0.25
    cby = sum(by) * 0.25
    ra = jnp.zeros_like(cax)
    rb = jnp.zeros_like(cbx)
    for j in range(4):
        ra = jnp.maximum(ra, jnp.sqrt((ax[j] - cax) ** 2 +
                                      (ay[j] - cay) ** 2))
        rb = jnp.maximum(rb, jnp.sqrt((bx[j] - cbx) ** 2 +
                                      (by[j] - cby) ** 2))
    dist = jnp.sqrt((cax - cbx) ** 2 + (cay - cby) ** 2)
    overlap_possible = dist <= ra + rb

    shape = (ca.shape[0], cb.shape[0])
    ones = jnp.ones(shape, ca.dtype)
    poly = [(ax[j] * ones, ay[j] * ones) for j in range(4)]

    for e in range(4):
        a_x, a_y = bx[e], by[e]
        dxe = bx[(e + 1) % 4] - a_x
        dye = by[(e + 1) % 4] - a_y
        inv_d2 = 1.0 / jnp.maximum(dxe * dxe + dye * dye, eps)
        k = len(poly)
        sides = [dxe * (py - a_y) - dye * (px - a_x) for px, py in poly]
        new_poly = []
        for i in range(k):
            sx, sy = poly[i]
            ex, ey = poly[(i + 1) % k]
            ds, de = sides[i], sides[(i + 1) % k]
            s_in = ds >= 0
            denom = ds - de
            t = ds / jnp.where(jnp.abs(denom) < eps, 1.0, denom)
            ix = sx + t * (ex - sx)
            iy = sy + t * (ey - sy)
            crossing = (s_in != (de >= 0)) & (jnp.abs(denom) >= eps)
            # orthogonal projection of s onto the clip line
            tp = ((sx - a_x) * dxe + (sy - a_y) * dye) * inv_d2
            pxv = a_x + tp * dxe
            pyv = a_y + tp * dye
            sax = jnp.where(s_in, sx, pxv)
            say = jnp.where(s_in, sy, pyv)
            new_poly.append((sax, say))
            new_poly.append((jnp.where(crossing, ix, sax),
                             jnp.where(crossing, iy, say)))
        poly = new_poly

    acc = 0.
    k = len(poly)
    for i in range(k):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % k]
        acc = acc + (x0 * y1 - x1 * y0)
    area = 0.5 * jnp.abs(acc)
    return jnp.where(overlap_possible, area, 0.)


def _green_edge_sum(acx, acy, aux, auy, aa, ab,
                    bcx, bcy, bux, buy, ba, bb):
    """Sum of Green's-theorem line integrals of A's edges clipped to B.

    For convex regions, area(A∩B) = ½ ∮_{∂(A∩B)} (x dy − y dx), and the
    boundary decomposes into ∂A∩B plus ∂B∩A. A straight sub-segment from P0
    to P1 contributes exactly P0×P1 to the integral REGARDLESS of the other
    segments — no polygon ordering, no vertex lists. Each of A's 4 edges
    clipped to B's two slabs (interval clamp in B's frame) is ~50 vector
    ops, so the full exact area is ~500 ops/pair vs ~1500 for the
    Sutherland–Hodgman slot-list — and with far fewer live intermediates
    for XLA to fuse.

    Inputs broadcast ([N,1] A-params against [1,M] B-params). A's corners
    are (±aa·u ±ab·v) around (acx, acy), traversed CCW.
    """
    big = 1e9
    # collinearity tolerance: |d_perp| below 0.1 mm over the edge counts as
    # parallel to the slab face (f32 rotation residue for identical boxes
    # is ~1e-6 x scale, well inside; genuinely transversal edges are far
    # outside)
    eps = 1e-4
    # CCW corner sign pattern for right-handed (u, v)
    signs = [(1., 1.), (-1., 1.), (-1., -1.), (1., -1.)]
    px = [acx + su * aa * aux + sv * ab * (-auy) for su, sv in signs]
    py = [acy + su * aa * auy + sv * ab * aux for su, sv in signs]

    total = 0.
    for i in range(4):
        p0x, p0y = px[i], py[i]
        dx_w = px[(i + 1) % 4] - p0x
        dy_w = py[(i + 1) % 4] - p0y
        # B-local coords (B's v axis is perp(u) = (-buy, bux))
        rx = p0x - bcx
        ry = p0y - bcy
        sx = rx * bux + ry * buy
        sy = -rx * buy + ry * bux
        dx = dx_w * bux + dy_w * buy
        dy = -dx_w * buy + dy_w * bux

        def slab(s, d, half):
            degen = jnp.abs(d) < eps
            inv = 1.0 / jnp.where(degen, 1.0, d)
            t1 = (-half - s) * inv
            t2 = (half - s) * inv
            lo = jnp.minimum(t1, t2)
            hi = jnp.maximum(t1, t2)
            # on-face tolerance also admits the edge as inside: an edge ON
            # the face must yield its full (½-weighted) segment, not fall to
            # the strict-inequality side by fp residue
            inside = jnp.abs(s) <= half + 1e-4
            lo = jnp.where(degen, jnp.where(inside, -big, big), lo)
            hi = jnp.where(degen, jnp.where(inside, big, -big), hi)
            # edge collinear with this slab FACE: the segment lies ON ∂B
            onface = degen & (jnp.abs(jnp.abs(s) - half) < 1e-4)
            return lo, hi, onface

        lox, hix, onfx = slab(sx, dx, ba)
        loy, hiy, onfy = slab(sy, dy, bb)
        # clamp into [0,1] BEFORE use: an empty interval must become a
        # zero-length segment of REAL points (q0 == q1 ⇒ cross exactly 0);
        # letting ±big through leaves an FMA residue ~ulp(big²) under jit
        t0 = jnp.clip(jnp.maximum(lox, loy), 0., 1.)
        t1 = jnp.clip(jnp.minimum(hix, hiy), 0., 1.)
        t1 = jnp.maximum(t0, t1)
        q0x = p0x + t0 * dx_w
        q0y = p0y + t0 * dy_w
        q1x = p0x + t1 * dx_w
        q1y = p0y + t1 * dy_w
        # boundary-coincident segments belong to BOTH ∂A∩B and ∂B∩A: weight
        # each side ½ so same-direction pairs (contained/overlapping) count
        # once and opposite-direction pairs (abutting) cancel exactly
        w = jnp.where(onfx | onfy, 0.5, 1.0)
        total = total + w * (q0x * q1y - q1x * q0y)
    return total


def _pairwise_intersection_area_green(boxes_a: jnp.ndarray,
                                      boxes_b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs rotated-rectangle intersection areas via the Green's-theorem
    segment sum (see _green_edge_sum). boxes: [N,5]/[M,5] (cx, cy, dx, dy,
    yaw) -> [N, M] areas. Exact (same math as the clip; independently
    validated against OpenCV in tests/parity/test_rotated_iou_cv2.py)."""
    acx = boxes_a[:, 0][:, None]
    acy = boxes_a[:, 1][:, None]
    aa = boxes_a[:, 2][:, None] * 0.5
    ab = boxes_a[:, 3][:, None] * 0.5
    aux = jnp.cos(boxes_a[:, 4])[:, None]
    auy = jnp.sin(boxes_a[:, 4])[:, None]
    bcx = boxes_b[:, 0][None, :]
    bcy = boxes_b[:, 1][None, :]
    ba = boxes_b[:, 2][None, :] * 0.5
    bb = boxes_b[:, 3][None, :] * 0.5
    bux = jnp.cos(boxes_b[:, 4])[None, :]
    buy = jnp.sin(boxes_b[:, 4])[None, :]

    # circumscribed-circle guard: provably-disjoint pairs are exactly 0
    ra = jnp.sqrt(aa * aa + ab * ab)
    rb = jnp.sqrt(ba * ba + bb * bb)
    dist = jnp.sqrt((acx - bcx) ** 2 + (acy - bcy) ** 2)
    possible = dist <= ra + rb

    area2 = (_green_edge_sum(acx, acy, aux, auy, aa, ab,
                             bcx, bcy, bux, buy, ba, bb) +
             _green_edge_sum(bcx, bcy, bux, buy, ba, bb,
                             acx, acy, aux, auy, aa, ab))
    return jnp.where(possible, jnp.maximum(0.5 * area2, 0.), 0.)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


@jax.jit
def boxes_overlap_bev(boxes_a: jnp.ndarray,
                      boxes_b: jnp.ndarray) -> jnp.ndarray:
    """[N,5|7] x [M,5|7] rotated boxes -> [N,M] BEV intersection areas
    (reference: iou3d_nms `boxes_overlap_bev_gpu`).

    Fused slot-list XLA clip (6.8 ms for 8x1000x1000 on v5e); the pallas
    kernel variant is opt-in via PADDLE3D_TPU_PALLAS_IOU (currently slower).
    """
    ca = boxes_to_corners_bev(boxes_a).astype(jnp.float32)
    cb = boxes_to_corners_bev(boxes_b).astype(jnp.float32)
    n = ca.shape[0]
    import os
    if os.environ.get("PADDLE3D_TPU_PALLAS_IOU") and _on_tpu() \
            and n >= 64 and cb.shape[0] >= 64:
        # opt-in: the scratch/fori pallas kernel currently measures SLOWER
        # than the fused XLA slot formulation (4.6 s vs ~0.1 s for
        # 8x1000^2) — kept for further Mosaic iteration
        from .pallas.iou_clip import pairwise_intersection_area
        return pairwise_intersection_area(ca, cb)
    # slot-list formulation fuses fully — no row blocking needed (no
    # [N, M, k, 2] buffers exist to bound)
    return _pairwise_intersection_area(ca, cb)


@jax.jit
def boxes_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """[N,.] x [M,.] -> [N,M] rotated BEV IoU
    (reference: iou3d_nms `boxes_iou_bev_gpu`)."""
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    if boxes_a.shape[-1] >= 7:
        area_a = boxes_a[:, 3] * boxes_a[:, 4]
        area_b = boxes_b[:, 3] * boxes_b[:, 4]
    else:
        area_a = boxes_a[:, 2] * boxes_a[:, 3]
        area_b = boxes_b[:, 2] * boxes_b[:, 3]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


@jax.jit
def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """[N,7] x [M,7] -> [N,M] 3D IoU; boxes are (x,y,z_center,dx,dy,dz,yaw).

    Matches the reference convention where z is the box center
    (reference: iou3d_nms_api.cpp `boxes_iou3d_gpu` uses
    z ± dz/2 for the vertical extent).
    """
    inter_bev = boxes_overlap_bev(boxes_a, boxes_b)
    a_zmin = boxes_a[:, 2] - boxes_a[:, 5] / 2
    a_zmax = boxes_a[:, 2] + boxes_a[:, 5] / 2
    b_zmin = boxes_b[:, 2] - boxes_b[:, 5] / 2
    b_zmax = boxes_b[:, 2] + boxes_b[:, 5] / 2
    overlap_z = jnp.maximum(
        jnp.minimum(a_zmax[:, None], b_zmax[None, :]) -
        jnp.maximum(a_zmin[:, None], b_zmin[None, :]), 0.)
    inter = inter_bev * overlap_z
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    union = vol_a[:, None] + vol_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


def _fixpoint_alive(sup: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy NMS survivors via fixpoint iteration.

    greedy's defining recurrence
      alive_i = valid_i & not exists j≺i: alive_j & sup[j, i]
    has a unique solution; iterating it in parallel (one [K,K] mask-reduce
    per step) converges in suppression-chain-depth steps (typically < 10)
    instead of K sequential steps. `sup` must already encode the precedence
    relation (only j≺i entries set) and validity.
    """
    k = sup.shape[0]

    def cond(state):
        alive, prev, it = state
        return jnp.any(alive != prev) & (it < k)

    def body(state):
        alive, _, it = state
        suppressed = jnp.any(sup & alive[:, None], axis=0)
        return valid & ~suppressed, alive, it + 1

    alive, _, _ = jax.lax.while_loop(
        cond, body, (valid, ~valid, jnp.asarray(0)))
    return alive & valid


def _compact_keep(keep_mask: jnp.ndarray,
                  post_max_size: int) -> jnp.ndarray:
    """Compact kept indices (array order) into post_max_size -1-padded slots."""
    k = keep_mask.shape[0]
    order_pos = jnp.cumsum(keep_mask.astype(jnp.int32)) - 1
    slots = jnp.where(keep_mask & (order_pos < post_max_size), order_pos,
                      post_max_size)
    keep_idx = jnp.full((post_max_size + 1,), -1, jnp.int32)
    keep_idx = keep_idx.at[slots].set(
        jnp.arange(k, dtype=jnp.int32), mode="drop")[:post_max_size]
    return keep_idx


@functools.partial(jax.jit, static_argnames=("post_max_size",))
def _greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray,
                     iou_threshold: float,
                     post_max_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS given a score-descending-ordered [K,K] IoU matrix.

    Returns (keep_mask [K], keep_idx [post_max_size] padded with -1).
    """
    k = iou.shape[0]
    idx = jnp.arange(k)
    sup = (iou > iou_threshold) & (idx[:, None] < idx[None, :]) & \
        valid[:, None] & valid[None, :]
    keep_mask = _fixpoint_alive(sup, valid)
    return keep_mask, _compact_keep(keep_mask, post_max_size)


def _iou_exceeds(b5a: jnp.ndarray, b5b: jnp.ndarray,
                 iou_threshold: float) -> jnp.ndarray:
    """[N,5] x [M,5] -> bool [N,M]: rotated-BEV IoU > threshold."""
    inter = _pairwise_intersection_area_green(b5a, b5b)
    area_a = b5a[:, 2] * b5a[:, 3]
    area_b = b5b[:, 2] * b5b[:, 3]
    union = jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)
    return inter > iou_threshold * union


def _suppress_blocked(b5: jnp.ndarray, valid: jnp.ndarray,
                      iou_threshold: float, post_max_size: int,
                      block: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with work bounded by the kept-set size, not K².

    Greedy's invariant: a candidate is suppressed only by an earlier KEPT
    box, and the output takes the first post_max_size kept boxes — so each
    score-ordered block of candidates only needs IoU against (a) the kept
    boxes so far (a buffer capped at C ≥ post_max_size rows; once it fills,
    > post_max boxes are already kept and later aliveness is output-
    irrelevant) and (b) its own block. Work: (K/B)·(B·C + B²) pairs instead
    of K² — 3.8× fewer Green's-theorem evaluations at K=1000, C=B=128
    (the [T·B, 1000, 1000] intersection fusion was the single largest op in
    the CenterPoint inference trace at 7.4 ms/iter).

    keep_mask is exact up to the post_max_size'th kept box (all callers
    consume only keep_idx).
    """
    k = b5.shape[0]
    nb = -(-k // block)
    kp = nb * block
    cap = min(kp, -(-post_max_size // block) * block)
    b5p = jnp.pad(b5, ((0, kp - k), (0, 0)))
    validp = jnp.pad(valid, (0, kp - k))
    blocks_b = b5p.reshape(nb, block, 5)
    blocks_v = validp.reshape(nb, block)
    ridx = jnp.arange(block)

    def step(carry, blk):
        kept_boxes, kept_valid, count = carry
        bb, bv = blk
        # (a) suppression by earlier kept boxes
        hit_prev = _iou_exceeds(bb, kept_boxes, iou_threshold)
        sup_prev = jnp.any(hit_prev & kept_valid[None, :], axis=1)
        live_in = bv & ~sup_prev
        # (b) within-block greedy (precedence = row order)
        hit_own = _iou_exceeds(bb, bb, iou_threshold)
        sup = hit_own & (ridx[:, None] < ridx[None, :]) & \
            live_in[:, None] & live_in[None, :]
        alive = _fixpoint_alive(sup, live_in)
        # append alive boxes to the kept buffer (drop past the cap)
        pos = count + jnp.cumsum(alive.astype(jnp.int32)) - 1
        slot = jnp.where(alive, pos, cap)
        kept_boxes = kept_boxes.at[slot].set(bb, mode="drop")
        kept_valid = kept_valid.at[slot].set(alive, mode="drop")
        count = jnp.minimum(count + jnp.sum(alive.astype(jnp.int32)), cap)
        return (kept_boxes, kept_valid, count), alive

    init = (jnp.zeros((cap, 5), b5.dtype), jnp.zeros((cap,), bool),
            jnp.asarray(0, jnp.int32))
    _, alive = jax.lax.scan(step, init, (blocks_b, blocks_v))
    keep_mask = alive.reshape(kp)[:k]
    return keep_mask, _compact_keep(keep_mask, post_max_size)


@functools.partial(jax.jit, static_argnames=("post_max_size",))
def suppress(boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float,
             post_max_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy rotated-BEV NMS over score-descending candidate rows.

    boxes: [K, 5|7] rotated boxes in score-descending order; valid: [K].
    Returns (keep_mask [K], keep_idx [post_max_size], both in score order).

    The pairwise stage uses the Green's-theorem segment-sum intersection
    (~3x fewer vector ops than the slot-list clip). Its only deviation from
    the clip is on exactly-coincident edge LINES (fp-measure-zero for
    decoded boxes), where the inflated area still errs toward suppressing
    true duplicates — safe for thresholded NMS; the value-exact
    boxes_iou_bev keeps the clip.

    Large candidate sets take the kept-buffer blocked path
    (_suppress_blocked); small ones the one-shot K² program.
    """
    k = boxes.shape[0]
    if boxes.shape[-1] >= 7:
        b5 = boxes[:, jnp.array([0, 1, 3, 4, 6])]
    else:
        b5 = boxes
    b5 = b5.astype(jnp.float32)
    if k >= 512 and post_max_size <= 256:
        return _suppress_blocked(b5, valid, iou_threshold, post_max_size)
    inter = _pairwise_intersection_area_green(b5, b5)
    area = b5[:, 2] * b5[:, 3]
    union = jnp.maximum(area[:, None] + area[None, :] - inter, 1e-6)
    idx = jnp.arange(k)
    sup = (inter > iou_threshold * union) & (idx[:, None] < idx[None, :]) & \
        valid[:, None] & valid[None, :]
    keep_mask = _fixpoint_alive(sup, valid)
    return keep_mask, _compact_keep(keep_mask, post_max_size)


@functools.partial(
    jax.jit, static_argnames=("pre_max_size", "post_max_size"))
def nms_bev(boxes: jnp.ndarray,
            scores: jnp.ndarray,
            iou_threshold: float,
            pre_max_size: int = 1024,
            post_max_size: int = 256,
            score_threshold: float = float("-inf")):
    """Rotated-BEV NMS (reference: iou3d_nms `nms_gpu` + the python wrapper
    models/layers/layer_libs.py:210 `rotate_nms_pcdet`).

    Args:
        boxes: [N, 5|7] rotated boxes.
        scores: [N] confidences; invalid/padding rows should carry -inf.
    Returns:
        keep_idx: [post_max_size] indices into the input arrays (-1 padded).
        count: number of kept boxes.
    """
    scores = jnp.where(jnp.isfinite(scores), scores, -jnp.inf)
    scores = jnp.where(scores > score_threshold, scores, -jnp.inf)
    k = min(pre_max_size, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]
    valid = jnp.isfinite(top_scores)
    _, keep_local = suppress(top_boxes, valid, iou_threshold, post_max_size)
    keep_idx = jnp.where(keep_local >= 0, top_idx[keep_local], -1)
    count = jnp.sum((keep_idx >= 0).astype(jnp.int32))
    return keep_idx, count


def rotate_nms_pcdet(boxes: jnp.ndarray, scores: jnp.ndarray,
                     thresh: float, pre_max_size: int = 1024,
                     post_max_size: int = 256):
    """Name-parity wrapper (reference: models/layers/layer_libs.py:210)."""
    return nms_bev(boxes, scores, thresh, pre_max_size, post_max_size)
