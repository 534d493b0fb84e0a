"""Pallas all-pairs convex-quad intersection-area kernel.

The rotated-IoU hot spot of every NMS call (reference CUDA:
paddle3d/ops/iou3d_nms/iou3d_nms_kernel.cu:275 `boxes_overlap_bev_gpu`).
The XLA formulation in ops/iou3d_nms.py materializes the growing
Sutherland–Hodgman polygon buffers (4→8→16→32→64 slots per pair) in HBM
between clip stages — measured 110 ms for 8×1000×1000 on v5e, ~12× off the
VPU roofline. This kernel keeps the whole clip pipeline in VMEM/registers:
one (8, 128) tile of pairs at a time, polygon slots unrolled as python-level
lists of [8, 128] vectors, one HBM write of the final area tile.

Same no-compaction algorithm (outside vertices projected onto the clip line
so their shoelace contribution telescopes) — numerically identical to the
XLA path, property-tested against it in interpret mode.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pairwise_intersection_area_pallas"]

_TN = 8     # sublanes: rows of A per tile
_TM = 128   # lanes: rows of B per tile
_EPS = 1e-7


def _clip_area_kernel(ca_ref, cb_ref, area_ref):
    """ca_ref [(1,) TN, 8] (4 corners × xy), cb_ref [(1,) TM, 8] ->
    area [(1,) TN, TM]."""
    ca = ca_ref[...]
    cb = cb_ref[...]
    if ca.ndim == 3:
        ca, cb = ca[0], cb[0]
    ax = [ca[:, 2 * j][:, None] for j in range(4)]   # [TN, 1]
    ay = [ca[:, 2 * j + 1][:, None] for j in range(4)]
    bx = [cb[:, 2 * j][None, :] for j in range(4)]   # [1, TM]
    by = [cb[:, 2 * j + 1][None, :] for j in range(4)]

    # circumscribed-circle early-out mask (also zeroes f32 residue on
    # provably-disjoint pairs)
    cax = (ax[0] + ax[1] + ax[2] + ax[3]) * 0.25
    cay = (ay[0] + ay[1] + ay[2] + ay[3]) * 0.25
    cbx = (bx[0] + bx[1] + bx[2] + bx[3]) * 0.25
    cby = (by[0] + by[1] + by[2] + by[3]) * 0.25
    ra = jnp.zeros_like(cax)
    rb = jnp.zeros_like(cbx)
    for j in range(4):
        ra = jnp.maximum(ra, jnp.sqrt((ax[j] - cax) ** 2 +
                                      (ay[j] - cay) ** 2))
        rb = jnp.maximum(rb, jnp.sqrt((bx[j] - cbx) ** 2 +
                                      (by[j] - cby) ** 2))
    dist = jnp.sqrt((cax - cbx) ** 2 + (cay - cby) ** 2)
    overlap_possible = dist <= ra + rb  # [TN, TM]

    shape = (ca.shape[0], cb.shape[0])
    ones = jnp.ones(shape, ca.dtype)
    # initial polygon: A's corners broadcast per pair
    poly = [(ax[j] * ones, ay[j] * ones) for j in range(4)]

    for e in range(4):
        a_x, a_y = bx[e], by[e]
        dxe = bx[(e + 1) % 4] - a_x
        dye = by[(e + 1) % 4] - a_y
        d2 = jnp.maximum(dxe * dxe + dye * dye, _EPS)
        inv_d2 = 1.0 / d2
        k = len(poly)
        new_poly = []
        # sidedness of every current vertex wrt the clip line
        sides = [dxe * (py - a_y) - dye * (px - a_x) for px, py in poly]
        for i in range(k):
            sx, sy = poly[i]
            ex, ey = poly[(i + 1) % k]
            ds = sides[i]
            de = sides[(i + 1) % k]
            s_in = ds >= 0
            denom = ds - de
            t = ds / jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
            ix = sx + t * (ex - sx)
            iy = sy + t * (ey - sy)
            crossing = (s_in != (de >= 0)) & (jnp.abs(denom) >= _EPS)
            # orthogonal projection of s onto the clip line
            tp = ((sx - a_x) * dxe + (sy - a_y) * dye) * inv_d2
            px = a_x + tp * dxe
            py = a_y + tp * dye
            slot_ax = jnp.where(s_in, sx, px)
            slot_ay = jnp.where(s_in, sy, py)
            slot_bx = jnp.where(crossing, ix, slot_ax)
            slot_by = jnp.where(crossing, iy, slot_ay)
            new_poly.append((slot_ax, slot_ay))
            new_poly.append((slot_bx, slot_by))
        poly = new_poly

    k = len(poly)
    acc = jnp.zeros(shape, ca_ref.dtype)
    for i in range(k):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % k]
        acc = acc + (x0 * y1 - x1 * y0)
    area = 0.5 * jnp.abs(acc)
    out = jnp.where(overlap_possible, area, 0.)
    area_ref[...] = out[None] if area_ref.ndim == 3 else out




@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_intersection_area_pallas(ca: jnp.ndarray, cb: jnp.ndarray,
                                      interpret: bool = False):
    """ca [(B,) N, 4, 2], cb [(B,) M, 4, 2] (CCW BEV corners, f32) ->
    [(B,) N, M] areas.

    The batch rides as an explicit leading grid dimension (never vmap a
    pallas_call here — the batching rule blows the VMEM budget). Pads N to
    a multiple of 8 and M to a multiple of 128; pad rows sit at ±1e8 so the
    circle guard zeroes every pad pair — callers slice the pad off anyway.
    """
    batched = ca.ndim == 4
    if not batched:
        ca, cb = ca[None], cb[None]
    b, n = ca.shape[0], ca.shape[1]
    m = cb.shape[1]
    ca = ca.reshape(b, n, 8).astype(jnp.float32)
    cb = cb.reshape(b, m, 8).astype(jnp.float32)
    pn = (-n) % _TN
    pm = (-m) % _TM
    if pn:
        ca = jnp.pad(ca, ((0, 0), (0, pn), (0, 0)), constant_values=1e8)
    if pm:
        cb = jnp.pad(cb, ((0, 0), (0, pm), (0, 0)), constant_values=-1e8)
    np_, mp_ = ca.shape[1], cb.shape[1]

    out = pl.pallas_call(
        _clip_area_kernel,
        out_shape=jax.ShapeDtypeStruct((b, np_, mp_), jnp.float32),
        grid=(b, np_ // _TN, mp_ // _TM),
        in_specs=[
            pl.BlockSpec((1, _TN, 8), lambda bb, i, j: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TM, 8), lambda bb, i, j: (bb, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TN, _TM), lambda bb, i, j: (bb, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ca, cb)
    out = out[:, :n, :m]
    return out if batched else out[0]


# vmap-safe wrapper: jax's default pallas batching rule blows the VMEM
# budget; route vmap to the explicit batched-grid call instead.
@jax.custom_batching.custom_vmap
def pairwise_intersection_area(ca: jnp.ndarray, cb: jnp.ndarray):
    """[N,4,2] x [M,4,2] -> [N,M]; safe under jax.vmap."""
    return pairwise_intersection_area_pallas(ca, cb)


@pairwise_intersection_area.def_vmap
def _pairwise_vmap_rule(axis_size, in_batched, ca, cb):
    ca_b, cb_b = in_batched
    if not ca_b:
        ca = jnp.broadcast_to(ca[None], (axis_size,) + ca.shape)
    if not cb_b:
        cb = jnp.broadcast_to(cb[None], (axis_size,) + cb.shape)
    return pairwise_intersection_area_pallas(ca, cb), True
