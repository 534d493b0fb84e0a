"""Pallas all-pairs convex-quad intersection-area kernel.

The rotated-IoU hot spot of every NMS call (reference CUDA:
paddle3d/ops/iou3d_nms/iou3d_nms_kernel.cu:275 `boxes_overlap_bev_gpu`).
The XLA formulation in ops/iou3d_nms.py materializes the growing
Sutherland–Hodgman polygon buffers (4→8→16→32→64 slots per pair) in HBM
between clip stages — measured 110 ms for 8×1000×1000 on v5e, ~12× off the
VPU roofline.

This kernel processes one (8, 128) tile of pairs per grid step. The polygon
slots live in explicit VMEM scratch (ping-pong halves of a 128-row buffer)
— a fully-unrolled SSA formulation spills the register allocator into
~129 MB of VMEM (measured), so every stage reads its input slots from
scratch and writes the doubled output slots back, keeping live registers
per step tiny.

Same no-compaction algorithm as the XLA path (outside vertices projected
onto the clip line so their shoelace contribution telescopes) — property
-tested against it in interpret mode.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pairwise_intersection_area_pallas",
           "pairwise_intersection_area"]

_TN = 8     # sublanes: rows of A per tile
_TM = 128   # lanes: rows of B per tile
_EPS = 1e-7


def _clip_area_kernel(ca_ref, cb_ref, area_ref, px_ref, py_ref):
    """ca_ref [1, TN, 8] (4 corners × xy), cb_ref [1, TM, 8] ->
    area [1, TN, TM]; px/py: VMEM scratch [128, TN, TM]."""
    ca = ca_ref[0]
    cb = cb_ref[0]
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
    # initial polygon -> scratch rows 0..3 (ping half = rows 0..63)
    for j in range(4):
        px_ref[j] = ax[j] * ones
        py_ref[j] = ay[j] * ones

    base_in = 0
    for e in range(4):  # 4 clip edges, unrolled (tiny per-edge prologue)
        a_x, a_y = bx[e], by[e]
        dxe = bx[(e + 1) % 4] - a_x
        dye = by[(e + 1) % 4] - a_y
        d2 = jnp.maximum(dxe * dxe + dye * dye, _EPS)
        inv_d2 = 1.0 / d2
        k = 4 * (2 ** e)
        base_out = 64 - base_in  # ping-pong halves

        # fori_loop over slots: one compiled body -> tiny register
        # footprint (a fully-unrolled SSA web spills 65-129 MB, measured)
        def body(i, _, base_in=base_in, base_out=base_out, k=k, a_x=a_x,
                 a_y=a_y, dxe=dxe, dye=dye, inv_d2=inv_d2):
            nxt = jnp.where(i + 1 == k, 0, i + 1)
            sx = px_ref[base_in + i]
            sy = py_ref[base_in + i]
            ex = px_ref[base_in + nxt]
            ey = py_ref[base_in + nxt]
            ds = dxe * (sy - a_y) - dye * (sx - a_x)
            de = dxe * (ey - a_y) - dye * (ex - a_x)
            s_in = ds >= 0
            denom = ds - de
            t = ds / jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
            ix = sx + t * (ex - sx)
            iy = sy + t * (ey - sy)
            crossing = (s_in != (de >= 0)) & (jnp.abs(denom) >= _EPS)
            # orthogonal projection of s onto the clip line
            tp = ((sx - a_x) * dxe + (sy - a_y) * dye) * inv_d2
            pxv = a_x + tp * dxe
            pyv = a_y + tp * dye
            sax = jnp.where(s_in, sx, pxv)
            say = jnp.where(s_in, sy, pyv)
            px_ref[base_out + 2 * i] = sax
            py_ref[base_out + 2 * i] = say
            px_ref[base_out + 2 * i + 1] = jnp.where(crossing, ix, sax)
            py_ref[base_out + 2 * i + 1] = jnp.where(crossing, iy, say)
            return 0

        jax.lax.fori_loop(0, k, body, 0)
        base_in = base_out

    # shoelace over the 64 final slots (streaming accumulate from scratch)
    def shoelace(i, acc):
        nxt = jnp.where(i + 1 == 64, 0, i + 1)
        x0 = px_ref[base_in + i]
        y0 = py_ref[base_in + i]
        x1 = px_ref[base_in + nxt]
        y1 = py_ref[base_in + nxt]
        return acc + (x0 * y1 - x1 * y0)

    acc = jax.lax.fori_loop(0, 64, shoelace, jnp.zeros(shape, ca.dtype))
    area = 0.5 * jnp.abs(acc)
    area_ref[0] = jnp.where(overlap_possible, area, 0.)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_intersection_area_pallas(ca: jnp.ndarray, cb: jnp.ndarray,
                                      interpret: bool = False):
    """ca [(B,) N, 4, 2], cb [(B,) M, 4, 2] (CCW BEV corners, f32) ->
    [(B,) N, M] areas.

    The batch rides as an explicit leading grid dimension (never vmap a
    pallas_call here — use `pairwise_intersection_area` which has a
    custom_vmap rule). Pads N to a multiple of 8 and M to a multiple of
    128; pad rows sit at ±1e8 so the circle guard zeroes every pad pair —
    callers slice the pad off anyway.
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
        scratch_shapes=[
            pltpu.VMEM((128, _TN, _TM), jnp.float32),  # poly x (ping-pong)
            pltpu.VMEM((128, _TN, _TM), jnp.float32),  # poly y
        ],
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
