"""Tiled rotated-box intersection-area kernel.

The XLA slot-list Sutherland–Hodgman clip (ops/iou3d_nms.py) is exact and
scatter-free, but at [1000,1000] scale XLA materializes dozens of NxM
intermediates in HBM (~1 GB of traffic for one NMS matrix). This kernel
runs the SAME no-compaction clip per [TM, TN] tile with every slot held in
VMEM/registers, writing only the final area tile — traffic drops to the
4 MB output (reference CUDA analogue: paddle3d/ops/iou3d_nms/
iou3d_nms_kernel.cu:275 box_overlap per-thread registers).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pairwise_intersection_area_tiled"]

_TM = 128
_TN = 128


def _clip_area_tile(ax, ay, bx, by):
    """Slot-list clip on one tile. ax/ay: 4 × [TM, 1]; bx/by: 4 × [1, TN].
    Mirrors ops/iou3d_nms._pairwise_intersection_area exactly."""
    eps = 1e-7
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

    shape = jnp.broadcast_shapes(ax[0].shape, bx[0].shape)
    ones = jnp.ones(shape, ax[0].dtype)
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


def _kernel(ca_ref, cb_ref, out_ref):
    # ca block [TM, 8] (x0 y0 x1 y1 ...), cb block [TN, 8]
    ax = [ca_ref[:, 2 * j][:, None] for j in range(4)]
    ay = [ca_ref[:, 2 * j + 1][:, None] for j in range(4)]
    bx = [cb_ref[:, 2 * j][None, :] for j in range(4)]
    by = [cb_ref[:, 2 * j + 1][None, :] for j in range(4)]
    out_ref[...] = _clip_area_tile(ax, ay, bx, by)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_intersection_area_tiled(ca: jnp.ndarray, cb: jnp.ndarray,
                                     interpret: bool = False):
    """ca [N, 4, 2], cb [M, 4, 2] (CCW corners) -> [N, M] areas (f32)."""
    n, m = ca.shape[0], cb.shape[0]
    n_pad = -(-n // _TM) * _TM
    m_pad = -(-m // _TN) * _TN
    ca8 = jnp.pad(ca.reshape(n, 8).astype(jnp.float32),
                  ((0, n_pad - n), (0, 0)))
    cb8 = jnp.pad(cb.reshape(m, 8).astype(jnp.float32),
                  ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // _TM, m_pad // _TN),
        in_specs=[
            pl.BlockSpec((_TM, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, _TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(ca8, cb8)
    return out[:n, :m]
