"""Measure optimization variants on the real TPU before adopting them.

    python tools/bench_variants.py --iters 20

Variants:
  1. Pallas IoU clip kernel vs the XLA formulation (8x1000x1000).
  2. Voxelize with multi-operand lax.sort (payload carried by the sort, no
     post-sort gathers) vs current argsort+gather.
  3. Canvas via searchsorted-gather vs scatter.
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(name, fn, args, iters, fetch):
    t0 = time.perf_counter()
    out = fn(*args)
    fetch(out)
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        fetch(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"stage": name, "ms": round(1e3 * dt, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    rng = np.random.default_rng(0)

    def fetch_any(out):
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))

    # ---------------- 1. pallas IoU clip vs XLA
    from paddle3d_tpu.ops.box_ops import boxes_to_corners_bev
    from paddle3d_tpu.ops.iou3d_nms import _pairwise_intersection_area
    from paddle3d_tpu.ops.pallas.iou_clip import \
        pairwise_intersection_area_pallas

    boxes = rng.uniform([0, -40, -2, 1, 1, 1, -3],
                        [69, 40, 1, 4, 4, 3, 3],
                        (8, 1000, 7)).astype(np.float32)
    corners = np.asarray(
        jax.vmap(boxes_to_corners_bev)(jnp.asarray(boxes)),
        np.float32)
    cj = jnp.asarray(corners)

    def s_pallas(c):
        return pairwise_intersection_area_pallas(c, c)

    out_p = timed("iou_pallas_8x1000", jax.jit(s_pallas), (cj,),
                  args.iters, fetch_any)

    # numerical sanity vs XLA on one sample's 64x64 slice
    ref = np.asarray(_pairwise_intersection_area(cj[0, :64], cj[0, :64]))
    got = np.asarray(jax.device_get(out_p))[0, :64, :64]
    err = np.abs(ref - got).max()
    print(json.dumps({"check": "pallas_vs_xla_max_abs_err",
                      "err": float(err)}), flush=True)

    # ---------------- 2. voxelize variants
    from paddle3d_tpu.ops.voxelize import hard_voxelize

    pts = rng.uniform([0, -39.68, -3, 0], [69.12, 39.68, 1, 1],
                      size=(8, 20000, 4)).astype(np.float32)
    ptsj = jnp.asarray(pts)
    VS = (0.16, 0.16, 4.0)
    PCR = (0., -39.68, -3., 69.12, 39.68, 1.)
    MAXP, MAXV = 32, 40000

    def s_vox_cur(x):
        return jax.vmap(lambda p: hard_voxelize(p, VS, PCR, MAXP, MAXV))(x)

    timed("voxelize_current", jax.jit(s_vox_cur), (ptsj,), args.iters,
          fetch_any)

    def vox_v2(points):
        """Multi-operand sort carries payload; voxel buffer still scatter."""
        n, c = points.shape
        pc = jnp.asarray(PCR, points.dtype)
        vs = jnp.asarray(VS, points.dtype)
        grid = jnp.round((pc[3:6] - pc[0:3]) / vs).astype(jnp.int32)
        gx, gy = grid[0], grid[1]
        xyz = points[:, :3]
        coords = jnp.floor((xyz - pc[0:3]) / vs).astype(jnp.int32)
        valid = jnp.all((coords >= 0) & (coords < grid), axis=-1) & \
            jnp.all(jnp.isfinite(xyz), axis=-1)
        key = coords[:, 2] * gy * gx + coords[:, 1] * gx + coords[:, 0]
        sentinel = gx * gy * grid[2] + 1
        key = jnp.where(valid, key, sentinel)
        ops = [key] + [points[:, i] for i in range(c)] + \
            [coords[:, i] for i in range(3)] + \
            [valid.astype(jnp.int32)]
        sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
        skey = sorted_ops[0]
        spts = jnp.stack(sorted_ops[1:1 + c], axis=-1)
        scoords = jnp.stack(sorted_ops[1 + c:4 + c], axis=-1)
        svalid = sorted_ops[-1].astype(bool)

        head = jnp.concatenate(
            [jnp.ones((1,), bool), skey[1:] != skey[:-1]]) & svalid
        voxel_id = jnp.cumsum(head.astype(jnp.int32)) - 1
        pos = jnp.arange(n, dtype=jnp.int32)
        seg_start = jnp.maximum.accumulate(jnp.where(head, pos, -1))
        rank = pos - seg_start
        keep = svalid & (voxel_id < MAXV) & (rank < MAXP)
        flat_idx = jnp.where(keep, voxel_id * MAXP + rank, MAXV * MAXP)
        voxels = jnp.zeros((MAXV * MAXP + 1, c), points.dtype)
        voxels = voxels.at[flat_idx].set(spts, mode="drop")
        voxels = voxels[:-1].reshape(MAXV, MAXP, c)
        szyx = scoords[:, ::-1]
        head_slot = jnp.where(head & (voxel_id < MAXV), voxel_id, MAXV)
        out_coords = jnp.full((MAXV + 1, 3), -1, jnp.int32)
        out_coords = out_coords.at[head_slot].set(szyx, mode="drop")[:-1]
        num_points = jnp.zeros((MAXV + 1,), jnp.int32).at[
            jnp.where(keep, voxel_id, MAXV)].add(1, mode="drop")[:-1]
        nvox = jnp.sum(head.astype(jnp.int32))
        mask = jnp.arange(MAXV) < jnp.minimum(nvox, MAXV)
        return voxels, out_coords, num_points, mask

    timed("voxelize_v2_laxsort", jax.jit(jax.vmap(vox_v2)), (ptsj,),
          args.iters, fetch_any)

    # ---------------- 3. canvas variants
    NY, NX, C = 496, 432, 64
    V = 40000
    feats = jnp.asarray(
        rng.normal(0, 1, (8, V, C)).astype(np.float32), jnp.bfloat16)
    # sorted linear cells, like the voxelizer emits
    lin_all = np.sort(rng.choice(NY * NX, (8, V), replace=True), axis=1)
    nvalid = 17000
    mask = np.zeros((8, V), bool)
    mask[:, :nvalid] = True
    coords = np.zeros((8, V, 3), np.int32)
    coords[..., 1] = lin_all // NX
    coords[..., 2] = lin_all % NX
    coordsj = jnp.asarray(coords)
    maskj = jnp.asarray(mask)

    from paddle3d_tpu.ops import pillar_scatter

    timed("canvas_scatter_current", jax.jit(
        lambda f, co, m: pillar_scatter(f, co, m, NY, NX)),
        (feats, coordsj, maskj), args.iters, fetch_any)

    def canvas_gather(feat, coord, m):
        lin = coord[:, 1] * NX + coord[:, 2]
        lin = jnp.where(m, lin, NY * NX + 1)
        cells = jnp.arange(NY * NX, dtype=jnp.int32)
        pos = jnp.searchsorted(lin, cells)
        pos = jnp.clip(pos, 0, V - 1)
        hit = lin[pos] == cells
        out = jnp.where(hit[:, None], feat[pos], 0)
        return out.reshape(NY, NX, C)

    timed("canvas_searchsorted_gather", jax.jit(jax.vmap(canvas_gather)),
          (feats, coordsj, maskj), args.iters, fetch_any)

    # ---------------- 4. full nms_bev with the pallas path
    from paddle3d_tpu.ops.iou3d_nms import nms_bev

    scores = jnp.asarray(
        rng.uniform(0, 1, (8, 107136)).astype(np.float32))
    big_boxes = jnp.asarray(rng.uniform(
        [0, -40, -2, 1, 1, 1, -3], [69, 40, 1, 4, 4, 3, 3],
        (8, 107136, 7)).astype(np.float32))

    def s_nms(b, s):
        return jax.vmap(lambda bb, ss: nms_bev(
            bb, ss, 0.5, pre_max_size=1000, post_max_size=300))(b, s)

    timed("nms_bev_full_pallas", jax.jit(s_nms), (big_boxes, scores),
          args.iters, fetch_any)





def slots_intersection(ca, cb):
    """Slot-list XLA formulation: no roll/stack/reshape between clip stages
    — every slot is its own [N, M] array so XLA fuses the whole chain."""
    import jax.numpy as jnp
    eps = 1e-7
    ax = [ca[:, j, 0][:, None] for j in range(4)]
    ay = [ca[:, j, 1][:, None] for j in range(4)]
    bx = [cb[:, j, 0][None, :] for j in range(4)]
    by = [cb[:, j, 1][None, :] for j in range(4)]

    cax = sum(ax) * 0.25; cay = sum(ay) * 0.25
    cbx = sum(bx) * 0.25; cby = sum(by) * 0.25
    ra = jnp.zeros_like(cax); rb = jnp.zeros_like(cbx)
    for j in range(4):
        ra = jnp.maximum(ra, jnp.sqrt((ax[j]-cax)**2 + (ay[j]-cay)**2))
        rb = jnp.maximum(rb, jnp.sqrt((bx[j]-cbx)**2 + (by[j]-cby)**2))
    dist = jnp.sqrt((cax-cbx)**2 + (cay-cby)**2)
    possible = dist <= ra + rb

    shape = (ca.shape[0], cb.shape[0])
    ones = jnp.ones(shape, ca.dtype)
    poly = [(ax[j] * ones, ay[j] * ones) for j in range(4)]
    for e in range(4):
        a_x, a_y = bx[e], by[e]
        dxe = bx[(e+1) % 4] - a_x
        dye = by[(e+1) % 4] - a_y
        inv_d2 = 1.0 / jnp.maximum(dxe*dxe + dye*dye, eps)
        k = len(poly)
        sides = [dxe*(py-a_y) - dye*(px-a_x) for px, py in poly]
        newp = []
        for i in range(k):
            sx, sy = poly[i]; ex, ey = poly[(i+1) % k]
            ds, de = sides[i], sides[(i+1) % k]
            s_in = ds >= 0
            denom = ds - de
            t = ds / jnp.where(jnp.abs(denom) < eps, 1.0, denom)
            ixv = sx + t*(ex-sx); iyv = sy + t*(ey-sy)
            crossing = (s_in != (de >= 0)) & (jnp.abs(denom) >= eps)
            tp = ((sx-a_x)*dxe + (sy-a_y)*dye) * inv_d2
            pxv = a_x + tp*dxe; pyv = a_y + tp*dye
            sax = jnp.where(s_in, sx, pxv); say = jnp.where(s_in, sy, pyv)
            newp.append((sax, say))
            newp.append((jnp.where(crossing, ixv, sax),
                         jnp.where(crossing, iyv, say)))
        poly = newp
    acc = 0.
    k = len(poly)
    for i in range(k):
        x0, y0 = poly[i]; x1, y1 = poly[(i+1) % k]
        acc = acc + (x0*y1 - x1*y0)
    return jnp.where(possible, 0.5 * jnp.abs(acc), 0.)


def main2():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)

    def fetch_any(out):
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))

    from paddle3d_tpu.ops.box_ops import boxes_to_corners_bev
    boxes = rng.uniform([0, -40, -2, 1, 1, 1, -3], [69, 40, 1, 4, 4, 3, 3],
                        (8, 1000, 7)).astype(np.float32)
    cj = jnp.asarray(np.asarray(
        jax.vmap(boxes_to_corners_bev)(jnp.asarray(boxes)), np.float32))

    # lax.map over batch bounds peak memory; each sample one giant fusion
    def s_slots(c):
        return jax.lax.map(lambda x: slots_intersection(x, x), c)

    out = timed("iou_slots_xla_8x1000", jax.jit(s_slots), (cj,), 20,
                fetch_any)
    from paddle3d_tpu.ops.iou3d_nms import _pairwise_intersection_area
    ref = np.asarray(_pairwise_intersection_area(cj[0, :64], cj[0, :64]))
    got = np.asarray(jax.device_get(out))[0, :64, :64]
    print(json.dumps({"check": "slots_vs_xla_err",
                      "err": float(np.abs(ref - got).max())}), flush=True)

    # vmapped variant (no lax.map)
    def s_slots_vmap(c):
        return jax.vmap(lambda x: slots_intersection(x, x))(c)
    timed("iou_slots_xla_vmap", jax.jit(s_slots_vmap), (cj,), 20, fetch_any)


if __name__ == "__main__":
    import sys as _sys
    if "--slots" in _sys.argv:
        main2()
    else:
        main()
