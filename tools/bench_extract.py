"""Sub-stage timing for the CenterPoint extract + predict pipelines.

Each sub-stage compiles as its own jitted program on synthetic data with
the real nuScenes shapes. Diagnostic only.
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N = 8, 250000
NUM_CELLS = 512 * 512
VOXEL = (0.2, 0.2, 8.0)
PC_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
MAXP = 20
MAXV = 60000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--which", default="all",
                   help="comma list: sort,decorate,mlp1,winmax,mlp2,scatter,"
                        "topk,iou,fixpoint")
    args = p.parse_args()
    which = set(args.which.split(","))
    if "all" in which:
        which = {"sort", "decorate", "mlp1", "winmax", "mlp2", "scatter",
                 "topk", "iou", "fixpoint"}

    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    rng = np.random.default_rng(0)
    lo = np.array([-51.2, -51.2, -5, 0, 0], np.float32)
    hi = np.array([51.2, 51.2, 3, 1, 0.45], np.float32)
    pts = jax.device_put(
        rng.uniform(lo, hi, size=(B, N, 5)).astype(np.float32)
        .astype(jnp.bfloat16))

    def timeit(name, fn, *xs):
        y = fn(*xs)
        np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:1].astype(jnp.float32))
        for _ in range(3):
            y = fn(*xs)
        np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:1].astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = fn(*xs)
        np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:1].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"  {name:12s} {dt:8.2f} ms/iter", flush=True)
        return y

    from paddle3d_tpu.ops.pillar_ops import pillar_decorate_sorted
    from paddle3d_tpu.ops.voxelize import points_to_voxel_coords

    # --- sort only ----------------------------------------------------------
    @jax.jit
    def sort_only(points):
        def one(pp):
            coords_xyz, valid = points_to_voxel_coords(pp, VOXEL, PC_RANGE)
            key = jnp.where(valid, coords_xyz[:, 1] * 512 + coords_xyz[:, 0],
                            jnp.int32(2**31 - 1))
            cols = [pp[:, i] for i in range(pp.shape[1])]
            return jax.lax.sort([key] + cols, num_keys=1, is_stable=True)[0]
        return jax.vmap(one)(points)

    if "sort" in which:
        timeit("sort", sort_only, pts)

    # --- full decorate (sort + segmented means + features) ------------------
    dec_fn = jax.jit(jax.vmap(functools.partial(
        pillar_decorate_sorted, voxel_size=VOXEL, point_cloud_range=PC_RANGE,
        max_points_in_voxel=MAXP, max_voxels=MAXV)))
    dec = None
    if "decorate" in which:
        dec = timeit("decorate", dec_fn, pts)
    else:
        dec = dec_fn(pts)
        np.asarray(dec["keys"][:1, :1])

    keys = dec["keys"]
    keep = dec["keep"]
    emit = dec["emit"]
    x10 = dec["decorated"]

    w1 = jax.device_put(rng.normal(0, .1, (10, 64)).astype(jnp.bfloat16))
    w2 = jax.device_put(rng.normal(0, .1, (128, 64)).astype(jnp.bfloat16))

    @jax.jit
    def mlp1(x, keep):
        y = jnp.maximum(x @ w1, 0.)
        return y

    y1 = None
    if "mlp1" in which:
        y1 = timeit("mlp1", mlp1, x10, keep)
    else:
        y1 = mlp1(x10, keep)

    from paddle3d_tpu.ops.segmented import (seg_prefix_max_bounded,
                                            seg_window_max_bounded)

    @jax.jit
    def winmax(y, keys, keep):
        masked = jnp.where(keep[..., None], y, jnp.asarray(-1e9, y.dtype))
        return jax.vmap(lambda m, k: seg_window_max_bounded(m, k, MAXP))(
            masked, keys)

    if "winmax" in which:
        sm = timeit("winmax", winmax, y1, keys, keep)
    else:
        sm = winmax(y1, keys, keep)

    @jax.jit
    def mlp2_emit(y, smax, keys, keep, emit):
        x = jnp.concatenate([y, smax], axis=-1)
        z = jnp.maximum(x @ w2, 0.)
        masked = jnp.where(keep[..., None], z, jnp.asarray(-1e9, z.dtype))
        pm = jax.vmap(lambda m, k: seg_prefix_max_bounded(m, k, MAXP))(
            masked, keys)
        return jnp.where(emit[..., None], pm, 0.).astype(z.dtype)

    if "mlp2" in which:
        rows = timeit("mlp2+emit", mlp2_emit, y1, sm, keys, keep, emit)
    else:
        rows = mlp2_emit(y1, sm, keys, keep, emit)

    from paddle3d_tpu.ops.pallas.sorted_scatter import sorted_segment_sum

    @jax.jit
    def scatter(keys, rows):
        return sorted_segment_sum(keys, rows, NUM_CELLS)

    if "scatter" in which:
        timeit("scatter", scatter, keys, rows)

    # --- predict sub-parts --------------------------------------------------
    T = 6
    if "topk" in which:
        hm = jax.device_put(rng.normal(-2, 1, (T * B, 2 * 128 * 128))
                            .astype(jnp.bfloat16))

        @jax.jit
        def topk(h):
            return jax.lax.top_k(h, 1000)

        timeit("topk", topk, hm)

    if "iou" in which or "fixpoint" in which:
        from paddle3d_tpu.ops.iou3d_nms import (
            _fixpoint_alive, _pairwise_intersection_area_green)
        boxes = rng.uniform(-50, 50, (T * B, 1000, 5)).astype(np.float32)
        boxes[..., 2:4] = rng.uniform(0.5, 5, (T * B, 1000, 2))
        boxes = jax.device_put(boxes)

        @jax.jit
        def iou(b):
            return jax.vmap(
                lambda bb: _pairwise_intersection_area_green(bb, bb))(b)

        inter = iou(boxes)
        if "iou" in which:
            timeit("iou-green", iou, boxes)

        @jax.jit
        def fixp(b, inter):
            def one(bb, it):
                area = bb[:, 2] * bb[:, 3]
                union = jnp.maximum(area[:, None] + area[None, :] - it, 1e-6)
                idx = jnp.arange(1000)
                sup = (it > 0.2 * union) & (idx[:, None] < idx[None, :])
                return _fixpoint_alive(sup, jnp.ones((1000,), bool))
            return jax.vmap(one)(b, inter)

        if "fixpoint" in which:
            timeit("fixpoint", fixp, boxes, inter)


if __name__ == "__main__":
    main()
