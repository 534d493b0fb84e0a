"""Stage-wise timing of the benched PointPillars inference program.

Splits the pre->net->post pipeline into separately-jitted programs and times
each with honest fetch-synced timing (on the axon tunnel only a host fetch
syncs; executions are in-order, so enqueue K then fetch once).

    python tools/bench_parts.py --batch 8 --iters 20

Prints one JSON line per stage, flushed immediately (compiles are slow and
serialized on the remote helper — partial output is still useful).
"""
import argparse
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
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--points", type=int, default=20000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from flax import nnx

    from paddle3d_tpu.apis import Config

    cfg = Config(
        path=os.path.join(os.path.dirname(__file__), "..",
                          "configs/pointpillars/"
                          "pointpillars_xyres16_kitti_car.yml"))
    model = cfg.model
    graphdef, state = nnx.split(model)

    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x
    state = jax.tree.map(cast, state)

    rng = np.random.default_rng(0)
    pts = rng.uniform([0, -39.68, -3, 0], [69.12, 39.68, 1, 1],
                      size=(args.batch, args.points, 4)).astype(np.float32)
    pts = jnp.asarray(pts, jnp.bfloat16)

    def fetch_any(out):
        # slice on-device FIRST — fetching a whole leaf (e.g. the 219 MB
        # canvas) through the tunnel would dominate the measurement
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))

    # ---- stage 0: primitives
    def s_argsort(points):
        key = (points[..., 0] * 1000 + points[..., 1]).astype(jnp.int32)
        return jax.vmap(lambda k: jnp.argsort(k, stable=True))(key)

    timed("argsort_20k", jax.jit(s_argsort), (pts,), args.iters, fetch_any)

    # ---- stage 1: voxelize only
    def s_voxelize(state, points):
        m = nnx.merge(graphdef, state)
        return m.voxelizer(points, training=False)

    vox_out = timed("voxelize", jax.jit(s_voxelize), (state, pts),
                    args.iters, fetch_any)
    vox_out = jax.tree.map(jnp.asarray, jax.device_get(vox_out))

    # ---- stage 1b: pillar feature net on fixed voxels
    def s_pfn(state, voxels, num_points, coords, vmask):
        m = nnx.merge(graphdef, state)
        pf = m.pillar_encoder(voxels, num_points, coords)
        return pf * vmask[..., None].astype(pf.dtype)

    voxels_o, coords_o, npts_o, vmask_o = vox_out
    pf_out = timed("pfn_only", jax.jit(s_pfn),
                   (state, voxels_o, npts_o, coords_o, vmask_o),
                   args.iters, fetch_any)
    pf_out = jnp.asarray(jax.device_get(pf_out))

    # ---- stage 1c: scatter to canvas on fixed pillar feats
    def s_scatter(state, pf, coords, vmask):
        m = nnx.merge(graphdef, state)
        return m.middle_encoder(pf, coords, vmask)

    timed("scatter_only", jax.jit(s_scatter),
          (state, pf_out, vox_out[1], vox_out[3]), args.iters, fetch_any)

    # ---- stage 2: pillar encoder + scatter to canvas
    def s_encode(state, points):
        m = nnx.merge(graphdef, state)
        voxels, coords, num_points, vmask = m.voxelizer(
            points, training=False)
        pf = m.pillar_encoder(voxels, num_points, coords)
        pf = pf * vmask[..., None].astype(pf.dtype)
        return m.middle_encoder(pf, coords, vmask)

    canvas = timed("voxelize+pfn+scatter", jax.jit(s_encode), (state, pts),
                   args.iters, fetch_any)
    canvas = jax.device_get(canvas)
    canvas = jnp.asarray(canvas)
    print(json.dumps({"canvas_shape": list(canvas.shape),
                      "dtype": str(canvas.dtype)}), flush=True)

    # ---- stage 3: backbone + neck + head convs on a fixed canvas
    def s_convs(state, canvas):
        m = nnx.merge(graphdef, state)
        feats = m.neck(m.backbone(canvas))
        return m.head(feats)

    preds = timed("backbone+neck+head", jax.jit(s_convs), (state, canvas),
                  args.iters, fetch_any)
    preds = jax.device_get(preds)
    preds = {k: jnp.asarray(v) for k, v in preds.items()}

    # ---- stage 4: post-process (decode + topk + NMS)
    amask = np.ones(preds["cls_preds"].shape[:2], bool)

    def s_post(state, preds, amask):
        m = nnx.merge(graphdef, state)
        return m.head.post_process(preds, m._anchors, amask)

    timed("post_process", jax.jit(s_post), (state, preds, amask),
          args.iters, fetch_any)

    # ---- stage 4a: topk+gather only
    def s_topk(preds):
        scores = jnp.max(jax.nn.sigmoid(preds["cls_preds"]), axis=-1)

        def single(s, bp):
            top_scores, top_idx = jax.lax.top_k(s[:, 0], 1000)
            return top_scores, bp[top_idx]
        return jax.vmap(single)(scores[..., None], preds["box_preds"])

    timed("topk+gather_1000", jax.jit(s_topk), (preds,), args.iters,
          fetch_any)

    # ---- stage 4b: pairwise IoU 1000x1000 only
    boxes1k = jnp.asarray(
        rng.uniform([0, -40, -2, 1, 1, 1, -3], [69, 40, 1, 4, 4, 3, 3],
                    (args.batch, 1000, 7)).astype(np.float32))

    from paddle3d_tpu.ops.iou3d_nms import _greedy_suppress, boxes_iou_bev

    def s_iou(b):
        return jax.vmap(boxes_iou_bev)(b, b)

    iou_out = timed("iou_1000x1000", jax.jit(s_iou), (boxes1k,), args.iters,
                    fetch_any)
    iou_out = jnp.asarray(jax.device_get(iou_out))

    # ---- stage 4c: greedy suppression only on a fixed IoU matrix
    def s_sup(iou):
        valid = jnp.ones(iou.shape[:2], bool)
        return jax.vmap(
            lambda m, v: _greedy_suppress(m, v, 0.5, 300))(iou, valid)

    timed("greedy_suppress_1000", jax.jit(s_sup), (iou_out,), args.iters,
          fetch_any)

    # ---- stage 4d: green-formulation pairwise stage (the suppress() path)
    from paddle3d_tpu.ops.iou3d_nms import _pairwise_intersection_area_green

    def s_green(b):
        b5 = b[..., jnp.array([0, 1, 3, 4, 6])]
        return jax.vmap(_pairwise_intersection_area_green)(b5, b5)

    timed("green_iou_1000x1000", jax.jit(s_green), (boxes1k,), args.iters,
          fetch_any)

    # ---- fused pillar pipeline internals (the path bench.py actually runs)
    import functools as _ft

    from paddle3d_tpu.ops.pallas.sorted_scatter import sorted_segment_sum
    from paddle3d_tpu.ops.pillar_ops import (pillar_decorate_sorted,
                                             pillar_emit_rows)

    vz = model.voxelizer
    pfn = model.pillar_encoder
    me = model.middle_encoder

    def s_decorate(points):
        return jax.vmap(_ft.partial(
            pillar_decorate_sorted, voxel_size=tuple(vz.voxel_size),
            point_cloud_range=tuple(vz.point_cloud_range),
            max_points_in_voxel=pfn.max_num_points_in_voxel,
            max_voxels=vz.max_num_voxels_for(False),
            with_distance=pfn.with_distance))(points)

    dec = timed("fused_decorate_sort", jax.jit(s_decorate), (pts,),
                args.iters, fetch_any)
    dec = jax.tree.map(jnp.asarray, jax.device_get(dec))

    def s_mlp_emit(state, dec):
        m = nnx.merge(graphdef, state)
        x = m.pillar_encoder.pfn_layers[0].mlp(dec["decorated"])
        mp = m.pillar_encoder.max_num_points_in_voxel
        return jax.vmap(
            lambda f, k, kp, e: pillar_emit_rows(f, k, kp, e, mp))(
            x, dec["keys"], dec["keep"], dec["emit"])

    rows = timed("fused_mlp_emit", jax.jit(s_mlp_emit), (state, dec),
                 args.iters, fetch_any)
    rows = jnp.asarray(jax.device_get(rows))

    def s_sscatter(keys, rows):
        return sorted_segment_sum(keys, rows, me.ny * me.nx)

    timed("fused_sorted_scatter", jax.jit(s_sscatter),
          (dec["keys"], rows), args.iters, fetch_any)

    # ---- stage 5: full test_forward (= bench.py program)
    def s_full(state, points):
        m = nnx.merge(graphdef, state)
        return m.test_forward({"data": points})

    timed("full_test_forward", jax.jit(s_full), (state, pts), args.iters,
          fetch_any)


if __name__ == "__main__":
    main()
