"""Stage-level timing for the two-stage family (PV-RCNN / Voxel-RCNN) and
IA-SSD on the chip.

Splits test_forward into separately-jitted parts and times each with
fetch-synced timing (axon tunnel: only host fetches sync; executions are
in-order). Diagnostic only — the driver bench is bench.py.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH = {
    "voxel_rcnn": ("configs/voxel_rcnn/voxel_rcnn_005voxel_kitti_car.yml",
                   20000, ([0, -40.0, -3, 0], [70.4, 40.0, 1, 1])),
    "pv_rcnn": ("configs/pv_rcnn/pv_rcnn_005voxel_kitti.yml",
                20000, ([0, -40.0, -3, 0], [70.4, 40.0, 1, 1])),
    "iassd": ("configs/iassd/iassd_kitti.yml",
              16384, ([0, -39.68, -4, 0], [69.12, 39.68, 2, 1])),
    "centerpoint_voxels": (
        "configs/centerpoint/centerpoint_voxels_0075voxel_nuscenes_10sweep.yml",
        250000, ([-54.0, -54.0, -5, 0, 0], [54.0, 54.0, 3, 1, 0.45])),
}


def timed(name, fn, args, iters, fetch):
    t0 = time.perf_counter()
    out = fn(*args)
    fetch(out)
    compile_s = time.perf_counter() - t0
    for _ in range(2):
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
    p.add_argument("--model", default="voxel_rcnn", choices=sorted(BENCH))
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    config_path, npoints, (lo, hi) = BENCH[args.model]

    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from flax import nnx

    from paddle3d_tpu.apis import Config

    cfg = Config(path=config_path)
    model = cfg.model
    model.eval()
    graphdef, state = nnx.split(model)
    state = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, state)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_scans
    rng = np.random.default_rng(0)
    pts = jax.device_put(
        make_scans(rng, args.batch, npoints, lo, hi, "clustered"))
    state = jax.device_put(state)

    def fetch(o):
        leaf = jax.tree.leaves(o)[0]
        return np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))

    def merged(state):
        return nnx.merge(graphdef, state)

    if args.model in ("voxel_rcnn", "pv_rcnn"):
        @jax.jit
        def s_voxelize(state, points):
            m = merged(state)
            return m.voxelizer(points, training=False)

        @jax.jit
        def s_encode(state, points):
            m = merged(state)
            voxels, coords, num_points, vmask = m.voxelizer(
                points, training=False)
            feats = m.voxel_encoder(voxels, num_points, coords)
            feats = feats * vmask[..., None].astype(feats.dtype)
            return feats, coords, vmask

        @jax.jit
        def s_middle(state, feats, coords, vmask):
            m = merged(state)
            return m.middle_encoder(feats, coords, vmask, return_stages=True)

        @jax.jit
        def s_rpn(state, bev):
            m = merged(state)
            dense = m.neck(m.backbone(bev))
            preds = m.rpn_head(dense)
            return m.rpn_head.proposals(preds)

        @jax.jit
        def s_full(state, points):
            m = merged(state)
            return m.test_forward({"data": points})

        enc = timed("voxelize+encode", s_encode, (state, pts), args.iters,
                    fetch)
        mid = timed("middle(sparse convs)", s_middle, (state,) + tuple(enc),
                    args.iters, fetch)
        bev, stages = mid
        rois_out = timed("backbone+neck+rpn+proposals", s_rpn, (state, bev),
                         args.iters, fetch)
        rois, roi_scores, roi_labels = rois_out

        if args.model == "pv_rcnn":
            @jax.jit
            def s_vsa(state, points, bev, feats, coords, vmask):
                m = merged(state)
                _, stages = m.middle_encoder(feats, coords, vmask,
                                             return_stages=True)
                sup, _ = m._support_set(points, bev, (feats, coords, vmask,
                                                      stages))
                return sup
            sup = timed("vsa(fps+ballq)", s_vsa,
                        (state, pts, bev) + tuple(enc), args.iters, fetch)

            @jax.jit
            def s_roi(state, rois, points, bev, feats, coords, vmask):
                m = merged(state)
                _, stages = m.middle_encoder(feats, coords, vmask,
                                             return_stages=True)
                sup, _ = m._support_set(points, bev, (feats, coords, vmask,
                                                      stages))
                return m.roi_head(rois, sup)
            # timed as (vsa+roi) - vsa below; direct sup arg would retrace
        else:
            @jax.jit
            def s_roi_direct(state, rois, feats, coords, vmask):
                m = merged(state)
                _, stages = m.middle_encoder(feats, coords, vmask,
                                             return_stages=True)
                sup, _ = m._support_set(None, None, (feats, coords, vmask,
                                                     stages))
                return m.roi_head(rois, sup)
            timed("middle+support+roi_pool", s_roi_direct,
                  (state, rois) + tuple(enc), args.iters, fetch)

        timed("FULL", s_full, (state, pts), args.iters, fetch)

    elif args.model == "iassd":
        @jax.jit
        def s_full(state, points):
            m = merged(state)
            return m.test_forward({"data": points})
        timed("FULL", s_full, (state, pts), args.iters, fetch)

    else:  # centerpoint_voxels
        @jax.jit
        def s_extract(state, points):
            m = merged(state)
            return m.extract_feat_bev(points) if hasattr(
                m, "extract_feat_bev") else m.test_forward({"data": points})

        @jax.jit
        def s_full(state, points):
            m = merged(state)
            return m.test_forward({"data": points})
        timed("FULL", s_full, (state, pts), args.iters, fetch)


if __name__ == "__main__":
    main()
