"""Stage-level timing for CenterPoint/PointPillars inference on the chip.

Times each pipeline stage as its own jitted program: extract (fused pillar
canvas), backbone, neck, head, predict. Diagnostic only — the driver bench
is bench.py. Timing follows bench.py's fetch-sync convention (on the axon
tunnel only host fetches sync; executions are in-order).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH = {
    "pointpillars": (
        "configs/pointpillars/pointpillars_xyres16_kitti_car.yml", 20000,
        ([0, -39.68, -3, 0], [69.12, 39.68, 1, 1])),
    "centerpoint": (
        "configs/centerpoint/centerpoint_pillars_02voxel_nuscenes_10sweep.yml",
        250000,
        ([-51.2, -51.2, -5, 0, 0], [51.2, 51.2, 3, 1, 0.45])),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="centerpoint", choices=sorted(BENCH))
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--trace", default=None,
                   help="dir to dump a jax profiler trace of the full fwd")
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

    rng = np.random.default_rng(0)
    pts = rng.uniform(lo, hi, size=(args.batch, npoints, len(lo)))
    pts = jax.device_put(np.asarray(pts, np.float32).astype(jnp.bfloat16))
    state = jax.device_put(state)

    def stage_extract(state, points):
        m = nnx.merge(graphdef, state)
        from paddle3d_tpu.ops.pillar_ops import fused_pillar_canvas
        return fused_pillar_canvas(m.voxelizer, m.voxel_encoder,
                                   m.middle_encoder, points, False)

    def stage_backbone(state, canvas):
        m = nnx.merge(graphdef, state)
        return tuple(m.backbone(canvas))

    def stage_neck(state, feats):
        m = nnx.merge(graphdef, state)
        return m.neck(list(feats))

    def stage_head(state, x):
        m = nnx.merge(graphdef, state)
        return m.bbox_head(x)

    def stage_predict(state, preds):
        m = nnx.merge(graphdef, state)
        return m.bbox_head.predict(preds, m.test_cfg)

    def full(state, points):
        m = nnx.merge(graphdef, state)
        return m.test_forward({"data": points})

    def fetch(o):
        leaf = jax.tree.leaves(o)[0]
        return np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))

    stages = []
    jits = {}
    x = pts
    chain = [("extract", stage_extract), ("backbone", stage_backbone),
             ("neck", stage_neck), ("head", stage_head),
             ("predict", stage_predict)]
    if args.model == "pointpillars":
        chain = None  # pointpillars test_forward differs; full only

    outs = {}
    if chain:
        for name, fn in chain:
            jf = jax.jit(fn)
            t_compile = time.perf_counter()
            y = jf(state, x)
            fetch(y)
            jits[name] = (jf, x)
            print(f"[compile] {name}: {time.perf_counter() - t_compile:.1f}s",
                  flush=True)
            x = y

        for name, (jf, xin) in jits.items():
            for _ in range(3):
                fetch(jf(state, xin))
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = jf(state, xin)
            fetch(out)
            dt = (time.perf_counter() - t0) / args.iters * 1e3
            stages.append((name, dt))

    jfull = jax.jit(full)
    fetch(jfull(state, pts))
    for _ in range(3):
        fetch(jfull(state, pts))
    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = jfull(state, pts)
    fetch(out)
    dt_full = (time.perf_counter() - t0) / args.iters * 1e3

    print(f"\n== {args.model} batch={args.batch} ==")
    for name, dt in stages:
        print(f"  {name:10s} {dt:8.2f} ms/iter")
    if stages:
        print(f"  {'sum':10s} {sum(d for _, d in stages):8.2f} ms/iter")
    print(f"  {'FULL':10s} {dt_full:8.2f} ms/iter "
          f"-> {args.batch / (dt_full / 1e3):.1f} scans/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                out = jfull(state, pts)
            fetch(out)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
