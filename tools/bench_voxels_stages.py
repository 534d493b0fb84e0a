"""Stage-level timing for CenterPoint-voxels inference on the chip.

Times each pipeline stage as its own jitted program: voxelize (buffer
path), voxel encode (VoxelMean), middle (SparseResNet3D incl. coord
management + dense BEV), backbone+neck, head, predict. Diagnostic only —
the driver bench is bench.py. Timing follows bench.py's fetch-sync
convention (on the axon tunnel only host fetches sync; executions are
in-order).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG = "configs/centerpoint/centerpoint_voxels_0075voxel_nuscenes_10sweep.yml"
LO = [-54.0, -54.0, -5.0, 0, 0]
HI = [54.0, 54.0, 3.0, 1, 0.45]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--points", type=int, default=250000)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--stages", default="all",
                   help="comma list: voxelize,encode,middle,backbone,head,"
                        "predict,full")
    args = p.parse_args()
    which = set(args.stages.split(","))
    if "all" in which:
        which = {"voxelize", "encode", "middle", "backbone", "head",
                 "predict", "full"}

    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from flax import nnx

    from paddle3d_tpu.apis import Config

    cfg = Config(path=CONFIG)
    model = cfg.model
    model.eval()
    graphdef, state = nnx.split(model)
    state = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, state)

    rng = np.random.default_rng(0)
    # uniform scan (bench.py uses clustered; uniform is fine for stage cost)

    pts = rng.uniform(LO, HI, size=(args.batch, args.points, len(LO)))
    pts = jax.device_put(np.asarray(pts, np.float32).astype(jnp.bfloat16))
    state = jax.device_put(state)

    def timed(name, fn, *xs):
        out = fn(state, *xs)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = fn(state, *xs)
        leaf = jax.tree.leaves(o)[0]
        np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:12s} {dt:9.2f} ms")
        return out

    @jax.jit
    def s_voxelize(state, pts):
        m = nnx.merge(graphdef, state)
        return m.voxelizer(pts, training=False)

    @jax.jit
    def s_encode(state, vox):
        m = nnx.merge(graphdef, state)
        voxels, coords, num_points, vmask = vox
        feats = m.voxel_encoder(voxels, num_points, coords)
        return feats * vmask[..., None].astype(feats.dtype), coords, vmask

    @jax.jit
    def s_middle(state, enc):
        m = nnx.merge(graphdef, state)
        feats, coords, vmask = enc
        return m.middle_encoder(feats, coords, vmask)

    @jax.jit
    def s_backbone(state, canvas):
        m = nnx.merge(graphdef, state)
        return m.neck(m.backbone(canvas))

    @jax.jit
    def s_head(state, x):
        m = nnx.merge(graphdef, state)
        return m.bbox_head(x)

    @jax.jit
    def s_predict(state, preds):
        m = nnx.merge(graphdef, state)
        return m.bbox_head.predict(preds, m.test_cfg)

    @jax.jit
    def s_full(state, pts):
        m = nnx.merge(graphdef, state)
        return m.test_forward({"data": pts})

    vox = timed("voxelize", s_voxelize, pts) if "voxelize" in which else \
        s_voxelize(state, pts)
    enc = timed("encode", s_encode, vox) if "encode" in which else \
        s_encode(state, vox)
    canvas = timed("middle", s_middle, enc) if "middle" in which else \
        s_middle(state, enc)
    x = timed("backbone", s_backbone, canvas) if "backbone" in which else \
        s_backbone(state, canvas)
    preds = timed("head", s_head, x) if "head" in which else \
        s_head(state, x)
    if "predict" in which:
        timed("predict", s_predict, preds)
    if "full" in which:
        timed("full", s_full, pts)


if __name__ == "__main__":
    main()
