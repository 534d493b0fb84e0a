"""Stage-level timing for RTEBev-1f inference on the chip.

Times each pipeline stage as its own jitted program: image backbone+neck,
depth net + MS depth fusion, lift-splat (geometry + outer product + bev
pool), BEV encoder backbone+neck, head, predict. Diagnostic only. Timing
follows bench.py's fetch-sync convention.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CONFIG = "configs/rtebev/rtebev_r50_nuscenes_256x704_msdepth_hybrid_1f.yml"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from flax import nnx

    import bench_camera as bc
    from paddle3d_tpu.apis import Config

    cfg = Config(path=CONFIG)
    model = cfg.model
    model.eval()
    graphdef, state = nnx.split(model)
    state = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, state)
    rng = np.random.default_rng(0)
    batch = bc.build_batch("rtebev_1f", model, cfg, rng)
    for k in list(batch):
        if k in ("img", "img_adj") and hasattr(batch[k], "astype"):
            batch[k] = batch[k].astype(jnp.bfloat16)
    batch = jax.device_put(batch)
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
        print(f"{name:12s} {dt:9.2f} ms", flush=True)
        return out

    @jax.jit
    def s_imgfeat(state, batch):
        m = nnx.merge(graphdef, state)
        return m._image_feats(batch["img"])

    @jax.jit
    def s_viewtrans(state, feats, batch):
        m = nnx.merge(graphdef, state)
        vt_in = feats[:3] if m.use_ms_depth else feats[0]
        return m.img_view_transformer(
            vt_in, batch["rots"], batch["trans"], batch["cam2imgs"],
            batch["post_rots"], batch["post_trans"], batch["bda"])

    @jax.jit
    def s_bevenc(state, bev):
        m = nnx.merge(graphdef, state)
        x = m.img_bev_encoder_backbone(bev)
        x = m.img_bev_encoder_neck(x)
        return x[0] if isinstance(x, (tuple, list)) else x

    @jax.jit
    def s_head(state, x):
        m = nnx.merge(graphdef, state)
        return m.bbox_head(x, training=False)

    @jax.jit
    def s_predict(state, hd):
        m = nnx.merge(graphdef, state)
        all_cls, all_bbox = hd
        return m.bbox_head.predict(
            all_cls, all_bbox,
            score_threshold=m.test_cfg.get("score_threshold", 0.0))

    @jax.jit
    def s_full(state, batch):
        m = nnx.merge(graphdef, state)
        return m.test_forward(batch)

    feats = timed("imgfeat", s_imgfeat, batch)
    bev_depth = timed("viewtrans", s_viewtrans, feats, batch)
    bev = bev_depth[0]
    if getattr(nnx.merge(graphdef, state), "num_adj", 0):
        bev = jnp.concatenate(
            [bev] * (nnx.merge(graphdef, state).num_adj + 1), axis=-1)
    x = timed("bevenc", s_bevenc, bev)
    hd = timed("head", s_head, x)
    timed("predict", s_predict, hd)
    timed("full", s_full, batch)


if __name__ == "__main__":
    main()
