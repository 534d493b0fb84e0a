"""Stage-level timing for the slow camera models (VERDICT r4 missing #3:
caddn / petrv2 ship with no stage breakdown or bound analysis).

Each stage compiles as its own jitted program on the bench_camera batch at
the config's REAL image dims, batch 1 (the camera latency protocol).
Diagnostic only — the driver bench is bench.py.

    python tools/bench_camera_stages.py --model caddn|petrv2
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench_camera as bc  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="caddn", choices=["caddn", "petrv2"])
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from flax import nnx

    from paddle3d_tpu.apis import Config

    cfg = Config(path=bc.MODELS[args.model])
    model = cfg.model
    model.eval()
    graphdef, state = nnx.split(model)
    state = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, state)
    rng = np.random.default_rng(0)
    batch = bc.build_batch(args.model, model, cfg, rng)
    batch = {k: (jax.tree.map(lambda v: jnp.asarray(v, jnp.bfloat16), v)
                 if isinstance(v, dict) else jnp.asarray(v, jnp.bfloat16))
             for k, v in batch.items()}
    batch = jax.device_put(batch)
    state = jax.device_put(state)

    def fetch(o):
        leaf = jax.tree.leaves(o)[0]
        return np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))

    def timeit(name, fn, *xs):
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        y = jf(*xs)
        fetch(y)
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        for _ in range(3):
            y = jf(*xs)
        fetch(y)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = jf(*xs)
        fetch(y)
        print(f"  {name:14s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f}"
              " ms/iter", flush=True)
        return y

    if args.model == "caddn":
        def s_backbone(state, b):
            m = nnx.merge(graphdef, state)
            img = b["data"]
            feats = m.backbone(img)
            if m.class_head is not None:
                f = m.class_head.features(feats)
            else:
                f = feats[-1] if isinstance(feats, (list, tuple)) else feats
            return f

        def s_depth(state, f):
            m = nnx.merge(graphdef, state)
            return m.depth_head(f), f

        def s_frustum(state, fd):
            m = nnx.merge(graphdef, state)
            depth_logits, f = fd
            import jax.nn as jnn
            depth_prob = jnn.softmax(depth_logits, axis=-1)
            return m._frustum_to_bev(f[..., :m.feat_channels], depth_prob,
                                     jnp.linalg.inv(
                                         batch["img2lidars"].astype(
                                             jnp.float32)))

        def s_bev(state, bev):
            m = nnx.merge(graphdef, state)
            return m.bev_backbone(bev)

        def s_head(state, feats):
            m = nnx.merge(graphdef, state)
            return m.bbox_head(feats)

        x = batch
        try:
            x = timeit("backbone", s_backbone, state, x)
            x = timeit("depth_head", s_depth, state, x)
            x = timeit("frustum2bev", s_frustum, state, x)
            x = timeit("bev_backbone", s_bev, state, x)
            timeit("head", s_head, state, x)
        except Exception as e:  # stage split is best-effort diagnostics
            print("stage chain failed:", type(e).__name__, str(e)[:300])
    else:  # petrv2
        def s_backbone(state, b):
            m = nnx.merge(graphdef, state)
            img = b["img"]
            bsz, n, h, w, c = img.shape
            return m.backbone(img.reshape(bsz * n, h, w, c))

        def s_neck(state, feats):
            m = nnx.merge(graphdef, state)
            return m.neck(feats)

        def s_head(state, feats):
            m = nnx.merge(graphdef, state)
            img = batch["img"]
            bsz, n = img.shape[:2]
            f = feats[0] if isinstance(feats, (list, tuple)) else feats
            _, fh, fw, fc = f.shape
            f = f.reshape(bsz, n, fh, fw, fc)
            return m.head(f, batch["img2lidars"])

        x = batch
        try:
            x = timeit("backbone", s_backbone, state, x)
            x = timeit("neck", s_neck, state, x)
            timeit("head", s_head, state, x)
        except Exception as e:
            print("stage chain failed:", type(e).__name__, str(e)[:300])

    def full(state, b):
        m = nnx.merge(graphdef, state)
        return m.test_forward(dict(b))

    timeit("FULL", full, state, batch)


if __name__ == "__main__":
    main()
