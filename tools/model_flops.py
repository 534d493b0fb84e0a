"""Analytic FLOP counts per benched model (VERDICT r4 weak #7/#8: every
bench number with no published reference FPS gets a roofline anchor).

Uses jax's pre-optimization HLO cost analysis on the CPU lowering at each
config's REAL input dims — no chip needed. FLOPs here are the XLA-counted
forward cost; the STATUS table divides by the measured latency to state
achieved TFLOP/s vs the 197 TFLOP/s bf16 peak (compute-bound ceiling) or
the ~820 GB/s HBM roofline where bandwidth-bound.

    python tools/model_flops.py --models smoke,petr,...
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench_camera as bc  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", default="smoke,petr,petrv2,cape,bevformer,"
                                       "bevdet4d,caddn,rtebev_1f")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import nnx

    from paddle3d_tpu.apis import Config

    import bench as lidar_bench  # noqa: E402 — repo-root bench.py

    out = {}
    for name in args.models.split(","):
        try:
            if name in lidar_bench.MODELS:
                # LiDAR family: bench.py's synthetic scans, batch 8 like
                # the driver bench (FLOPs reported PER SCAN below).
                config_path, npts, (lo, hi), _ = lidar_bench.MODELS[name]
                cfg = Config(path=config_path)
                model = cfg.model
                model.eval()
                graphdef, state = nnx.split(model)
                rng = np.random.default_rng(0)
                pts = lidar_bench.make_scans(rng, 8, npts, lo, hi,
                                             "clustered")
                batch = {"data": jnp.asarray(pts)}
            else:
                cfg = Config(path=bc.MODELS[name])
                model = cfg.model
                model.eval()
                graphdef, state = nnx.split(model)
                rng = np.random.default_rng(0)
                batch = bc.build_batch(name, model, cfg, rng)
                batch = {k: (jax.tree.map(jnp.asarray, v)
                             if isinstance(v, dict) else jnp.asarray(v))
                         for k, v in batch.items()}

            def fwd(state, b):
                return nnx.merge(graphdef, state).test_forward(dict(b))

            lowered = jax.jit(fwd).lower(state, batch)
            ca = lowered.cost_analysis()
            gf = float(ca.get("flops", 0.0)) / 1e9
            gb = float(ca.get("bytes accessed", 0.0)) / 1e9
            out[name] = {"gflops": round(gf, 1), "gbytes": round(gb, 2)}
            print(f"{name:12s} {gf:9.1f} GFLOP  {gb:7.2f} GB (f32 count)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — per-model diagnostics
            out[name] = {"error": f"{type(e).__name__}: {e}"[:160]}
            print(f"{name:12s} ERROR {out[name]['error']}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
