"""Benchmark: PointPillars KITTI-scale inference, scans/sec on one chip.

Measures the FULL pre(voxelize)→net→post(NMS) pipeline as one XLA program —
the reference's comparable number is single-V100 TensorRT FPS 37.3 (FP32) /
40.5 (FP16) for the same model/config (BASELINE.md, reference
configs/pointpillars/README.md:28). vs_baseline is against the 40.5 FPS
TRT-FP16 figure.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "scans/sec", "vs_baseline": N}
"""
import argparse
import json
import os
import sys
import time

import numpy as np

MODELS = {
    # model -> (config, points/scan, pc_range lo/hi, V100-TRT-FP16 FPS ref)
    "pointpillars": (
        "configs/pointpillars/pointpillars_xyres16_kitti_car.yml", 20000,
        ([0, -39.68, -3, 0], [69.12, 39.68, 1, 1]), 40.5),
    # reference configs/centerpoint/README.md:35 — nuScenes 10-sweep pillars,
    # 63.43 FPS TRT-FP16 on V100; 10-sweep scans carry ~250k points with a
    # (x, y, z, intensity, dt) layout
    "centerpoint": (
        "configs/centerpoint/centerpoint_pillars_02voxel_nuscenes_10sweep.yml",
        250000,
        ([-51.2, -51.2, -5, 0, 0], [51.2, 51.2, 3, 1, 0.45]), 63.43),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="pointpillars",
                        choices=sorted(MODELS))
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--points", type=int, default=None)
    parser.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = parser.parse_args()
    config_path, default_points, (lo, hi), baseline_fps = MODELS[args.model]
    if args.points is None:
        args.points = default_points

    import jax
    # persistent compile cache: the remote compile helper takes minutes per
    # program; cache hits land in seconds
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from flax import nnx

    from paddle3d_tpu.apis import Config

    cfg = Config(path=config_path)
    model = cfg.model
    model.eval()  # BN running stats — what deploy/eval run (TRT FPS likewise)
    graphdef, state = nnx.split(model)

    if args.dtype == "bf16":
        # bf16 conv/matmul compute; keep small normalization params exact
        import jax.numpy as jnp

        def cast(x):
            if hasattr(x, "dtype") and x.dtype == jnp.float32:
                return x.astype(jnp.bfloat16)
            return x
        state = jax.tree.map(cast, state)

    def forward(state, points):
        m = nnx.merge(graphdef, state)
        return m.test_forward({"data": points})

    fwd = jax.jit(forward)

    rng = np.random.default_rng(0)
    # synthetic scan with every return in range
    pts = rng.uniform(lo, hi,
                      size=(args.batch, args.points, len(lo))
                      ).astype(np.float32)
    if args.dtype == "bf16":
        import jax.numpy as jnp
        pts = pts.astype(jnp.bfloat16)
    # one H2D upload outside the timed loop (numpy operands re-transfer per
    # call, which over the axon tunnel costs more than the compute; TRT FPS
    # baselines likewise time pure inference)
    pts = jax.device_put(pts)
    state = jax.device_put(state)

    # NOTE: on the axon remote-tunnel runtime block_until_ready does NOT wait
    # for device completion — only a host fetch does. Executions are in-order,
    # so fetching a scalar from the LAST call's output forces all K previous
    # executions: total time = K executions + one RPC round-trip (~40ms),
    # amortized away by K.
    def fetch(out):
        return np.asarray(out["scores"][:1, :1].astype(np.float32))

    fetch(fwd(state, pts))  # compile + warm
    for _ in range(args.warmup):
        fetch(fwd(state, pts))

    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = fwd(state, pts)
    fetch(out)
    dt = time.perf_counter() - t0

    scans_per_sec = args.batch * args.iters / dt
    metric = {"pointpillars": "pointpillars_kitti_infer_scans_per_sec",
              "centerpoint": "centerpoint_nuscenes_infer_scans_per_sec"}
    print(json.dumps({
        "metric": metric[args.model],
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec",
        "vs_baseline": round(scans_per_sec / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
