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

BASELINE_FPS = 40.5  # V100 TensorRT FP16, reference README


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--points", type=int, default=20000)
    parser.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = parser.parse_args()

    import jax
    # persistent compile cache: the remote compile helper takes minutes per
    # program; cache hits land in seconds
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from flax import nnx

    from paddle3d_tpu.apis import Config

    cfg = Config(
        path="configs/pointpillars/pointpillars_xyres16_kitti_car.yml")
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
    # KITTI-like scan: ~18k returns in range
    pts = rng.uniform([0, -39.68, -3, 0], [69.12, 39.68, 1, 1],
                      size=(args.batch, args.points, 4)).astype(np.float32)
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
    print(json.dumps({
        "metric": "pointpillars_kitti_infer_scans_per_sec",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec",
        "vs_baseline": round(scans_per_sec / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
