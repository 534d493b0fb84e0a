"""Generic Python deploy runner (reference: deploy/*/python/infer.py — the
reference ships one ~300-LoC Paddle-Inference script per model; the
TPU-native deploy story is one generic runner for every exported model).

    python deploy/python/infer.py --model_dir exported/ \
        [--lidar_file points.bin] [--num_points 40000] [--iters 20]

Loads export_meta.yaml + model.msgpack produced by tools/export.py,
rebuilds the model from its config, jits `export_forward`, and times it
with honest host-fetch-synced latency (see bench.py: on TPU only a host
fetch syncs).
"""
import argparse
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def parse_args():
    p = argparse.ArgumentParser(description="deploy inference")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--lidar_file", default=None,
                   help=".bin float32 point cloud (KITTI layout)")
    p.add_argument("--num_points", type=int, default=None)
    p.add_argument("--iters", type=int, default=1)
    p.add_argument("--device", default=None, help="tpu|cpu override")
    return p.parse_args()


def main(args):
    if args.device is not None:
        import jax
        jax.config.update("jax_platforms", args.device)
    import jax
    from flax import nnx, serialization

    from paddle3d_tpu.apis import Config

    with open(os.path.join(args.model_dir, "export_meta.yaml")) as f:
        meta = yaml.safe_load(f)
    cfg = Config(path=meta["config"])
    model = cfg.model
    template = nnx.state(model, nnx.Param)
    with open(os.path.join(args.model_dir, "model.msgpack"), "rb") as f:
        pure = serialization.from_bytes(template.to_pure_dict(), f.read())
    template.replace_by_pure_dict(pure)
    nnx.update(model, template)
    model.eval()

    # input specs: new multi-input format (any modality) with legacy
    # single-"points" fallback
    if "inputs" in meta:
        specs = meta["inputs"]
    else:
        specs = {"data": meta["input"]}
    def build(v):
        # leaf = {"shape": [...], "dtype": ...}; anything else is a nested
        # input dict (e.g. SMOKE's `target` calib block)
        if isinstance(v, dict) and isinstance(v.get("shape"), list):
            return np.zeros(v["shape"], np.dtype(v.get("dtype", "float32")))
        return {kk: build(vv) for kk, vv in v.items()}

    batch = {k: build(v) for k, v in specs.items()}
    if "data" in batch and batch["data"].ndim == 3:
        shape = list(batch["data"].shape)
        if args.num_points:
            shape = [shape[0], args.num_points, shape[2]]
            batch["data"] = np.zeros(shape, batch["data"].dtype)
        if args.lidar_file:
            pts = np.fromfile(args.lidar_file,
                              np.float32).reshape(-1, shape[2])
            # pad/trim to the exported static shape (NaN padding = invalid)
            out = np.full((shape[1], shape[2]), np.nan, np.float32)
            n = min(len(pts), shape[1])
            out[:n] = pts[:n]
            batch["data"] = out[None]

    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, batch):
        m = nnx.merge(graphdef, state)
        return m.export_forward(batch)

    outs = fwd(state, batch)
    jax.tree.map(np.asarray, outs)  # host fetch = sync
    t0 = time.perf_counter()
    for _ in range(args.iters):
        outs = fwd(state, batch)
    outs = jax.tree.map(np.asarray, outs)
    dt = (time.perf_counter() - t0) / max(args.iters, 1)
    print("latency: {:.2f} ms/iter".format(1e3 * dt))
    for k, v in outs.items():
        print(k, getattr(v, "shape", None))
    return outs


if __name__ == "__main__":
    main(parse_args())
