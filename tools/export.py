"""Export CLI (reference: tools/export.py).

The reference exports a paddle static graph (.pdmodel). The TPU-native
equivalent is an AOT-compiled StableHLO module of the model's
`export_forward` (pre→net→post in one program) plus the weights:

    python tools/export.py --config cfg.yml [--model ckpt] --save_dir out/

Produces:
    out/model.stablehlo.mlir  — portable StableHLO text of the program
    out/model.msgpack         — weights
    out/export_meta.yaml      — input shapes/dtypes
"""
import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    parser = argparse.ArgumentParser(description="Model export")
    parser.add_argument("--config", dest="cfg", required=True, type=str)
    parser.add_argument("--device", type=str, default=None,
                        help="tpu|cpu override (reference tools use --device)")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--save_dir", type=str, default="exported_model")
    parser.add_argument("--num_points", type=int, default=40000)
    return parser.parse_args()


def main(args):
    if args.device is not None:
        import jax
        jax.config.update("jax_platforms", args.device)
    import jax
    import numpy as np
    from flax import nnx, serialization

    from paddle3d_tpu.apis import Config
    from paddle3d_tpu.utils.logger import logger

    cfg = Config(path=args.cfg)
    model = cfg.model

    if args.model is not None:
        path = args.model
        if os.path.isdir(path):
            path = os.path.join(path, "model.msgpack")
        template = nnx.state(model, nnx.Param)
        with open(path, "rb") as f:
            pure = serialization.from_bytes(template.to_pure_dict(), f.read())
        template.replace_by_pure_dict(pure)
        nnx.update(model, template)

    graphdef, state = nnx.split(model)

    def export_fn(state, points):
        m = nnx.merge(graphdef, state)
        return m.export_forward({"data": points})

    point_dim = getattr(model.pillar_encoder, "in_channels", 4) \
        if hasattr(model, "pillar_encoder") else 4
    example = np.zeros((1, args.num_points, point_dim), np.float32)
    lowered = jax.jit(export_fn).lower(state, example)

    os.makedirs(args.save_dir, exist_ok=True)
    with open(os.path.join(args.save_dir, "model.stablehlo.mlir"), "w") as f:
        f.write(lowered.as_text())
    pure = nnx.state(model, nnx.Param).to_pure_dict()
    with open(os.path.join(args.save_dir, "model.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(pure)))
    with open(os.path.join(args.save_dir, "export_meta.yaml"), "w") as f:
        yaml.safe_dump({
            "input": {"name": "points",
                      "shape": [1, args.num_points, point_dim],
                      "dtype": "float32"},
            "config": os.path.abspath(args.cfg),
        }, f)
    logger.info("Exported StableHLO + weights to {}".format(args.save_dir))


if __name__ == "__main__":
    main(parse_args())
