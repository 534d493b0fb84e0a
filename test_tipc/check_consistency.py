"""Output consistency between test_forward and the exported program
(reference: test_tipc/test_train_inference_python.sh compares training-side
and inference-side outputs).

    python test_tipc/check_consistency.py --config cfg.yml \
        --model ckpt_dir --export_dir exported/ [--atol 1e-3]

Builds the model twice — once in-process (test_forward, eval mode) and once
the deploy way (weights from export_dir's msgpack, export_forward) — runs
both on the example inputs recorded in export_meta.yaml, and asserts the
outputs match.
"""
import argparse
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_weights(model, path):
    from flax import nnx, serialization
    if os.path.isdir(path):
        path = os.path.join(path, "model.msgpack")
    template = nnx.state(model, nnx.Param)
    with open(path, "rb") as f:
        pure = serialization.from_bytes(template.to_pure_dict(), f.read())
    template.replace_by_pure_dict(pure)
    nnx.update(model, template)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--model", required=True, help="checkpoint dir")
    p.add_argument("--export_dir", required=True)
    p.add_argument("--atol", type=float, default=1e-3)
    p.add_argument("--device", default=None, help="tpu|cpu override")
    args = p.parse_args()

    import jax
    if args.device is not None:
        jax.config.update("jax_platforms", args.device)
    from flax import nnx

    from paddle3d_tpu.apis import Config

    with open(os.path.join(args.export_dir, "export_meta.yaml")) as f:
        meta = yaml.safe_load(f)
    rng = np.random.default_rng(0)

    def build(v):
        # leaf = {"shape": [...]}; otherwise a nested input dict
        if isinstance(v, dict) and isinstance(v.get("shape"), list):
            return rng.normal(0, 1, v["shape"]).astype(
                np.dtype(v.get("dtype", "float32")))
        return {kk: build(vv) for kk, vv in v.items()}

    batch = {k: build(v) for k, v in meta["inputs"].items()}

    cfg = Config(path=args.config)
    model = cfg.model
    load_weights(model, args.model)
    model.eval()
    graphdef, state = nnx.split(model)
    test_out = jax.jit(
        lambda s, b: nnx.merge(graphdef, s).test_forward(b))(state, batch)

    model2 = Config(path=args.config).model
    load_weights(model2, os.path.join(args.export_dir, "model.msgpack"))
    model2.eval()
    graphdef2, state2 = nnx.split(model2)
    export_out = jax.jit(
        lambda s, b: nnx.merge(graphdef2, s).export_forward(b))(state2,
                                                                batch)

    test_out = jax.device_get(test_out)
    export_out = jax.device_get(export_out)
    keys = sorted(set(test_out) & set(export_out))
    assert keys, "no common output keys"
    for k in keys:
        a, b = np.asarray(test_out[k]), np.asarray(export_out[k])
        assert a.shape == b.shape, (k, a.shape, b.shape)
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, atol=args.atol, rtol=1e-3,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(a, b, err_msg=k)
    print("consistency OK: {} keys match within atol={}".format(
        len(keys), args.atol))


if __name__ == "__main__":
    main()
