"""Export CLI (reference: tools/export.py).

The reference exports a paddle static graph (.pdmodel) driven by per-model
input specs (reference: models/base/base_model.py:122-132). The TPU-native
equivalent is an AOT-compiled StableHLO module of the model's
`export_forward` (pre→net→post in one program) plus the weights:

    python tools/export.py --config cfg.yml [--model ckpt] --save_dir out/

Example inputs are resolved generically (any modality — lidar, mono-camera,
multi-view): from `model.export_input_spec()` when the model defines one,
otherwise from the first collated val-dataset batch (gt_* keys stripped),
otherwise a raw-points spec for lidar models.

Produces:
    out/model.stablehlo.mlir  — portable StableHLO text of the program
    out/model.msgpack         — weights
    out/export_meta.yaml      — input names/shapes/dtypes
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
    parser.add_argument("--num_points", type=int, default=40000,
                        help="points capacity for the lidar fallback spec")
    parser.add_argument("--quant_config", type=str, default=None,
                        help="QAT yaml — exports the fake-quantized graph")
    parser.add_argument("--export_for_apollo", action="store_true",
                        help="also emit apollo_deploy.yaml (reference: "
                             "tools/export.py:81-135)")
    parser.add_argument("--save_name", type=str, default=None,
                        help="basename for the Apollo model files entry")
    return parser.parse_args()


def generate_apollo_deploy_file(cfg, model, save_dir: str, args,
                                inputs_meta: dict):
    """Apollo deploy descriptor (reference: tools/export.py:81-135
    generate_apollo_deploy_file) adapted to the StableHLO artifact set:
    the model_files list points at the weight-baked StableHLO module and
    the msgpack weights instead of .pdmodel/.pdiparams."""
    import datetime

    sensor = {"lidar": "lidar", "image": "camera",
              "multiview": "camera"}.get(
                  getattr(model, "modality", "lidar"), "lidar")
    try:
        train_ds = cfg.train_dataset_config
    except Exception:
        train_ds = {}
    ds_name = (train_ds or {}).get("type", "unknown")
    labels = []
    try:
        ds = cfg.train_dataset
        labels = list(getattr(ds, "labels", []) or [])
    except Exception:
        pass

    save_name = args.save_name or model.__class__.__name__.lower()
    model_files = []
    for fname, ftype in (("model_baked.stablehlo.mlir", "model"),
                         ("model.stablehlo.mlir", "model"),
                         ("model.msgpack", "params")):
        fpath = os.path.join(save_dir, fname)
        if os.path.exists(fpath):
            model_files.append({"name": fname, "type": ftype,
                                "size": os.path.getsize(fpath)})

    yml_file = os.path.join(save_dir, "apollo_deploy.yaml")
    with open(yml_file, "w") as f:
        f.write("# base information\n")
        yaml.safe_dump({"name": model.__class__.__name__}, f)
        yaml.safe_dump({"date": datetime.date.today()}, f)
        yaml.safe_dump({"task_type": "3d_detection"}, f)
        yaml.safe_dump({"sensor_type": sensor}, f)
        yaml.safe_dump({"framework": "JAX-StableHLO"}, f)
        f.write("\n# dataset information\n")
        yaml.safe_dump({"dataset": {"name": ds_name, "labels": labels}}, f)
        f.write("\n# model information\n")
        yaml.safe_dump({"model": {
            "inputs": [{"name": k, **(v if "shape" in v else {})}
                       for k, v in sorted(inputs_meta.items())],
            "outputs": [{"name": n} for n in
                        ("box3d_lidar", "label_preds", "scores")],
            "preprocess": (cfg.dic.get("export", {}) or {}).get(
                "transforms", []),
            "model_files": model_files,
        }}, f)
    return yml_file


def resolve_example_batch(model, cfg, num_points: int) -> dict:
    """Build the example input batch for AOT lowering (any modality)."""
    import numpy as np

    spec = model.export_input_spec()
    if spec is not None:
        return spec
    # Generic path: one collated val sample defines every input the model's
    # export_forward reads (camera batches carry img/lidar2imgs/rots/...).
    try:
        val = cfg.val_dataset
    except Exception:
        val = None
    if val is not None and len(val) > 0:
        batch, _ = val.collate_fn([val[0]])
        return {
            k: np.zeros_like(v) if isinstance(v, np.ndarray) else v
            for k, v in batch.items() if not k.startswith("gt_")
        }
    # Lidar fallback: raw points, NaN-padded convention.
    point_dim = getattr(model.pillar_encoder, "in_channels", 4) \
        if hasattr(model, "pillar_encoder") else 4
    return {"data": np.zeros((1, num_points, point_dim), np.float32)}


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

    if args.quant_config is not None:
        from paddle3d_tpu.slim import QAT, get_qat_config
        QAT(get_qat_config(args.quant_config)).quantize(model)

    # the exported graph must normalize with trained running averages, same
    # as evaluate() and deploy/python/infer.py (reference calls model.eval())
    model.eval()
    example = resolve_example_batch(model, cfg, args.num_points)
    graphdef, state = nnx.split(model)

    def export_fn(state, batch):
        m = nnx.merge(graphdef, state)
        return m.export_forward(batch)

    # keep_unused: inputs the program ignores (e.g. a train-only depth_map
    # in the collated example batch) stay as module parameters, so the
    # export_meta input list and the module signature always agree — the
    # C++ PJRT runner feeds every listed input positionally
    lowered = jax.jit(export_fn, keep_unused=True).lower(state, example)

    os.makedirs(args.save_dir, exist_ok=True)
    with open(os.path.join(args.save_dir, "model.stablehlo.mlir"), "w") as f:
        f.write(lowered.as_text())

    # weight-BAKED module for the generic C++ PJRT runner
    # (deploy/cpp/pjrt_runner.cpp): parameters are closed over as module
    # constants so the binary feeds data tensors only
    host_state = jax.device_get(state)
    baked = jax.jit(lambda batch: export_fn(host_state, batch),
                    keep_unused=True).lower(example)
    with open(os.path.join(args.save_dir,
                           "model_baked.stablehlo.mlir"), "w") as f:
        f.write(baked.as_text())
    pure = nnx.state(model, nnx.Param).to_pure_dict()
    with open(os.path.join(args.save_dir, "model.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(pure)))
    def spec_of(v):
        # nested input dicts (e.g. SMOKE's `target` calib block) recurse
        if isinstance(v, dict):
            return {kk: spec_of(vv) for kk, vv in v.items()}
        return {"shape": list(np.shape(v)), "dtype": str(np.asarray(v).dtype)}

    inputs_meta = {k: spec_of(v) for k, v in example.items()}
    with open(os.path.join(args.save_dir, "export_meta.yaml"), "w") as f:
        yaml.safe_dump({
            "inputs": inputs_meta,
            "config": os.path.abspath(args.cfg),
            "quant_config": (os.path.abspath(args.quant_config)
                             if args.quant_config else None),
        }, f)
    if args.export_for_apollo:
        yml = generate_apollo_deploy_file(cfg, model, args.save_dir, args,
                                          inputs_meta)
        logger.info("Apollo deploy file: {}".format(yml))
    logger.info("Exported StableHLO + weights to {} (inputs: {})".format(
        args.save_dir, sorted(inputs_meta)))


if __name__ == "__main__":
    main(parse_args())
