"""Generic (modality-agnostic) eval + export: camera/multiview models go
through Trainer.evaluate and tools/export.py with arbitrary batch dicts
(reference eval is model-agnostic: apis/trainer.py:461-488; export is driven
by per-model input specs: models/base/base_model.py:122-132)."""
import os
import sys

import numpy as np
import pytest
from flax import nnx

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def build_tiny_petr():
    from paddle3d_tpu.models.backbones import ResNet
    from paddle3d_tpu.models.detection import PETR
    from paddle3d_tpu.models.heads import PETRHead
    from paddle3d_tpu.models.necks import CPFPN

    rngs = nnx.Rngs(0)
    backbone = ResNet(depth=18, base_channels=8, out_indices=(2, 3),
                      rngs=rngs)
    neck = CPFPN(in_channels=[32, 64], out_channels=16, num_outs=2,
                 rngs=rngs)
    head = PETRHead(
        num_classes=3, in_channels=16, embed_dims=32, num_query=24,
        num_heads=4, num_layers=2, depth_num=8,
        position_range=[-12., -12., -4., 12., 12., 4.],
        pc_range=[-10., -10., -3., 10., 10., 3.], rngs=rngs)
    return PETR(backbone, neck, head)


def test_trainer_evaluate_multiview(tmp_path):
    """A multiview model (img/lidar2imgs/img2lidars batch) evaluates through
    the generic Trainer.evaluate, including a partial final batch that
    exercises zero-padding of every batch key."""
    import optax

    from paddle3d_tpu.apis import Trainer
    from paddle3d_tpu.datasets import SyntheticMVDataset

    model = build_tiny_petr()
    # 12 samples / batch 8 -> one full + one partial (4) batch
    val = SyntheticMVDataset(num_samples=12, num_cams=2, image_hw=(32, 48),
                             mode="val")
    trainer = Trainer(
        model=model, optimizer=optax.adam(1e-3), iters=0,
        val_dataset=val, batch_size=8, save_dir=str(tmp_path))
    metrics = trainer.evaluate()
    assert "recall@2m" in metrics and "precision@2m" in metrics
    # eval must not leave the model in eval mode
    bn_flags = [
        m.use_running_average for _, m in nnx.iter_graph(model)
        if isinstance(m, nnx.BatchNorm)
    ]
    assert bn_flags and not any(bn_flags)


def test_pad_batch_pads_every_key():
    from paddle3d_tpu.apis.trainer import Trainer

    batch = {
        "img": np.ones((3, 2, 8, 8, 3), np.float32),
        "lidar2imgs": np.ones((3, 2, 4, 4), np.float32),
        "scalar_aux": np.float32(1.0),
    }
    out = Trainer.pad_batch(batch, 8)
    assert out["img"].shape[0] == 8
    assert out["lidar2imgs"].shape[0] == 8
    assert np.all(out["img"][3:] == 0)


def test_export_resolves_inputs_from_dataset(tmp_path):
    """tools/export.py derives the example batch from the val dataset for a
    camera model and lowers export_forward to StableHLO."""
    import jax

    tools_dir = os.path.join(os.path.dirname(__file__), "..", "..", "tools")
    sys.path.insert(0, tools_dir)
    try:
        from export import resolve_example_batch
    finally:
        sys.path.remove(tools_dir)

    from paddle3d_tpu.datasets import SyntheticMVDataset

    model = build_tiny_petr()

    class FakeCfg:
        val_dataset = SyntheticMVDataset(
            num_samples=2, num_cams=2, image_hw=(32, 48), mode="val")

    example = resolve_example_batch(model, FakeCfg(), num_points=100)
    assert set(example) == {"img", "lidar2imgs", "img2lidars"}
    assert example["img"].shape == (1, 2, 32, 48, 3)

    model.eval()
    graphdef, state = nnx.split(model)

    def export_fn(state, batch):
        m = nnx.merge(graphdef, state)
        return m.export_forward(batch)

    lowered = jax.jit(export_fn).lower(state, example)
    assert "func.func" in lowered.as_text() or \
        "stablehlo" in lowered.as_text()


def test_apollo_deploy_file(tmp_path):
    """--export_for_apollo emits the reference's deploy descriptor
    (reference: tools/export.py:81-135) against the StableHLO artifacts."""
    import yaml

    tools_dir = os.path.join(os.path.dirname(__file__), "..", "..", "tools")
    sys.path.insert(0, tools_dir)
    try:
        from export import generate_apollo_deploy_file
    finally:
        sys.path.remove(tools_dir)

    model = build_tiny_petr()

    class Args:
        save_name = None

    class FakeCfg:
        train_dataset_config = {"type": "KittiPCDataset"}
        train_dataset = None
        dic = {}

    for fname in ("model.stablehlo.mlir", "model.msgpack"):
        (tmp_path / fname).write_bytes(b"x" * 10)
    yml = generate_apollo_deploy_file(
        FakeCfg(), model, str(tmp_path), Args(),
        {"img": {"shape": [1, 2, 32, 48, 3], "dtype": "float32"}})
    dic = yaml.safe_load(open(yml))
    assert dic["task_type"] == "3d_detection"
    assert dic["sensor_type"] == "camera"
    assert dic["dataset"]["name"] == "KittiPCDataset"
    files = {f["name"] for f in dic["model"]["model_files"]}
    assert files == {"model.stablehlo.mlir", "model.msgpack"}
    assert {o["name"] for o in dic["model"]["outputs"]} >= {"scores"}
