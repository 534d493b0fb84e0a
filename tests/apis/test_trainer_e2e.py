"""End-to-end: Config YAML -> Trainer.train() -> evaluate() on synthetic data,
running data-parallel over the 8 fake CPU devices from conftest."""
import os

import jax
import numpy as np
import pytest

CFG = os.path.join(
    os.path.dirname(__file__), "../../configs/pointpillars/"
    "pointpillars_synthetic_tiny.yml")


def test_config_builds_components():
    from paddle3d_tpu.apis import Config
    cfg = Config(path=CFG, iters=4)
    assert cfg.batch_size == 2
    assert cfg.iters == 4
    model = cfg.model
    assert type(model).__name__ == "PointPillars"
    ds = cfg.train_dataset
    assert len(ds) == 16
    tx = cfg.optimizer  # optax transformation
    assert hasattr(tx, "init") and hasattr(tx, "update")


def test_config_base_inheritance(tmp_path):
    from paddle3d_tpu.apis import Config
    base = tmp_path / "base.yml"
    base.write_text("batch_size: 4\niters: 100\nfoo: {a: 1, b: 2}\n")
    child = tmp_path / "child.yml"
    child.write_text("_base_: base.yml\nfoo: {b: 3}\n")
    cfg = Config(path=str(child))
    assert cfg.dic["batch_size"] == 4
    assert cfg.dic["foo"] == {"a": 1, "b": 3}


def test_trainer_train_eval_resume(tmp_path):
    from paddle3d_tpu.apis import Config, Trainer
    assert len(jax.devices()) == 8  # fake multichip mesh active

    cfg = Config(path=CFG, iters=6, batch_size=8)
    dic = dict(
        model=cfg.model,
        optimizer=cfg.optimizer,
        iters=6,
        train_dataset=cfg.train_dataset,
        val_dataset=cfg.val_dataset,
        batch_size=8,  # divisible by the 8-device data mesh
        save_dir=str(tmp_path / "out"),
        save_interval=3,
        log_interval=2,
        ema_decay=0.9,
    )
    trainer = Trainer(**dic)
    trainer.train()
    assert trainer.cur_iter == 6
    assert not trainer.checkpoint.empty
    assert trainer.checkpoint.get_record("iters") == 6

    metrics = trainer.evaluate(use_ema=True)
    assert "recall@2m" in metrics and "precision@2m" in metrics

    # resume path: a fresh trainer picks up iteration counter + weights
    cfg2 = Config(path=CFG, iters=6, batch_size=8)
    dic2 = dict(dic)
    dic2.update(model=cfg2.model, optimizer=cfg2.optimizer, resume=True)
    trainer2 = Trainer(**dic2)
    assert trainer2.cur_iter == 6


def test_trainer_amp_o2(tmp_path):
    from paddle3d_tpu.apis import Config, Trainer
    cfg = Config(path=CFG, iters=3, batch_size=8)
    trainer = Trainer(
        model=cfg.model, optimizer=cfg.optimizer, iters=3,
        train_dataset=cfg.train_dataset, batch_size=8,
        save_dir=str(tmp_path / "amp"), save_interval=0, log_interval=0,
        amp_cfg=dict(use_amp=True, level="O2"))
    trainer.train()
    assert trainer.cur_iter == 3
