"""Every shipped config must parse and build its model, optimizer and lr
schedule (datasets need data on disk, so only their dicts are validated —
the registered type must exist and accept the config keys).

Mirrors the reference's config surface (reference: configs/* — one flagship
config per model family, checked by building, not just parsing).
"""
import glob
import inspect
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs", "**", "*.yml"),
                         recursive=True)
    # configs/quant/*.yml are QAT option files (--quant_config), not model
    # configs
    if os.sep + "quant" + os.sep not in p)


def _check_dataset_cfg(cfg_dict):
    """The dataset type must exist and the config keys must match its
    constructor (without touching the filesystem)."""
    from paddle3d_tpu.apis.config import Config
    from paddle3d_tpu.apis import manager
    if not cfg_dict:
        return
    dic = dict(cfg_dict)
    cls = manager.DATASETS.components_dict[dic.pop("type")]
    params = inspect.signature(cls.__init__).parameters
    for key in dic:
        assert key in params, (
            f"{cls.__name__} has no constructor arg {key!r}")


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_config_builds(path):
    from paddle3d_tpu.apis.config import Config
    cfg = Config(path=path)

    model = cfg.model
    assert model is not None

    if "optimizer" in cfg.dic:
        tx = cfg.optimizer
        assert tx is not None
    if "lr_scheduler" in cfg.dic:
        sched = cfg.lr_scheduler
        lr0 = float(sched(0))
        assert lr0 >= 0.0

    _check_dataset_cfg(cfg.train_dataset_config)
    _check_dataset_cfg(cfg.val_dataset_config)
