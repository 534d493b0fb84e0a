"""Full-scale shape tracing for every LiDAR config: jax.eval_shape runs the
whole test_forward at the config's REAL grid dimensions without computing
anything — catching grid/stride/concat mismatches that tiny-grid model
tests cannot see (e.g. a pc_range whose extent is not an integer multiple
of the voxel size desyncing backbone and neck spatial dims)."""
import glob
import os

import jax
import jax.numpy as jnp
import pytest
from flax import nnx

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LIDAR_PREFIXES = ("pointpillars", "centerpoint", "pv_rcnn", "voxel_rcnn",
                  "iassd")

CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs", "**", "*.yml"),
                         recursive=True)
    if os.path.basename(os.path.dirname(p)) in LIDAR_PREFIXES
    and "synthetic" not in p)


def _point_channels(model):
    for attr in ("voxel_encoder", "pillar_encoder"):
        enc = getattr(model, attr, None)
        if enc is not None and hasattr(enc, "in_channels"):
            return enc.in_channels
    return 4


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_lidar_config_traces_at_full_scale(path):
    from paddle3d_tpu.apis import Config

    model = Config(path=path).model
    model.eval()
    graphdef, state = nnx.split(model)
    c = _point_channels(model)

    def fwd(state, pts):
        m = nnx.merge(graphdef, state)
        return m.test_forward({"data": pts})

    out = jax.eval_shape(
        fwd, state, jax.ShapeDtypeStruct((1, 1024, c), jnp.float32))
    assert "scores" in out and out["scores"].ndim == 2


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_lidar_config_train_traces_at_full_scale(path):
    from paddle3d_tpu.apis import Config

    model = Config(path=path).model
    graphdef, state = nnx.split(model)
    c = _point_channels(model)
    box_dim = 9 if getattr(getattr(model, "bbox_head", None),
                           "with_velocity", False) else 7

    def fwd(state, batch):
        m = nnx.merge(graphdef, state)
        return m.train_forward(batch)

    batch = {
        "data": jax.ShapeDtypeStruct((1, 1024, c), jnp.float32),
        "gt_boxes": jax.ShapeDtypeStruct((1, 8, box_dim), jnp.float32),
        "gt_labels": jax.ShapeDtypeStruct((1, 8), jnp.int32),
    }
    out = jax.eval_shape(fwd, state, batch)
    assert "loss" in out
