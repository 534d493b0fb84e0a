"""Full-scale shape tracing for the camera/multiview (and remaining
seg/cls/lane) configs via jax.eval_shape (zero FLOPs): each family gets a
minimal fake batch at the config's REAL image size so spatial chains (FPN
strides, frustum grids, BEV token maps, range images) are checked
end-to-end. With tests/test_config_shapes.py this covers every model
family in the zoo."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _image_size(cfg, default=(320, 800)):
    ds = cfg.dic.get("val_dataset", {}) or cfg.dic.get("train_dataset", {})
    size = ds.get("image_size")
    if size is None:
        return default
    return tuple(int(s) for s in size)


def _spec(*shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def _mats(b, n):
    return _spec(b, n, 4, 4)


def _petr_batch(model, cfg):
    h, w = _image_size(cfg)
    n = 12 if getattr(model, "version", 1) == 2 else 6
    return {"img": _spec(1, n, h, w, 3), "img2lidars": _mats(1, n),
            "lidar2cams": _mats(1, n)}


def _bevformer_batch(model, cfg):
    h, w = _image_size(cfg)
    n = 6
    return {"img": _spec(1, n, h, w, 3), "lidar2imgs": _mats(1, n)}


def _bevdet_batch(model, cfg):
    h, w = _image_size(cfg, default=(256, 704))
    n = 6
    batch = {
        "img": _spec(1, n, h, w, 3), "rots": _spec(1, n, 3, 3),
        "trans": _spec(1, n, 3), "cam2imgs": _spec(1, n, 3, 3),
        "post_rots": _spec(1, n, 3, 3), "post_trans": _spec(1, n, 3),
        "bda": _spec(1, 3, 3),
    }
    if getattr(model, "temporal", False):
        batch.update({
            "img_adj": _spec(1, n, h, w, 3), "rots_adj": _spec(1, n, 3, 3),
            "trans_adj": _spec(1, n, 3),
        })
    f = int(getattr(model, "num_adj", 0))
    if f > 0:  # RTEBev multi-frame contract: [B, F, N, ...]
        batch.update({
            "img_adj": _spec(1, f, n, h, w, 3),
            "rots_adj": _spec(1, f, n, 3, 3),
            "trans_adj": _spec(1, f, n, 3),
        })
    return batch


def _bevfusion_batch(model, cfg):
    batch = {"data": _spec(1, 4096, 5)}
    if getattr(model, "img_backbone", None) is not None or \
            getattr(model, "camera_stream", None) is not None:
        h, w = _image_size(cfg, default=(448, 800))
        n = 6
        batch.update({
            "img": _spec(1, n, h, w, 3), "rots": _spec(1, n, 3, 3),
            "trans": _spec(1, n, 3), "cam2imgs": _spec(1, n, 3, 3),
            "post_rots": _spec(1, n, 3, 3), "post_trans": _spec(1, n, 3),
            "bda": _spec(1, 3, 3),
        })
    return batch


def _caddn_batch(model, cfg):
    h, w = _image_size(cfg, default=(375, 1242))
    return {"data": _spec(1, h, w, 3), "img2lidars": _spec(1, 4, 4)}


def _dd3d_batch(model, cfg):
    h, w = _image_size(cfg, default=(384, 1280))
    return {"data": _spec(1, h, w, 3), "K_inv": _spec(1, 3, 3)}


BUILDERS = {
    "petr": _petr_batch,
    "cape": _petr_batch,
    "bevformer": _bevformer_batch,
    "bevdet": _bevdet_batch,
    "rtebev": _bevdet_batch,
    "bevfusion": _bevfusion_batch,
    "caddn": _caddn_batch,
    "dd3d": _dd3d_batch,
}

CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs", "**", "*.yml"),
                         recursive=True)
    if os.path.basename(os.path.dirname(p)) in BUILDERS
    and "synthetic" not in p)


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_camera_config_traces_at_full_scale(path):
    from paddle3d_tpu.apis import Config

    cfg = Config(path=path)
    model = cfg.model
    model.eval()
    family = os.path.basename(os.path.dirname(path))
    batch = BUILDERS[family](model, cfg)
    graphdef, state = nnx.split(model)

    def fwd(state, batch):
        m = nnx.merge(graphdef, state)
        return m.test_forward(batch)

    out = jax.eval_shape(fwd, state, batch)
    assert any(k in out for k in ("scores", "lane_conf"))


def _gt(box_dim=9, g=8):
    return {"gt_boxes": _spec(1, g, box_dim),
            "gt_labels": _spec(1, g, dtype=jnp.int32)}


def _train_extras(family, model, cfg, batch):
    """Family-specific additions the training loss paths consume."""
    if family in ("petr", "cape"):
        batch.update(_gt())
        sh = getattr(model, "seg_head", None)
        if sh is not None:
            batch["gt_semantic_map"] = _spec(1, sh.bev_h, sh.bev_w,
                                             sh.num_classes)
    elif family == "bevformer":
        h, w = batch["img"].shape[2:4]
        n = batch["img"].shape[1]
        q = 2
        batch.update(_gt())
        batch["img_queue"] = _spec(1, q, n, h, w, 3)
        batch["lidar2imgs_queue"] = _spec(1, q, n, 4, 4)
    elif family in ("bevdet", "rtebev", "bevfusion"):
        batch.update(_gt())
        if getattr(model, "use_depth", False):
            h, w = batch["img"].shape[2:4]
            batch["gt_depth"] = _spec(1, batch["img"].shape[1], h, w)
        vt = getattr(model, "img_view_transformer", None)
        if getattr(model, "camera_depth_range", None) and vt is not None:
            n = batch["img"].shape[1]
            batch["img_depth"] = _spec(1, n, vt.h_feat, vt.w_feat,
                                       1 + vt.D)
    elif family == "caddn":
        h, w = batch["data"].shape[1:3]
        batch.update(_gt(box_dim=7))
        # the dataset projects lidar depth at the FFE feature stride
        d = getattr(model, "downsample", 8)
        batch["depth_map"] = _spec(1, h // d, w // d)
    elif family == "dd3d":
        batch.update({"gt_boxes_2d": _spec(1, 8, 4),
                      "gt_boxes_cam": _spec(1, 8, 7),
                      "gt_labels": _spec(1, 8, dtype=jnp.int32)})
    return batch


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_camera_config_train_traces_at_full_scale(path):
    from paddle3d_tpu.apis import Config

    cfg = Config(path=path)
    model = cfg.model
    family = os.path.basename(os.path.dirname(path))
    batch = _train_extras(family, model, cfg,
                          BUILDERS[family](model, cfg))
    graphdef, state = nnx.split(model)

    def fwd(state, batch):
        m = nnx.merge(graphdef, state)
        return m.train_forward(batch)

    out = jax.eval_shape(fwd, state, batch)
    assert "loss" in out


def _smoke_batch(model, cfg):
    h, w = _image_size(cfg, default=(384, 1280))
    return {
        "data": _spec(1, h, w, 3),
        "target": {
            "K": _spec(1, 3, 3), "K_inv": _spec(1, 3, 3),
            "trans_mat": _spec(1, 3, 3), "image_size": _spec(1, 2),
            "down_ratio": _spec(1, 2),
        },
    }


def _lanedet_batch(model, cfg):
    h, w = _image_size(cfg, default=(576, 1024))
    return {"data": _spec(1, h, w, 3),
            "bev_grid": _spec(1, model.bev_h, model.bev_w, 2)}


def _rangeseg_batch(model, cfg):
    ds = cfg.dic.get("val_dataset", {})
    ph, pw = 64, 2048
    for t in ds.get("transforms", []):
        if "proj_H" in t:
            ph, pw = t["proj_H"], t["proj_W"]
    return {"data": _spec(1, ph, pw, 5)}


def _paconv_batch(model, cfg):
    n = cfg.dic.get("val_dataset", {}).get("num_points", 1024)
    return {"data": _spec(1, n, 3)}


EXTRA_BUILDERS = {
    "smoke": _smoke_batch,
    "bev_lanedet": _lanedet_batch,
    "squeezesegv3": _rangeseg_batch,
    "paconv": _paconv_batch,
}

EXTRA_CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs", "**", "*.yml"),
                         recursive=True)
    if os.path.basename(os.path.dirname(p)) in EXTRA_BUILDERS
    and "synthetic" not in p)


@pytest.mark.parametrize(
    "path", EXTRA_CONFIGS,
    ids=[os.path.relpath(p, REPO) for p in EXTRA_CONFIGS])
def test_remaining_families_trace_at_full_scale(path):
    from paddle3d_tpu.apis import Config

    cfg = Config(path=path)
    model = cfg.model
    model.eval()
    family = os.path.basename(os.path.dirname(path))
    batch = EXTRA_BUILDERS[family](model, cfg)
    graphdef, state = nnx.split(model)

    def fwd(state, batch):
        m = nnx.merge(graphdef, state)
        return m.test_forward(batch)

    out = jax.eval_shape(fwd, state, batch)
    assert any(k in out for k in ("scores", "lane_conf", "pred_labels",
                                  "pred", "logits"))
