"""BEV-LaneDet (reference: paddle3d/models/detection/bev_lanedet/
bev_lanedet.py:303 — virtual-camera BEV lane detection).

Image features are warped to a BEV grid through a homography (virtual
camera looking down; the dataset provides image->BEV grid mapping as a
normalized flow field), then a lane head predicts per-cell (confidence,
lateral offset, embedding for instance grouping, height). Losses: BCE on
confidence, L1 on offset/height, push-pull discriminative loss on
embeddings (the reference's instance-embedding scheme).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....apis import manager
from ....sample import Sample
from ...base.base_model import BaseMonoModel
from ...layers.layer_libs import ConvBNReLU, uniform_init

__all__ = ["BEVLaneDet"]


def _bilinear_warp(feat, grid):
    """feat [H, W, C]; grid [Hb, Wb, 2] normalized (u, v) in [0,1] ->
    [Hb, Wb, C]."""
    h, w, c = feat.shape
    x = grid[..., 0] * (w - 1)
    y = grid[..., 1] * (h - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    tx, ty = x - x0, y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = feat[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb[..., None], v, 0.)

    return (tap(x0, y0) * ((1 - tx) * (1 - ty))[..., None] +
            tap(x0 + 1, y0) * (tx * (1 - ty))[..., None] +
            tap(x0, y0 + 1) * ((1 - tx) * ty)[..., None] +
            tap(x0 + 1, y0 + 1) * (tx * ty)[..., None])


@manager.MODELS.add_component
class BEVLaneDet(BaseMonoModel):
    def __init__(self,
                 backbone=None,
                 bev_size: Sequence[int] = (100, 25),
                 bev_shape: Sequence[int] = None,
                 output_2d_shape: Sequence[int] = None,
                 train: bool = None,
                 in_channels: int = 256,
                 feat_channels: int = 64,
                 embed_dims: int = 4,
                 push_margin: float = 3.0,
                 pull_margin: float = 0.5,
                 pretrained: str = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        # reference-YAML surface (bev_lanedet_apollo_576x1024.yml): the
        # backbone (ResNet-34) is built INSIDE the reference model;
        # bev_shape/output_2d_shape name this repo's bev_size; `train` and
        # the 2D aux-head shape are folded (the 2D branch is part of the
        # model here).
        del output_2d_shape, train
        if bev_shape is not None:
            bev_size = bev_shape
        if backbone is None:
            from ...backbones import ResNet
            backbone = ResNet(depth=34, out_indices=(3,), rngs=rngs)
            in_channels = 512
        self.backbone = backbone
        self.bev_h, self.bev_w = bev_size
        self.push_margin = push_margin
        self.pull_margin = pull_margin
        self.pretrained = pretrained

        self.reduce = ConvBNReLU(in_channels, feat_channels, 3, rngs=rngs)
        self.bev_conv = nnx.Sequential(
            ConvBNReLU(feat_channels, feat_channels, 3, rngs=rngs),
            ConvBNReLU(feat_channels, feat_channels, 3, rngs=rngs))

        def head(cout):
            return nnx.Conv(feat_channels, cout, kernel_size=(1, 1),
                            kernel_init=uniform_init(), rngs=rngs)

        self.conf_head = head(1)
        self.offset_head = head(1)
        self.embed_head = head(embed_dims)
        self.height_head = head(1)

    def _bev_preds(self, batch):
        img = batch["data"] / 255.0
        feats = self.backbone(img)
        f = feats[0] if isinstance(feats, (tuple, list)) else feats
        f = self.reduce(f)
        bev = jax.vmap(_bilinear_warp)(f, batch["bev_grid"])
        bev = self.bev_conv(bev)
        return {
            "conf": self.conf_head(bev)[..., 0],
            "offset": jax.nn.sigmoid(self.offset_head(bev))[..., 0],
            "embed": self.embed_head(bev),
            "height": self.height_head(bev)[..., 0],
        }

    def train_forward(self, batch) -> dict:
        preds = self._bev_preds(batch)
        conf_t = batch["lane_conf"]      # [B, Hb, Wb] {0,1}
        offset_t = batch["lane_offset"]  # [B, Hb, Wb] in [0,1]
        height_t = batch["lane_height"]
        inst_t = batch["lane_instance"]  # [B, Hb, Wb] int, 0 = bg

        logits = preds["conf"]
        bce = (jnp.clip(logits, 0) - logits * conf_t +
               jnp.log1p(jnp.exp(-jnp.abs(logits))))
        # balance fg/bg
        fg = conf_t > 0.5
        n_fg = jnp.maximum(jnp.sum(fg), 1)
        n_bg = jnp.maximum(jnp.sum(~fg), 1)
        conf_loss = (jnp.sum(jnp.where(fg, bce, 0.)) / n_fg +
                     jnp.sum(jnp.where(~fg, bce, 0.)) / n_bg)

        offset_loss = jnp.sum(
            jnp.where(fg, jnp.abs(preds["offset"] - offset_t), 0.)) / n_fg
        height_loss = jnp.sum(
            jnp.where(fg, jnp.abs(preds["height"] - height_t), 0.)) / n_fg

        # discriminative embedding loss (pull to instance mean, push means)
        def embed_one(emb, inst):
            max_inst = 8
            ids = jnp.arange(1, max_inst + 1)
            masks = inst[None] == ids[:, None, None]  # [I, Hb, Wb]
            counts = jnp.maximum(jnp.sum(masks, axis=(1, 2)), 1)
            means = jnp.einsum("ihw,hwc->ic", masks.astype(emb.dtype),
                               emb) / counts[:, None]
            pull = jnp.sum(
                masks[..., None] *
                jnp.maximum(jnp.abs(emb[None] - means[:, None, None]) -
                            self.pull_margin, 0.) ** 2) / jnp.sum(counts)
            valid = jnp.sum(masks, axis=(1, 2)) > 0
            diff = means[:, None] - means[None, :]
            # eps inside the sqrt: norm at 0 has a NaN gradient otherwise
            dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-8)
            pair = valid[:, None] & valid[None, :] & \
                (jnp.eye(max_inst) == 0)
            push = jnp.sum(jnp.where(
                pair, jnp.maximum(self.push_margin - dist, 0.) ** 2,
                0.)) / jnp.maximum(jnp.sum(pair), 1)
            return pull + push

        embed_loss = jnp.mean(jax.vmap(embed_one)(preds["embed"], inst_t))
        total = conf_loss + offset_loss + height_loss + embed_loss
        return {"loss": total, "loss_conf": conf_loss,
                "loss_offset": offset_loss, "loss_height": height_loss,
                "loss_embed": embed_loss}

    def test_forward(self, batch) -> dict:
        preds = self._bev_preds(batch)
        return {
            "lane_conf": jax.nn.sigmoid(preds["conf"]),
            "lane_offset": preds["offset"],
            "lane_height": preds["height"],
            "lane_embed": preds["embed"],
        }

    @staticmethod
    def postprocess_to_samples(outputs: dict, metas: list) -> list:
        conf = np.asarray(outputs["lane_conf"])
        results = []
        for i, meta in enumerate(metas):
            s = Sample(path=meta.get("path"), modality="image")
            s.lane_conf = conf[i]
            s.lane_offset = np.asarray(outputs["lane_offset"])[i]
            s.lane_embed = np.asarray(outputs["lane_embed"])[i]
            s.meta.update({k: v for k, v in meta.items() if k != "path"})
            results.append(s)
        return results
