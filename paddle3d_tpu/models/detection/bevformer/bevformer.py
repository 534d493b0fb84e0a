"""BEVFormer (reference: paddle3d/models/detection/bevformer/bevformer.py:39,
bevformer_head.py:72, transformers/encoders.py:30, transformer.py:52).

Encoder layers alternate temporal self-attention (deformable over
[prev_bev, bev]) and spatial cross-attention (deformable over camera
tokens); a DETR decoder with learned queries predicts boxes supervised by
Hungarian matching (the PETR head machinery is reused for the decoder +
loss + NMS-free decode). Temporal BEV state is explicit batch state
(`prev_bev`), not module attributes (reference keeps prev_frame_info on the
module, bevformer.py:52-57 — SURVEY.md §7 hard part 7).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....apis import manager
from ...base.base_model import BaseMultiViewModel
from ...transformers.attentions import (SpatialCrossAttention,
                                        TemporalSelfAttention)
from ...transformers.transformer_layers import FFN
from ..petr.petr3d import PETR

__all__ = ["BEVFormer", "BEVFormerEncoderLayer"]


class BEVFormerEncoderLayer(nnx.Module):
    """(reference: transformers/encoder_layers.py:145)."""

    def __init__(self, embed_dims, num_heads, pc_range, *, rngs):
        self.tsa = TemporalSelfAttention(embed_dims, num_heads, num_levels=1,
                                         rngs=rngs)
        self.sca = SpatialCrossAttention(embed_dims, num_heads,
                                         pc_range=pc_range, rngs=rngs)
        self.norm1 = nnx.LayerNorm(embed_dims, rngs=rngs)
        self.norm2 = nnx.LayerNorm(embed_dims, rngs=rngs)
        self.norm3 = nnx.LayerNorm(embed_dims, rngs=rngs)
        self.ffn = FFN(embed_dims, embed_dims * 4, rngs=rngs)

    def __call__(self, bev, cam_tokens, bev_ref, cam_shapes, lidar2imgs,
                 prev_bev, bev_shape):
        x = bev + self.tsa(bev, reference_points=jnp.broadcast_to(
            bev_ref[None], (bev.shape[0],) + bev_ref.shape),
            spatial_shapes=(bev_shape,), prev_bev=prev_bev)
        x = self.norm1(x)
        x = x + self.sca(x, cam_tokens, bev_ref, lidar2imgs, cam_shapes)
        x = self.norm2(x)
        return self.norm3(self.ffn(x))


@manager.MODELS.add_component
class BEVFormer(BaseMultiViewModel):
    def __init__(self,
                 backbone,
                 neck,
                 head,
                 bev_h: int = 50,
                 bev_w: int = 50,
                 embed_dims: int = 256,
                 num_heads: int = 8,
                 encoder_layers: int = 3,
                 pc_range: Sequence[float] = (-51.2, -51.2, -5., 51.2, 51.2,
                                              3.),
                 pretrained: str = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.backbone = backbone
        self.neck = neck
        self.head = head  # a PETRHead-style decoder head over BEV tokens
        self.bev_h = bev_h
        self.bev_w = bev_w
        self.embed_dims = embed_dims
        self.pc_range = list(map(float, pc_range))

        self.bev_embedding = nnx.Param(
            jax.random.normal(rngs.params(), (bev_h * bev_w, embed_dims)) *
            0.02)
        self.cam_proj = nnx.Linear(
            self.neck_out_channels(neck, backbone), embed_dims, rngs=rngs)
        self.encoder = nnx.List([
            BEVFormerEncoderLayer(embed_dims, num_heads, self.pc_range,
                                  rngs=rngs)
            for _ in range(encoder_layers)
        ])

    @staticmethod
    def neck_out_channels(neck, backbone):
        for attr in ("out_channels",):
            v = getattr(neck, attr, None) if neck is not None else None
            if isinstance(v, int):
                return v
        return backbone.out_channels[-1] if hasattr(backbone,
                                                    "out_channels") else 256

    def get_bev_features(self, imgs, lidar2imgs, prev_bev=None):
        b, n, h, w, c = imgs.shape
        feats = self.backbone(imgs.reshape(b * n, h, w, c))
        if self.neck is not None:
            feats = self.neck(feats)
        f = feats[0] if isinstance(feats, (tuple, list)) else feats
        _, fh, fw, fc = f.shape
        cam_tokens = self.cam_proj(f.reshape(b, n, fh * fw, fc))

        ys = (jnp.arange(self.bev_h) + 0.5) / self.bev_h
        xs = (jnp.arange(self.bev_w) + 0.5) / self.bev_w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        bev_ref = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)

        bev = jnp.broadcast_to(self.bev_embedding[...][None],
                               (b, self.bev_h * self.bev_w,
                                self.embed_dims))
        if prev_bev is None:
            prev_bev = bev
        for layer in self.encoder:
            bev = layer(bev, cam_tokens, bev_ref, ((fh, fw),), lidar2imgs,
                        prev_bev, (self.bev_h, self.bev_w))
        return bev

    def train_forward(self, batch) -> dict:
        bev = self.get_bev_features(batch["img"], batch["lidar2imgs"],
                                    batch.get("prev_bev"))
        all_cls, all_bbox = self.head.decode_over_tokens(
            bev, (self.bev_h, self.bev_w))
        gt_boxes = batch["gt_boxes"]
        gt_boxes = gt_boxes.at[..., 2].add(gt_boxes[..., 5] / 2)
        return self.head.loss(all_cls, all_bbox, gt_boxes,
                              batch["gt_labels"])

    def test_forward(self, batch) -> dict:
        bev = self.get_bev_features(batch["img"], batch["lidar2imgs"],
                                    batch.get("prev_bev"))
        all_cls, all_bbox = self.head.decode_over_tokens(
            bev, (self.bev_h, self.bev_w))
        out = self.head.predict(all_cls, all_bbox)
        out["bev_feature"] = bev  # temporal carry for video mode
        return out

    postprocess_to_samples = staticmethod(PETR.postprocess_to_samples)
