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
                 prev_bev, bev_shape, shift=None):
        x = bev + self.tsa(bev, reference_points=jnp.broadcast_to(
            bev_ref[None], (bev.shape[0],) + bev_ref.shape),
            spatial_shapes=(bev_shape,), prev_bev=prev_bev, shift=shift)
        x = self.norm1(x)
        x = x + self.sca(x, cam_tokens, bev_ref, lidar2imgs, cam_shapes)
        x = self.norm2(x)
        return self.norm3(self.ffn(x))


@manager.MODELS.add_component
class BEVFormer(BaseMultiViewModel):
    def __init__(self,
                 backbone,
                 neck,
                 head=None,
                 pts_bbox_head=None,
                 bev_h: int = 50,
                 bev_w: int = 50,
                 embed_dims: int = 256,
                 num_heads: int = 8,
                 encoder_layers: int = 3,
                 pc_range: Sequence[float] = (-51.2, -51.2, -5., 51.2, 51.2,
                                              3.),
                 video_test_mode: bool = None,
                 use_grid_mask: bool = False,
                 pretrained: str = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        # reference-YAML surface: the BEVFormerHead carries bev_h/bev_w and
        # the PerceptionTransformer spec (encoder depth, pc_range); the
        # model reads them off the built head (bevformer.py:39 + head cfg)
        del video_test_mode, use_grid_mask  # folded: eval threads prev_bev
        head = head if head is not None else pts_bbox_head
        if getattr(head, "bev_h", None):
            bev_h, bev_w = head.bev_h, head.bev_w
        spec = getattr(head, "transformer_spec", None)
        if spec:
            embed_dims = spec.get("embed_dims", embed_dims)
            enc = spec.get("encoder", {}) or {}
            encoder_layers = enc.get("num_layers", encoder_layers)
            pc_range = enc.get("point_cloud_range", pc_range)
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
        # can-bus signal embedding added to the BEV queries (reference:
        # transformer.py can_bus_mlp, use_can_bus)
        self.can_bus_mlp = nnx.Sequential(
            nnx.Linear(18, embed_dims // 2, rngs=rngs), nnx.relu,
            nnx.Linear(embed_dims // 2, embed_dims, rngs=rngs), nnx.relu,
            nnx.LayerNorm(embed_dims, rngs=rngs))
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

    # -------------------------------------------------- ego-motion alignment
    def _rotate_prev_bev(self, prev_bev, angles):
        """Rotate each sample's BEV map by its yaw delta (reference:
        transformer.py:198-210 `rotate(prev_bev, can_bus[-1])`). angles [B]
        in radians; prev_bev [B, H*W, C]. Bilinear resample around the map
        center — pure gather program, no host round-trip."""
        h, w = self.bev_h, self.bev_w
        b = prev_bev.shape[0]
        maps = prev_bev.reshape(b, h, w, -1)
        yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

        def one(m, a):
            # inverse-rotate output coords to source coords
            cos, sin = jnp.cos(-a), jnp.sin(-a)
            sx = cx + cos * (xx - cx) - sin * (yy - cy)
            sy = cy + sin * (xx - cx) + cos * (yy - cy)
            x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
            y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
            x1 = jnp.clip(x0 + 1, 0, w - 1)
            y1 = jnp.clip(y0 + 1, 0, h - 1)
            fx = jnp.clip(sx - x0, 0., 1.)[..., None]
            fy = jnp.clip(sy - y0, 0., 1.)[..., None]
            out = (m[y0, x0] * (1 - fx) * (1 - fy) +
                   m[y0, x1] * fx * (1 - fy) +
                   m[y1, x0] * (1 - fx) * fy +
                   m[y1, x1] * fx * fy)
            inside = ((sx >= 0) & (sx <= w - 1) &
                      (sy >= 0) & (sy <= h - 1))[..., None]
            return jnp.where(inside, out, 0.)

        return jax.vmap(one)(maps, angles).reshape(b, h * w, -1)

    def _can_bus_shift(self, can_bus):
        """Normalized BEV-grid shift of the ego between frames (reference:
        transformer.py:142-186). can_bus [B, 18]: [0]=dx, [1]=dy (meters,
        current-frame minus previous), [-2]=ego yaw (rad), [-1]=yaw delta
        (rad)."""
        dx, dy = can_bus[:, 0], can_bus[:, 1]
        ego_angle = can_bus[:, -2]
        grid_len_y = (self.pc_range[4] - self.pc_range[1]) / self.bev_h
        grid_len_x = (self.pc_range[3] - self.pc_range[0]) / self.bev_w
        translation = jnp.sqrt(dx ** 2 + dy ** 2)
        trans_angle = jnp.arctan2(dy, dx)
        bev_angle = ego_angle - trans_angle
        shift_y = translation * jnp.cos(bev_angle) / grid_len_y / self.bev_h
        shift_x = translation * jnp.sin(bev_angle) / grid_len_x / self.bev_w
        return jnp.stack([shift_x, shift_y], axis=-1)  # [B, 2]

    def get_bev_features(self, imgs, lidar2imgs, prev_bev=None,
                         can_bus=None):
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
        shift = None
        if can_bus is not None:
            # BEV queries carry the can-bus embedding (reference
            # transformer.py use_can_bus)
            bev = bev + self.can_bus_mlp(
                can_bus.astype(bev.dtype))[:, None, :]
            if prev_bev is not None:
                # align prev_bev to the current ego frame: rotate by the
                # yaw delta, shift the sampling grid by the translation
                prev_bev = self._rotate_prev_bev(prev_bev, can_bus[:, -1])
                shift = self._can_bus_shift(can_bus)
        if prev_bev is None:
            prev_bev = bev
        for layer in self.encoder:
            bev = layer(bev, cam_tokens, bev_ref, ((fh, fw),), lidar2imgs,
                        prev_bev, (self.bev_h, self.bev_w), shift=shift)
        return bev

    def obtain_history_bev(self, img_queue, lidar2imgs_queue,
                           can_bus_queue=None):
        """No-grad BEV warmup over the history queue (reference:
        bevformer.py:127-151): run the encoder frame by frame, each step
        aligned to the previous BEV; gradients are cut so only the current
        frame trains."""
        t = img_queue.shape[1]
        prev_bev = None
        for i in range(t):
            cb = (can_bus_queue[:, i]
                  if can_bus_queue is not None else None)
            prev_bev = self.get_bev_features(
                img_queue[:, i], lidar2imgs_queue[:, i], prev_bev, cb)
        return jax.lax.stop_gradient(prev_bev)

    def train_forward(self, batch) -> dict:
        prev_bev = batch.get("prev_bev")
        if prev_bev is None and "img_queue" in batch:
            prev_bev = self.obtain_history_bev(
                batch["img_queue"], batch["lidar2imgs_queue"],
                batch.get("can_bus_queue"))
        bev = self.get_bev_features(batch["img"], batch["lidar2imgs"],
                                    prev_bev, batch.get("can_bus"))
        all_cls, all_bbox = self.head.decode_over_tokens(
            bev, (self.bev_h, self.bev_w))
        gt_boxes = batch["gt_boxes"]
        gt_boxes = gt_boxes.at[..., 2].add(gt_boxes[..., 5] / 2)
        return self.head.loss(all_cls, all_bbox, gt_boxes,
                              batch["gt_labels"])

    def test_forward(self, batch) -> dict:
        bev = self.get_bev_features(batch["img"], batch["lidar2imgs"],
                                    batch.get("prev_bev"),
                                    batch.get("can_bus"))
        all_cls, all_bbox = self.head.decode_over_tokens(
            bev, (self.bev_h, self.bev_w))
        out = self.head.predict(all_cls, all_bbox)
        out["bev_feature"] = bev  # temporal carry for video mode
        return out

    postprocess_to_samples = staticmethod(PETR.postprocess_to_samples)
