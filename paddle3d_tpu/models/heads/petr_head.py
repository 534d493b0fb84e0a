"""PETR head (reference: paddle3d/models/heads/dense_heads/petr_head.py:131).

3D position-embedding DETR head: camera frustum points are lifted to lidar
space through per-camera img2lidar matrices, encoded by an MLP into a 3D PE
added to image tokens; learned 3D reference-point queries attend over all
camera tokens with vanilla MHA; per-layer cls/reg branches are supervised
through Hungarian matching.
"""
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...apis import manager
from ...models.losses.weighted_loss import sigmoid_focal_loss
from .target_assigners import HungarianAssigner3D

__all__ = ["PETRHead"]


def pos2posemb3d(pos: jnp.ndarray, num_feats: int = 128,
                 temperature: int = 10000) -> jnp.ndarray:
    """[..., 3] normalized positions -> [..., 3 * num_feats] sine embedding."""
    scale = 2 * math.pi
    pos = pos * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    out = []
    for i in range(3):
        p = pos[..., i:i + 1] / dim_t
        emb = jnp.concatenate(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1)
        out.append(emb)
    return jnp.concatenate(out, axis=-1)


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


@manager.HEADS.add_component
class PETRHead(nnx.Module):
    def __init__(self,
                 num_classes: int = 10,
                 in_channels: int = 256,
                 embed_dims: int = 256,
                 num_query: int = 900,
                 num_heads: int = 8,
                 num_layers: int = 6,
                 depth_num: int = 64,
                 depth_start: float = 1.0,
                 position_range: Sequence[float] = (-61.2, -61.2, -10.0,
                                                    61.2, 61.2, 10.0),
                 pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2,
                                              51.2, 3.0),
                 code_size: int = 10,
                 code_weights: Sequence[float] = None,
                 cls_weight: float = 2.0,
                 reg_weight: float = 0.25,
                 transformer: dict = None,
                 positional_encoding=None,
                 bbox_coder=None,
                 loss_cls=None,
                 loss_bbox=None,
                 with_time: bool = False,
                 with_denoise: bool = False,
                 scalar: int = 10,
                 noise_scale: float = 1.0,
                 dn_weight: float = 1.0,
                 rngs: nnx.Rngs = None,
                 **folded):
        # reference-YAML portability (petr_head.py:131): the nested
        # transformer spec supplies decoder depth/dims; loss objects supply
        # the weights; the NMSFreeCoder drives predict(). Design-folded
        # reference knobs (LID, with_multiview, with_position, with_fpe,
        # with_multi, normedlinear, dropout rates) arrive via **folded —
        # LID depth sampling and multiview PE are this head's defaults.
        del folded
        if transformer:
            dec = transformer.get("decoder", {}) or {}
            num_layers = dec.get("num_layers", num_layers)
            embed_dims = transformer.get(
                "decoder_embed_dims", transformer.get("embed_dims",
                                                      embed_dims))
            tl = dec.get("transformerlayers", {}) or {}
            attns = tl.get("attns") or []
            for a in attns:
                h = getattr(getattr(a, "attn", None), "num_heads", None)
                if h:
                    num_heads = h
                    break
        if loss_cls is not None:
            cls_weight = getattr(loss_cls, "loss_weight", cls_weight)
        if loss_bbox is not None:
            reg_weight = getattr(loss_bbox, "loss_weight", reg_weight)
        if bbox_coder is not None and getattr(bbox_coder, "pc_range", None):
            pc_range = bbox_coder.pc_range
        self.bbox_coder = bbox_coder

        def _plain(v):
            # keep only array-free plain data (built sub-modules inside a
            # spec dict would otherwise land in an nnx static attribute)
            if isinstance(v, dict):
                out = {k: _plain(x) for k, x in v.items()}
                return {k: x for k, x in out.items() if x is not None}
            if isinstance(v, (list, tuple)):
                kept = [_plain(x) for x in v]
                return [x for x in kept if x is not None] or None
            return v if isinstance(v, (int, float, str, bool,
                                       type(None))) else None

        self.transformer_spec = _plain(transformer) if transformer else None
        self.with_time = with_time
        self.with_denoise = with_denoise
        self.dn_params = dict(groups=int(scalar),
                              box_noise_scale=float(noise_scale))
        self.dn_weight = float(dn_weight)
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.num_classes = num_classes
        self.embed_dims = embed_dims
        self.num_query = num_query
        self.depth_num = depth_num
        self.depth_start = depth_start
        self.position_range = list(map(float, position_range))
        self.pc_range = list(map(float, pc_range))
        self.code_size = code_size
        self.code_weights = list(code_weights) if code_weights else \
            [1.0] * 8 + [0.2] * (code_size - 8)
        self.cls_weight = cls_weight
        self.reg_weight = reg_weight
        self.num_layers = num_layers

        self.input_proj = nnx.Conv(in_channels, embed_dims, kernel_size=(1, 1),
                                   rngs=rngs)
        # 3D position encoder: D*3 frustum coords -> embed
        self.position_encoder = nnx.Sequential(
            nnx.Linear(depth_num * 3, embed_dims * 4, rngs=rngs), nnx.relu,
            nnx.Linear(embed_dims * 4, embed_dims, rngs=rngs))
        # learned reference points in [0,1]^3
        self.reference_points = nnx.Param(
            jax.random.uniform(rngs.params(), (num_query, 3)))
        self.query_embedding = nnx.Sequential(
            nnx.Linear(embed_dims * 3 // 2, embed_dims, rngs=rngs), nnx.relu,
            nnx.Linear(embed_dims, embed_dims, rngs=rngs))

        from ..transformers.transformer_layers import (BaseTransformerLayer,
                                                       MultiHeadAttention,
                                                       TransformerLayerSequence)
        layers = [
            BaseTransformerLayer(
                attns=[MultiHeadAttention(embed_dims, num_heads, rngs=rngs),
                       MultiHeadAttention(embed_dims, num_heads, rngs=rngs)],
                embed_dims=embed_dims,
                feedforward_channels=embed_dims * 4,
                operation_order=("self_attn", "norm", "cross_attn", "norm",
                                 "ffn", "norm"),
                rngs=rngs) for _ in range(num_layers)
        ]
        self.decoder = TransformerLayerSequence(
            layers, return_intermediate=True, post_norm=True,
            embed_dims=embed_dims, rngs=rngs)

        self.cls_branch = nnx.Sequential(
            nnx.Linear(embed_dims, embed_dims, rngs=rngs), nnx.relu,
            nnx.Linear(embed_dims, num_classes,
                       bias_init=nnx.initializers.constant(-2.19), rngs=rngs))
        self.reg_branch = nnx.Sequential(
            nnx.Linear(embed_dims, embed_dims, rngs=rngs), nnx.relu,
            nnx.Linear(embed_dims, code_size, rngs=rngs))

        self.assigner = HungarianAssigner3D()

    # ----------------------------------------------------------- 3D position
    def _position_embedding(self, feats, img2lidars):
        """feats [B, N, h, w, C]; img2lidars [B, N, 4, 4] -> PE same shape."""
        b, n, h, w, _ = feats.shape
        pr = self.position_range
        # frustum: pixel centers at feature stride x depth bins (LID)
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        d_idx = jnp.arange(self.depth_num, dtype=jnp.float32)
        bin_size = 2 * (pr[3] - self.depth_start) / (
            self.depth_num * (1 + self.depth_num))
        depths = self.depth_start + bin_size * d_idx * (d_idx + 1) / 2  # LID

        # normalized pixel -> actual pixel coords are folded into img2lidar
        # (the dataset provides img2lidar for normalized [0,1] image coords)
        grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")  # [h, w]
        pts = jnp.stack([
            grid_x[None, :, :] * depths[:, None, None],
            grid_y[None, :, :] * depths[:, None, None],
            jnp.broadcast_to(depths[:, None, None],
                             (self.depth_num, h, w)),
            jnp.ones((self.depth_num, h, w)),
        ], axis=-1)  # [D, h, w, 4]

        def lift(mat):
            return jnp.einsum("ij,dhwj->dhwi", mat, pts)[..., :3]

        coords = jax.vmap(jax.vmap(lift))(img2lidars)  # [B, N, D, h, w, 3]
        lo = jnp.asarray(pr[:3])
        hi = jnp.asarray(pr[3:])
        coords = (coords - lo) / (hi - lo)
        coords = jnp.clip(coords, 0., 1.)
        coords = coords.transpose(0, 1, 3, 4, 2, 5).reshape(
            b, n, h, w, self.depth_num * 3)
        return self.position_encoder(coords)

    # --------------------------------------------------------------- forward
    def __call__(self, feats, img2lidars, dn_ref=None, attn_mask=None):
        """feats [B, N, h, w, Cin]; -> (all_cls [L,B,Q,C], all_bbox
        [L,B,Q,code_size] decoded boxes). When `dn_ref` [B, Qdn, 3] is
        given, denoising queries are appended after the matching queries
        and `attn_mask` [Qt, Qt] (True = allowed) gates self-attention
        (reference: cape_dn_head.py prepare_for_dn)."""
        b, n, h, w, _ = feats.shape
        x = self.input_proj(feats)
        pe = self._position_embedding(x, img2lidars)
        tokens = x.reshape(b, n * h * w, self.embed_dims)
        key_pos = pe.reshape(b, n * h * w, self.embed_dims)
        return self._decode(tokens, key_pos, dn_ref=dn_ref,
                            attn_mask=attn_mask)

    def decode_over_tokens(self, tokens, token_shape=None):
        """DETR decode over pre-encoded tokens (e.g. BEVFormer BEV tokens)
        — no camera position embedding."""
        return self._decode(tokens, None)

    def query_reference_points(self, batch_size: int, dn_ref=None):
        """[B, Qt, 3] matching (+ appended DN) reference points in [0,1]."""
        ref = jax.nn.sigmoid(inverse_sigmoid(
            jnp.clip(self.reference_points[...], 1e-3, 1 - 1e-3)))
        ref = jnp.broadcast_to(ref[None], (batch_size,) + ref.shape)
        if dn_ref is not None:
            ref = jnp.concatenate([ref, dn_ref.astype(ref.dtype)], axis=1)
        return ref

    def _decode(self, tokens, key_pos, dn_ref=None, attn_mask=None):
        b = tokens.shape[0]
        ref = self.query_reference_points(b, dn_ref)  # [B, Qt, 3]
        query_pos = self.query_embedding(
            pos2posemb3d(ref, self.embed_dims // 2))
        query = jnp.zeros((b, ref.shape[1], self.embed_dims))

        inter = self.decoder(query, key=tokens, value=tokens,
                             query_pos=query_pos, key_pos=key_pos,
                             attn_masks=attn_mask)
        # inter: [L, B, Q, C]
        all_cls = []
        all_bbox = []
        pc = self.pc_range
        for lvl in range(inter.shape[0]):
            feats_l = inter[lvl]
            cls = self.cls_branch(feats_l)
            reg = self.reg_branch(feats_l)
            ref_inv = inverse_sigmoid(ref)  # [B, Qt, 3]
            cx = jax.nn.sigmoid(reg[..., 0:1] + ref_inv[..., 0:1])
            cy = jax.nn.sigmoid(reg[..., 1:2] + ref_inv[..., 1:2])
            cz = jax.nn.sigmoid(reg[..., 4:5] + ref_inv[..., 2:3])
            cx = cx * (pc[3] - pc[0]) + pc[0]
            cy = cy * (pc[4] - pc[1]) + pc[1]
            cz = cz * (pc[5] - pc[2]) + pc[2]
            # layout: [cx, cy, w, l, cz, h, sin, cos, vx, vy] (reference
            # normalize_bbox order) -> emit [cx, cy, cz, w, l, h, sin, cos,
            # vx, vy]
            rest = reg[..., 2:4]
            bbox = jnp.concatenate(
                [cx, cy, cz, rest, reg[..., 5:6], reg[..., 6:]], axis=-1)
            all_cls.append(cls)
            all_bbox.append(bbox)
        return jnp.stack(all_cls), jnp.stack(all_bbox)

    # ------------------------------------------------------------------ loss
    def _encode_gt(self, gt_boxes):
        """[G, 7|9] raw boxes -> [G, code_size] target encoding
        [cx, cy, cz, log w, log l, log h, sin, cos, (vx, vy)]."""
        logs = jnp.log(jnp.clip(gt_boxes[:, 3:6], 1e-3))
        yaw = gt_boxes[:, 6]
        parts = [gt_boxes[:, :3], logs, jnp.sin(yaw)[:, None],
                 jnp.cos(yaw)[:, None]]
        if self.code_size > 8:
            if gt_boxes.shape[-1] > 7:
                parts.append(gt_boxes[:, 7:9])
            else:
                parts.append(jnp.zeros((gt_boxes.shape[0], 2)))
        return jnp.concatenate(parts, axis=-1)

    def loss(self, all_cls, all_bbox, gt_boxes, gt_labels,
             dn_meta=None) -> dict:
        """gt_boxes [B, G, 7|9] (bottom-z converted to center by caller);
        gt_labels [B, G] (-1 pad). When `dn_meta` is given (denoising
        training, heads/denoising.py) the query axis is split: the first
        num_query columns get the Hungarian loss, the rest the
        known-assignment DN loss (reference: cape_dn_head.py
        dn_loss_single)."""
        dn_losses = None
        if dn_meta is not None:
            from .denoising import dn_loss as _dn_loss
            dn_cls = all_cls[:, :, self.num_query:]
            dn_bbox = all_bbox[:, :, self.num_query:]
            all_cls = all_cls[:, :, :self.num_query]
            all_bbox = all_bbox[:, :, :self.num_query]
            gt_enc = jax.vmap(self._encode_gt)(gt_boxes)
            dn_losses = _dn_loss(dn_cls, dn_bbox, dn_meta, gt_enc,
                                 self.code_weights, self.num_classes)
        total_cls = 0.
        total_reg = 0.
        cw = jnp.asarray(self.code_weights)
        for lvl in range(all_cls.shape[0]):
            cls_l, bbox_l = all_cls[lvl], all_bbox[lvl]

            def one(cls_q, bbox_q, gt_b, gt_l):
                gt_enc = self._encode_gt(gt_b)
                pred_enc = jnp.concatenate(
                    [bbox_q[:, :3],
                     bbox_q[:, 3:6],
                     bbox_q[:, 6:]], axis=-1)
                assigned, is_fg = self.assigner.assign(
                    pred_enc, cls_q, gt_enc, gt_l)
                safe = jnp.clip(assigned, 0)
                tgt_label = jnp.where(is_fg, gt_l[safe], self.num_classes)
                onehot = jax.nn.one_hot(tgt_label, self.num_classes + 1)[
                    :, :self.num_classes]
                num_fg = jnp.maximum(jnp.sum(is_fg), 1)
                cls_loss = jnp.sum(
                    sigmoid_focal_loss(cls_q, onehot)) / num_fg
                tgt_box = gt_enc[safe]
                reg_l1 = jnp.abs(pred_enc - tgt_box) * cw[None, :]
                reg_loss = jnp.sum(
                    jnp.where(is_fg[:, None], reg_l1, 0.)) / num_fg
                return cls_loss, reg_loss

            cls_loss, reg_loss = jax.vmap(one)(cls_l, bbox_l, gt_boxes,
                                               gt_labels)
            total_cls = total_cls + jnp.mean(cls_loss)
            total_reg = total_reg + jnp.mean(reg_loss)
        out = {
            "loss_cls": self.cls_weight * total_cls,
            "loss_bbox": self.reg_weight * total_reg,
        }
        if dn_losses is not None:
            out["loss_cls_dn"] = self.cls_weight * dn_losses[0]
            out["loss_bbox_dn"] = self.reg_weight * dn_losses[1]
        out["loss"] = sum(v for v in out.values())
        return out

    # --------------------------------------------------------------- predict
    def predict(self, all_cls, all_bbox, max_num: int = 300,
                score_threshold: float = 0.0) -> dict:
        """Last-layer NMS-free decode -> fixed [B, K] outputs."""
        if self.bbox_coder is not None:
            max_num = getattr(self.bbox_coder, "max_num", max_num)
            score_threshold = (getattr(self.bbox_coder, "score_threshold",
                                       None) or score_threshold)
        cls, bbox = all_cls[-1], all_bbox[-1]  # [B, Q, C], [B, Q, D]

        def one(cls_q, bbox_q):
            scores = jax.nn.sigmoid(cls_q).reshape(-1)  # [Q*C]
            k = min(max_num, scores.shape[0])
            top_scores, idx = jax.lax.top_k(scores, k)
            qi = idx // self.num_classes
            labels = idx % self.num_classes
            box = bbox_q[qi]
            yaw = jnp.arctan2(box[:, 6], box[:, 7])
            dims = jnp.exp(box[:, 3:6])
            cols = [box[:, 0:2], (box[:, 2] - dims[:, 2] / 2)[:, None],
                    dims, yaw[:, None]]
            if self.code_size > 8:
                cols.append(box[:, 8:10])
            out_box = jnp.concatenate(cols, axis=-1)
            # emit (x, y, z_bottom, w, l, h, yaw, [vx, vy])
            valid = top_scores > score_threshold
            return (out_box, jnp.where(valid, top_scores, -1.),
                    jnp.where(valid, labels, -1))

        boxes, scores, labels = jax.vmap(one)(cls, bbox)
        # reorder dims: currently (x, y, zb, w, l, h, yaw, ...)
        return {"box3d_lidar": boxes, "scores": scores,
                "label_preds": labels}
