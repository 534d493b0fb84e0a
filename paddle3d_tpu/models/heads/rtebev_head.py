"""RTEBev head (reference: paddle3d/models/detection/rtebev/rtebev_head.py:43
+ models/transformers/transformer.py:396 RTEBevTransformer).

Hybrid-matching (H-DETR style) NMS-free query head over a single-level BEV
feature map: `num_queries_one2one` queries get standard Hungarian one-to-one
supervision; the remaining queries are supervised one-to-many against the GT
set repeated `k_one2many` times. A block-diagonal self-attention mask keeps
the two groups from attending to each other (rtebev_head.py:258-266).
Inference uses only the one2one queries, decoded NMS-free.

TPU-native: the decoder cross-attention is the static-shape bilinear-gather
deformable attention (ops/ms_deform_attn.py); queries/gt are fixed-capacity
padded, the one2many repetition is a static tile of the padded GT tensors.
"""
import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ...models.losses.weighted_loss import sigmoid_focal_loss
from ..transformers.attentions import MSDeformableAttention
from ..transformers.transformer_layers import FFN, MultiHeadAttention
from .petr_head import inverse_sigmoid, pos2posemb3d
from .target_assigners import HungarianAssigner3D

__all__ = ["RTEBevHead"]


class _RTEBevDecoderLayer(nnx.Module):
    """self_attn (masked MHA) -> norm -> deformable cross_attn over BEV ->
    norm -> ffn -> norm (reference config: DetrTransformerDecoderLayer with
    [MultiheadAttention, CustomMSDeformableAttention])."""

    def __init__(self, embed_dims, num_heads, feedforward_channels,
                 num_points=4, rngs=None):
        self.self_attn = MultiHeadAttention(embed_dims, num_heads, rngs=rngs)
        self.cross_attn = MSDeformableAttention(
            embed_dims, num_heads, num_levels=1, num_points=num_points,
            rngs=rngs)
        self.norms = nnx.List(
            [nnx.LayerNorm(embed_dims, rngs=rngs) for _ in range(3)])
        self.ffn = FFN(embed_dims, feedforward_channels, rngs=rngs)

    def __call__(self, query, bev_tokens, query_pos, ref_2d, spatial_shapes,
                 attn_mask=None):
        query = query + self.self_attn(query, query, query,
                                       query_pos=query_pos,
                                       key_pos=query_pos,
                                       attn_mask=attn_mask)
        query = self.norms[0](query)
        query = query + self.cross_attn(query + query_pos, bev_tokens,
                                        ref_2d, spatial_shapes)
        query = self.norms[1](query)
        query = self.norms[2](self.ffn(query))
        return query


@manager.HEADS.add_component
class RTEBevHead(nnx.Module):
    def __init__(self,
                 num_classes: int = 10,
                 in_channels: int = 256,
                 embed_dims: int = 256,
                 num_query: int = 1536,
                 num_queries_one2one: int = 512,
                 k_one2many: int = 4,
                 lambda_one2many: float = 1.0,
                 num_layers: int = 2,
                 num_heads: int = 8,
                 feedforward_channels: int = 512,
                 bev_h: int = 128,
                 bev_w: int = 128,
                 pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
                 code_size: int = 10,
                 code_weights=None,
                 cls_weight: float = 2.0,
                 reg_weight: float = 0.25,
                 transformer: dict = None,
                 bbox_coder=None,
                 rngs: nnx.Rngs = None,
                 **unused):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        # reference-YAML portability: pull decoder dims out of a nested
        # `transformer:` dict when given (rtebev_head.py:151 transformer cfg)
        if transformer:
            embed_dims = transformer.get("embed_dims", embed_dims)
            dec = transformer.get("decoder", {}) or {}
            num_layers = dec.get("num_layers", num_layers)
            tl = dec.get("transformerlayers", {}) or {}
            feedforward_channels = tl.get("feedforward_channels",
                                          feedforward_channels)
        if bbox_coder is not None and hasattr(bbox_coder, "pc_range") and \
                bbox_coder.pc_range:
            pc_range = bbox_coder.pc_range
        self.bbox_coder = bbox_coder
        self.num_classes = num_classes
        self.embed_dims = embed_dims
        self.num_query = num_query
        self.num_queries_one2one = num_queries_one2one
        self.k_one2many = k_one2many
        self.lambda_one2many = float(lambda_one2many)
        self.bev_h, self.bev_w = bev_h, bev_w
        self.pc_range = list(map(float, pc_range))
        self.code_size = code_size
        self.code_weights = list(code_weights) if code_weights else \
            [1.0] * 8 + [0.2] * (code_size - 8)
        self.cls_weight = cls_weight
        self.reg_weight = reg_weight

        self.input_proj = (nnx.Linear(in_channels, embed_dims, rngs=rngs)
                           if in_channels != embed_dims else None)
        # learned 3D reference points, split one2one / one2many
        # (rtebev_head.py:199-201)
        self.reference_points = nnx.Param(
            jax.random.uniform(rngs.params(), (num_queries_one2one, 3)))
        n_12m = num_query - num_queries_one2one
        self.reference_points_12m = nnx.Param(
            jax.random.uniform(rngs.params(), (max(n_12m, 1), 3)))
        self.query_embedding = nnx.Sequential(
            nnx.Linear(embed_dims * 3 // 2, embed_dims, rngs=rngs), nnx.relu,
            nnx.Linear(embed_dims, embed_dims, rngs=rngs))

        self.layers = nnx.List([
            _RTEBevDecoderLayer(embed_dims, num_heads, feedforward_channels,
                                rngs=rngs) for _ in range(num_layers)
        ])
        # shared branches across layers (with_box_refine=False in the
        # published configs, rtebev_head.py:190)
        self.cls_branch = nnx.Sequential(
            nnx.Linear(embed_dims, embed_dims, rngs=rngs),
            nnx.LayerNorm(embed_dims, rngs=rngs), nnx.relu,
            nnx.Linear(embed_dims, embed_dims, rngs=rngs),
            nnx.LayerNorm(embed_dims, rngs=rngs), nnx.relu,
            nnx.Linear(embed_dims, num_classes,
                       bias_init=nnx.initializers.constant(-2.19), rngs=rngs))
        self.reg_branch = nnx.Sequential(
            nnx.Linear(embed_dims, embed_dims, rngs=rngs), nnx.relu,
            nnx.Linear(embed_dims, embed_dims, rngs=rngs), nnx.relu,
            nnx.Linear(embed_dims, code_size, rngs=rngs))

        self.assigner = HungarianAssigner3D()

    # --------------------------------------------------------------- forward
    def __call__(self, bev, training: bool = False):
        """bev [B, gy, gx, C] -> (all_cls [L,B,Qt,C], all_bbox [L,B,Qt,D]).
        Qt = num_query in training (one2one ++ one2many), else
        num_queries_one2one."""
        b, gy, gx, c = bev.shape
        tokens = bev.reshape(b, gy * gx, c)
        if self.input_proj is not None:
            tokens = self.input_proj(tokens)

        ref = self.reference_points[...]
        attn_mask = None
        if training and self.k_one2many > 0:
            ref = jnp.concatenate([ref, self.reference_points_12m[...]], 0)
            q1 = self.num_queries_one2one
            qt = ref.shape[0]
            # True = attention allowed; block-diagonal by group
            grp = (jnp.arange(qt) < q1)
            attn_mask = grp[:, None] == grp[None, :]
        ref = jnp.clip(ref, 1e-3, 1 - 1e-3)
        ref_b = jnp.broadcast_to(ref[None], (b,) + ref.shape)

        query_pos = self.query_embedding(
            pos2posemb3d(ref_b, self.embed_dims // 2))
        query = jnp.zeros_like(query_pos)
        shapes = ((gy, gx),)
        outs = []
        for layer in self.layers:
            query = layer(query, tokens, query_pos, ref_b[..., :2], shapes,
                          attn_mask=attn_mask)
            outs.append(query)

        pc = self.pc_range
        ref_inv = inverse_sigmoid(ref_b)
        all_cls, all_bbox = [], []
        for q in outs:
            cls = self.cls_branch(q)
            reg = self.reg_branch(q)
            cx = jax.nn.sigmoid(reg[..., 0:1] + ref_inv[..., 0:1])
            cy = jax.nn.sigmoid(reg[..., 1:2] + ref_inv[..., 1:2])
            cz = jax.nn.sigmoid(reg[..., 4:5] + ref_inv[..., 2:3])
            cx = cx * (pc[3] - pc[0]) + pc[0]
            cy = cy * (pc[4] - pc[1]) + pc[1]
            cz = cz * (pc[5] - pc[2]) + pc[2]
            bbox = jnp.concatenate(
                [cx, cy, cz, reg[..., 2:4], reg[..., 5:6], reg[..., 6:]],
                axis=-1)
            all_cls.append(cls)
            all_bbox.append(bbox)
        return jnp.stack(all_cls), jnp.stack(all_bbox)

    # ------------------------------------------------------------------ loss
    def _encode_gt(self, gt_boxes):
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

    def _set_loss(self, all_cls, all_bbox, gt_boxes, gt_labels):
        """Hungarian set loss summed over decoder layers (PETR pattern)."""
        total_cls = 0.
        total_reg = 0.
        cw = jnp.asarray(self.code_weights)
        for lvl in range(all_cls.shape[0]):
            def one(cls_q, bbox_q, gt_b, gt_l):
                gt_enc = self._encode_gt(gt_b)
                assigned, is_fg = self.assigner.assign(
                    bbox_q, cls_q, gt_enc, gt_l)
                safe = jnp.clip(assigned, 0)
                tgt_label = jnp.where(is_fg, gt_l[safe], self.num_classes)
                onehot = jax.nn.one_hot(
                    tgt_label, self.num_classes + 1)[:, :self.num_classes]
                num_fg = jnp.maximum(jnp.sum(is_fg), 1)
                cls_loss = jnp.sum(
                    sigmoid_focal_loss(cls_q, onehot)) / num_fg
                reg_l1 = jnp.abs(bbox_q - gt_enc[safe]) * cw[None, :]
                reg_loss = jnp.sum(
                    jnp.where(is_fg[:, None], reg_l1, 0.)) / num_fg
                return cls_loss, reg_loss

            cls_loss, reg_loss = jax.vmap(one)(all_cls[lvl], all_bbox[lvl],
                                               gt_boxes, gt_labels)
            total_cls = total_cls + jnp.mean(cls_loss)
            total_reg = total_reg + jnp.mean(reg_loss)
        return total_cls, total_reg

    def loss(self, all_cls, all_bbox, gt_boxes, gt_labels) -> dict:
        """Hybrid loss (rtebev_head.py loss w/ k_one2many): one2one queries
        vs GT, one2many queries vs GT tiled k times, weighted by
        lambda_one2many."""
        q1 = self.num_queries_one2one
        cls_o, reg_o = self._set_loss(all_cls[:, :, :q1],
                                      all_bbox[:, :, :q1],
                                      gt_boxes, gt_labels)
        out = {"loss_cls": self.cls_weight * cls_o,
               "loss_bbox": self.reg_weight * reg_o}
        if self.k_one2many > 0 and all_cls.shape[2] > q1:
            k = self.k_one2many
            gt_boxes_m = jnp.tile(gt_boxes, (1, k, 1))
            gt_labels_m = jnp.tile(gt_labels, (1, k))
            cls_m, reg_m = self._set_loss(all_cls[:, :, q1:],
                                          all_bbox[:, :, q1:],
                                          gt_boxes_m, gt_labels_m)
            lam = self.lambda_one2many
            out["loss_cls_one2many"] = lam * self.cls_weight * cls_m
            out["loss_bbox_one2many"] = lam * self.reg_weight * reg_m
        out["loss"] = sum(v for v in out.values())
        return out

    # --------------------------------------------------------------- predict
    def predict(self, all_cls, all_bbox, max_num: int = 300,
                score_threshold: float = 0.0) -> dict:
        """NMS-free decode of the last layer's one2one queries -> fixed
        [B, K] outputs (boxes emitted bottom-z, reference NMSFreeCoder)."""
        q1 = self.num_queries_one2one
        cls, bbox = all_cls[-1, :, :q1], all_bbox[-1, :, :q1]
        if self.bbox_coder is not None:
            max_num = getattr(self.bbox_coder, "max_num", max_num)

        def one(cls_q, bbox_q):
            scores = jax.nn.sigmoid(cls_q).reshape(-1)
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
            valid = top_scores > score_threshold
            return (out_box, jnp.where(valid, top_scores, -1.),
                    jnp.where(valid, labels, -1))

        boxes, scores, labels = jax.vmap(one)(cls, bbox)
        return {"box3d_lidar": boxes, "scores": scores,
                "label_preds": labels}
