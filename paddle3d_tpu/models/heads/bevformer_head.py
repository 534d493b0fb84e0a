"""BEVFormer detection head with iterative reference-point refinement
(reference: paddle3d/models/detection/bevformer/bevformer_head.py:72 +
models/transformers/decoders.py:32 DetectionTransformerDecoder).

Differences from the plain PETR decode: per-layer cls/reg branches, and each
decoder layer's regression output refines the (gradient-detached) reference
points, which re-condition the next layer's query positional embedding —
the reference's `with_box_refine` behavior (decoders.py:112-126).
"""
import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from .petr_head import PETRHead, inverse_sigmoid, pos2posemb3d

__all__ = ["BEVFormerHead"]


@manager.HEADS.add_component
class BEVFormerHead(PETRHead):
    def __init__(self, with_box_refine: bool = True, bev_h: int = None,
                 bev_w: int = None, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        super().__init__(rngs=rngs, **kwargs)
        self.with_box_refine = with_box_refine
        # reference-YAML surface: the head carries the BEV grid size and
        # the PerceptionTransformer spec; the BEVFormer model reads both
        self.bev_h, self.bev_w = bev_h, bev_w

        def cls_branch():
            return nnx.Sequential(
                nnx.Linear(self.embed_dims, self.embed_dims, rngs=rngs),
                nnx.relu,
                nnx.Linear(self.embed_dims, self.num_classes,
                           bias_init=nnx.initializers.constant(-2.19),
                           rngs=rngs))

        def reg_branch():
            return nnx.Sequential(
                nnx.Linear(self.embed_dims, self.embed_dims, rngs=rngs),
                nnx.relu,
                nnx.Linear(self.embed_dims, self.code_size, rngs=rngs))

        # per-layer branches (reference clones branches when box refinement
        # is on, bevformer_head.py `_get_clones`)
        n = self.num_layers
        self.cls_branches = nnx.List([cls_branch() for _ in range(n)])
        self.reg_branches = nnx.List([reg_branch() for _ in range(n)])

    def decode_over_tokens(self, tokens, token_shape=None):
        """DETR decode over BEV tokens with per-layer reference refinement.

        tokens [B, H*W, C] -> (all_cls [L,B,Q,ncls], all_bbox [L,B,Q,code]).
        """
        b = tokens.shape[0]
        pc = self.pc_range
        ref = jnp.clip(self.reference_points[...], 1e-3, 1 - 1e-3)
        ref = jnp.broadcast_to(ref[None], (b,) + ref.shape)  # [B,Q,3]
        query = jnp.zeros((b, self.num_query, self.embed_dims),
                          tokens.dtype)

        all_cls, all_bbox = [], []
        for lid, layer in enumerate(self.decoder.layers):
            # query positional embedding re-derived from the CURRENT refs
            query_pos = self.query_embedding(
                pos2posemb3d(ref, self.embed_dims // 2))
            query = layer(query, key=tokens, value=tokens,
                          query_pos=query_pos)
            out = query
            if self.decoder.post_norm is not None:
                out = self.decoder.post_norm(out)
            cls = self.cls_branches[lid](out)
            reg = self.reg_branches[lid](out)

            ref_inv = inverse_sigmoid(ref)
            cx_n = jax.nn.sigmoid(reg[..., 0:1] + ref_inv[..., 0:1])
            cy_n = jax.nn.sigmoid(reg[..., 1:2] + ref_inv[..., 1:2])
            cz_n = jax.nn.sigmoid(reg[..., 4:5] + ref_inv[..., 2:3])
            cx = cx_n * (pc[3] - pc[0]) + pc[0]
            cy = cy_n * (pc[4] - pc[1]) + pc[1]
            cz = cz_n * (pc[5] - pc[2]) + pc[2]
            bbox = jnp.concatenate(
                [cx, cy, cz, reg[..., 2:4], reg[..., 5:6], reg[..., 6:]],
                axis=-1)
            all_cls.append(cls)
            all_bbox.append(bbox)

            if self.with_box_refine:
                # refined refs feed the next layer, gradients cut
                # (reference decoders.py:126 `.detach()`)
                ref = jax.lax.stop_gradient(
                    jnp.concatenate([cx_n, cy_n, cz_n], axis=-1))
        return jnp.stack(all_cls), jnp.stack(all_bbox)
