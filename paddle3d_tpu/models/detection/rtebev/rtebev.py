"""RTEBev (reference: paddle3d/models/detection/rtebev/rtebev.py:590 —
real-time BEV detector: BEVDet-style LSS lift with a lightweight BEV
transformer refinement and multi-frame fusion).

Composed on top of BEVDet: after the LSS BEV map (+optional prev-frame
concat), a small self-attention block over BEV tokens refines features
before the BEV encoder (the reference's RTEBevTransformer,
models/transformers/transformer.py:396).
"""
import jax.numpy as jnp
from flax import nnx

from ....apis import manager
from ...transformers.transformer_layers import (BaseTransformerLayer,
                                                MultiHeadAttention)
from ..bevdet.bevdet import BEVDet

__all__ = ["RTEBev"]


@manager.MODELS.add_component
class RTEBev(BEVDet):
    def __init__(self, *args, refine_layers: int = 1, refine_heads: int = 4,
                 refine_channels: int = None, rngs: nnx.Rngs = None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        c = refine_channels or self.img_view_transformer.out_channels
        self.refine = nnx.List([
            BaseTransformerLayer(
                attns=[MultiHeadAttention(c, refine_heads, rngs=rngs)],
                embed_dims=c, feedforward_channels=c * 2,
                operation_order=("self_attn", "norm", "ffn", "norm"),
                rngs=rngs) for _ in range(refine_layers)
        ])

    def extract_bev(self, batch):
        bev, depth = self._camera_bev(
            batch["img"], batch["rots"], batch["trans"], batch["cam2imgs"],
            batch["post_rots"], batch["post_trans"], batch["bda"])
        # transformer refinement over BEV tokens (the RTEBev addition)
        b, gy, gx, cb = bev.shape
        tokens = bev.reshape(b, gy * gx, cb)
        for layer in self.refine:
            tokens = layer(tokens)
        bev = tokens.reshape(b, gy, gx, cb)
        if self.temporal:
            bev = self._temporal_bev(bev, batch)
        feats = self.img_bev_encoder_backbone(bev)
        return self.img_bev_encoder_neck(feats), bev, depth
