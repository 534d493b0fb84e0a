"""Generic transformer building blocks
(reference: paddle3d/models/layers/transformer_layers.py:98,251,304 —
BaseTransformerLayer / TransformerLayerSequence / MultiHeadAttention).

nnx modules; attention is jax.nn.dot_product_attention under the hood via
nnx.MultiHeadAttention. Layers follow the mmcv-style operation_order
contract used throughout the reference transformer configs.
"""
from typing import Sequence

import jax.numpy as jnp
from flax import nnx

from ...apis import manager

__all__ = ["MultiHeadAttention", "FFN", "BaseTransformerLayer",
           "TransformerLayerSequence"]


@manager.ATTENTIONS.add_component
class MultiHeadAttention(nnx.Module):
    """Standard MHA with optional query/key positional embeddings
    (reference: transformer_layers.py:304)."""

    def __init__(self, embed_dims: int, num_heads: int, attn_drop: float = 0.,
                 batch_first: bool = True, rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.embed_dims = embed_dims
        self.attn = nnx.MultiHeadAttention(
            num_heads=num_heads, in_features=embed_dims, qkv_features=embed_dims,
            dropout_rate=attn_drop, decode=False, rngs=rngs)

    def __call__(self, query, key=None, value=None, query_pos=None,
                 key_pos=None, attn_mask=None, **kwargs):
        """query [B, Q, C]; key/value [B, K, C]."""
        if key is None:
            key = query
        if value is None:
            value = key
        q = query + query_pos if query_pos is not None else query
        k = key + key_pos if key_pos is not None else key
        out = self.attn(q, k, value, mask=attn_mask, deterministic=True)
        return out


class FFN(nnx.Module):
    """(reference: transformer_layers.py FFN)."""

    def __init__(self, embed_dims: int, feedforward_channels: int,
                 num_fcs: int = 2, ffn_drop: float = 0.,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.fc1 = nnx.Linear(embed_dims, feedforward_channels, rngs=rngs)
        self.fc2 = nnx.Linear(feedforward_channels, embed_dims, rngs=rngs)

    def __call__(self, x, identity=None):
        out = self.fc2(nnx.relu(self.fc1(x)))
        if identity is None:
            identity = x
        return identity + out


@manager.TRANSFORMER_ENCODER_LAYERS.add_component
@manager.TRANSFORMER_DECODER_LAYERS.add_component
class BaseTransformerLayer(nnx.Module):
    """Configurable-op-order layer (reference: transformer_layers.py:98).

    operation_order: tuple drawn from
    ('self_attn', 'cross_attn', 'norm', 'ffn'); attentions are consumed in
    order from `attns`.
    """

    def __init__(self, attns: Sequence, embed_dims: int,
                 feedforward_channels: int,
                 operation_order: Sequence[str] = ("self_attn", "norm",
                                                   "cross_attn", "norm",
                                                   "ffn", "norm"),
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        if not isinstance(attns, (list, tuple)):
            attns = [attns]
        self.attns = nnx.List(list(attns))
        self.operation_order = tuple(operation_order)
        self.embed_dims = embed_dims
        n_norms = sum(1 for op in operation_order if op == "norm")
        self.norms = nnx.List(
            [nnx.LayerNorm(embed_dims, rngs=rngs) for _ in range(n_norms)])
        self.ffn = FFN(embed_dims, feedforward_channels, rngs=rngs)

    def __call__(self, query, key=None, value=None, query_pos=None,
                 key_pos=None, attn_masks=None, **kwargs):
        norm_i = 0
        attn_i = 0
        for op in self.operation_order:
            if op == "self_attn":
                # attn_masks gates SELF attention only (DN training:
                # matching/denoising query visibility, heads/denoising.py)
                query = query + self.attns[attn_i](
                    query, query, query, query_pos=query_pos,
                    key_pos=query_pos, attn_mask=attn_masks, **kwargs)
                attn_i += 1
            elif op == "cross_attn":
                query = query + self.attns[attn_i](
                    query, key, value, query_pos=query_pos, key_pos=key_pos,
                    **kwargs)
                attn_i += 1
            elif op == "norm":
                query = self.norms[norm_i](query)
                norm_i += 1
            elif op == "ffn":
                query = self.ffn(query)
            else:
                raise ValueError("unknown op {}".format(op))
        return query


@manager.TRANSFORMER_ENCODERS.add_component
@manager.TRANSFORMER_DECODERS.add_component
class TransformerLayerSequence(nnx.Module):
    """Stack of layers, optionally returning intermediate outputs
    (reference: transformer_layers.py:251)."""

    def __init__(self, layers: Sequence, return_intermediate: bool = False,
                 post_norm: bool = False, embed_dims: int = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.layers = nnx.List(list(layers))
        self.return_intermediate = return_intermediate
        self.post_norm = (nnx.LayerNorm(embed_dims, rngs=rngs)
                          if post_norm else None)

    def __call__(self, query, **kwargs):
        intermediate = []
        for layer in self.layers:
            query = layer(query, **kwargs)
            if self.return_intermediate:
                out = query
                if self.post_norm is not None:
                    out = self.post_norm(out)
                intermediate.append(out)
        if self.return_intermediate:
            return jnp.stack(intermediate)
        if self.post_norm is not None:
            query = self.post_norm(query)
        return query
