"""Swin Transformer backbone
(reference: paddle3d/models/backbones/swin_transformer.py:588 and the
dual-Swin CBSwinTransformer, cbnet.py:108 — BEVFusion's image backbone).

Windowed multi-head self-attention with shifted windows, relative position
bias, and patch merging between stages. All window partitioning is static
reshapes (input sizes must be multiples of window_size x patch_size; the
dataloader pads — see PadMultiViewImage).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...apis import manager

__all__ = ["SwinTransformer", "CBSwinTransformer"]


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(win, ws, h, w):
    b = win.shape[0] // ((h // ws) * (w // ws))
    x = win.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class WindowAttention(nnx.Module):
    def __init__(self, dim, num_heads, window_size, *, rngs):
        self.dim = dim
        self.num_heads = num_heads
        self.ws = window_size
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nnx.Linear(dim, dim * 3, rngs=rngs)
        self.proj = nnx.Linear(dim, dim, rngs=rngs)
        # relative position bias table [(2w-1)^2, heads]
        n = (2 * window_size - 1) ** 2
        self.rpb = nnx.Param(
            jax.random.normal(rngs.params(), (n, num_heads)) * 0.02)
        # static index map
        coords = np.stack(np.meshgrid(np.arange(window_size),
                                      np.arange(window_size),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.transpose(1, 2, 0) + window_size - 1
        # static python data (tuple) so nnx doesn't treat it as state
        self.rpb_index = tuple(
            map(tuple, (rel[..., 0] * (2 * window_size - 1) +
                        rel[..., 1]).astype(int).tolist()))

    def __call__(self, x, mask=None):
        """x [nW, ws*ws, C]; mask [nWtypes, ws*ws, ws*ws] or None."""
        nw, n, c = x.shape
        qkv = self.qkv(x).reshape(nw, n, 3, self.num_heads,
                                  c // self.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("wnhd,wmhd->whnm", q * self.scale, k)
        bias = self.rpb[...][jnp.asarray(self.rpb_index, dtype=jnp.int32)]  # [n, n, heads]
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nt = mask.shape[0]
            attn = attn.reshape(nw // nt, nt, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(nw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("whnm,wmhd->wnhd", attn, v).reshape(nw, n, c)
        return self.proj(out)


class SwinBlock(nnx.Module):
    def __init__(self, dim, num_heads, window_size, shift, mlp_ratio=4,
                 *, rngs):
        self.ws = window_size
        self.shift = shift
        self.norm1 = nnx.LayerNorm(dim, rngs=rngs)
        self.attn = WindowAttention(dim, num_heads, window_size, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, rngs=rngs)
        self.fc1 = nnx.Linear(dim, dim * mlp_ratio, rngs=rngs)
        self.fc2 = nnx.Linear(dim * mlp_ratio, dim, rngs=rngs)

    def _attn_mask(self, h, w):
        if self.shift == 0:
            return None
        img = np.zeros((1, h, w, 1), np.float32)
        cnt = 0
        for hs in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                   slice(-self.shift, None)):
            for ws_ in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                        slice(-self.shift, None)):
                img[:, hs, ws_, :] = cnt
                cnt += 1
        win = _window_partition(jnp.asarray(img), self.ws)[..., 0]
        diff = win[:, None, :] - win[:, :, None]
        return jnp.where(diff == 0, 0., -1e9)

    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        x = self.norm1(x)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        win = _window_partition(x, self.ws)
        win = self.attn(win, self._attn_mask(h, w))
        x = _window_reverse(win, self.ws, h, w)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x
        return x + self.fc2(nnx.gelu(self.fc1(self.norm2(x))))


class PatchMerging(nnx.Module):
    def __init__(self, dim, *, rngs):
        self.norm = nnx.LayerNorm(4 * dim, rngs=rngs)
        self.reduction = nnx.Linear(4 * dim, 2 * dim, use_bias=False,
                                    rngs=rngs)

    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        return self.reduction(self.norm(x))


@manager.BACKBONES.add_component
class SwinTransformer(nnx.Module):
    def __init__(self,
                 embed_dim: int = 96,
                 depths: Sequence[int] = (2, 2, 6, 2),
                 num_heads: Sequence[int] = (3, 6, 12, 24),
                 window_size: int = 7,
                 patch_size: int = 4,
                 out_indices: Sequence[int] = (1, 2, 3),
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.out_indices = tuple(out_indices)
        self.window_size = window_size
        self.patch_embed = nnx.Conv(
            3, embed_dim, kernel_size=(patch_size, patch_size),
            strides=(patch_size, patch_size), rngs=rngs)
        self.embed_norm = nnx.LayerNorm(embed_dim, rngs=rngs)

        stages, mergers, norms = [], [], []
        dim = embed_dim
        self.out_channels = []
        for i, depth in enumerate(depths):
            blocks = [
                SwinBlock(dim, num_heads[i], window_size,
                          shift=0 if j % 2 == 0 else window_size // 2,
                          rngs=rngs) for j in range(depth)
            ]
            stages.append(nnx.List(blocks))
            norms.append(nnx.LayerNorm(dim, rngs=rngs))
            self.out_channels.append(dim)
            if i < len(depths) - 1:
                mergers.append(PatchMerging(dim, rngs=rngs))
                dim *= 2
        self.stages = nnx.List(stages)
        self.norms = nnx.List(norms)
        self.mergers = nnx.List(mergers)

    def __call__(self, x):
        x = self.embed_norm(self.patch_embed(x))
        outs = []
        for i, stage in enumerate(self.stages):
            for blk in stage:
                x = blk(x)
            if i in self.out_indices:
                outs.append(self.norms[i](x))
            if i < len(self.mergers):
                x = self.mergers[i](x)
        return tuple(outs)


@manager.BACKBONES.add_component
class CBSwinTransformer(nnx.Module):
    """Composite-Backbone dual Swin (reference:
    paddle3d/models/backbones/cbnet.py:108 CBSwinTransformer — two identical
    Swin towers; the assisting tower's per-stage features are projected and
    added to the lead tower's stage inputs, CBNetV2-style same-level
    composition). Used by the BEVFusion camera branch."""

    def __init__(self,
                 embed_dim: int = 96,
                 depths: Sequence[int] = (2, 2, 6, 2),
                 num_heads: Sequence[int] = (3, 6, 12, 24),
                 window_size: int = 7,
                 patch_size: int = 4,
                 out_indices: Sequence[int] = (1, 2, 3),
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        kw = dict(embed_dim=embed_dim, depths=depths, num_heads=num_heads,
                  window_size=window_size, patch_size=patch_size,
                  out_indices=out_indices, rngs=rngs)
        self.assist = SwinTransformer(**kw)
        self.lead = SwinTransformer(**kw)
        self.out_indices = tuple(out_indices)
        self.cb_proj = nnx.List([
            nnx.Linear(embed_dim * (2 ** i), embed_dim * (2 ** i),
                       kernel_init=nnx.initializers.zeros_init(), rngs=rngs)
            for i in range(len(depths))
        ])
        self.out_channels = [embed_dim * (2 ** i) for i in out_indices]

    @staticmethod
    def _run_stages(tower, x, inject=None):
        x = tower.embed_norm(tower.patch_embed(x))
        feats = []
        for i, stage in enumerate(tower.stages):
            if inject is not None:
                x = x + inject[i]
            for blk in stage:
                x = blk(x)
            feats.append(x)
            if i < len(tower.mergers):
                x = tower.mergers[i](x)
        return feats

    def __call__(self, x):
        assist_feats = self._run_stages(self.assist, x)
        inject = [proj(f) for proj, f in zip(self.cb_proj, assist_feats)]
        lead_feats = self._run_stages(self.lead, x, inject)
        return tuple(self.lead.norms[i](lead_feats[i])
                     for i in self.out_indices)
