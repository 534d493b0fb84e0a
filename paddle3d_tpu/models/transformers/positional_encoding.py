"""2D positional encodings for BEV/transformer heads (reference:
paddle3d/models/transformers/positional_encoding.py:29
LearnedPositionalEncoding and the sine encoding used by DETR-style heads).
"""
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...apis import manager

__all__ = ["LearnedPositionalEncoding", "SinePositionalEncoding",
           "SinePositionalEncoding3D", "LearnedPositionalEncoding3D"]


@manager.POSITIONAL_ENCODING.add_component
class LearnedPositionalEncoding(nnx.Module):
    """Separate learned row/col embeddings summed per cell."""

    def __init__(self, num_feats: int = 128, row_num_embed: int = 50,
                 col_num_embed: int = 50, rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.num_feats = num_feats
        self.row_embed = nnx.Embed(row_num_embed, num_feats, rngs=rngs)
        self.col_embed = nnx.Embed(col_num_embed, num_feats, rngs=rngs)

    def __call__(self, h: int, w: int):
        """-> [h, w, 2*num_feats]."""
        rows = self.row_embed(jnp.arange(h))  # [h, C]
        cols = self.col_embed(jnp.arange(w))  # [w, C]
        return jnp.concatenate([
            jnp.broadcast_to(cols[None, :, :], (h, w, self.num_feats)),
            jnp.broadcast_to(rows[:, None, :], (h, w, self.num_feats)),
        ], axis=-1)


@manager.POSITIONAL_ENCODING.add_component
class SinePositionalEncoding:
    """DETR sine/cosine 2D encoding (stateless)."""

    def __init__(self, num_feats: int = 128, temperature: float = 10000.,
                 normalize: bool = True, scale: float = 2 * np.pi,
                 offset: float = -0.5):
        self.num_feats = num_feats
        self.temperature = temperature
        self.normalize = normalize
        self.scale = scale
        self.offset = offset

    def __call__(self, h: int, w: int):
        """-> [h, w, 2*num_feats]."""
        y = jnp.arange(h, dtype=jnp.float32)[:, None] + 1.
        x = jnp.arange(w, dtype=jnp.float32)[None, :] + 1.
        y = jnp.broadcast_to(y, (h, w))
        x = jnp.broadcast_to(x, (h, w))
        if self.normalize:
            y = (y + self.offset) / h * self.scale
            x = (x + self.offset) / w * self.scale
        dim_t = self.temperature ** (
            2 * (jnp.arange(self.num_feats) // 2) / self.num_feats)
        px = x[..., None] / dim_t
        py = y[..., None] / dim_t
        px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                       axis=-1).reshape(h, w, -1)
        py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                       axis=-1).reshape(h, w, -1)
        return jnp.concatenate([py, px], axis=-1)


@manager.POSITIONAL_ENCODING.add_component
class SinePositionalEncoding3D(SinePositionalEncoding):
    """PETR-style 3D sine encoding over (camera, row, col)
    (reference: petr usage of SinePositionalEncoding3D — a third `n`
    (camera) axis joins the DETR 2D encoding; per-axis num_feats)."""

    def __call__(self, n: int, h: int, w: int):  # noqa: D102
        """-> [n, h, w, 3*num_feats]."""
        pe2d = super().__call__(h, w)  # [h, w, 2F]
        z = jnp.arange(n, dtype=jnp.float32) + 1.
        if self.normalize:
            z = (z + self.offset) / n * self.scale
        dim_t = self.temperature ** (
            2 * (jnp.arange(self.num_feats) // 2) / self.num_feats)
        pz = z[:, None] / dim_t
        pz = jnp.stack([jnp.sin(pz[..., 0::2]), jnp.cos(pz[..., 1::2])],
                       axis=-1).reshape(n, -1)
        return jnp.concatenate([
            jnp.broadcast_to(pz[:, None, None, :],
                             (n, h, w, self.num_feats)),
            jnp.broadcast_to(pe2d[None], (n, h, w, pe2d.shape[-1])),
        ], axis=-1)


@manager.POSITIONAL_ENCODING.add_component
class LearnedPositionalEncoding3D(nnx.Module):
    """Learned (camera, row, col) embeddings summed per cell
    (reference: petr LearnedPositionalEncoding3D)."""

    def __init__(self, num_feats: int = 128, row_num_embed: int = 50,
                 col_num_embed: int = 50, cam_num_embed: int = 6,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.num_feats = num_feats
        self.row_embed = nnx.Embed(row_num_embed, num_feats, rngs=rngs)
        self.col_embed = nnx.Embed(col_num_embed, num_feats, rngs=rngs)
        self.cam_embed = nnx.Embed(cam_num_embed, num_feats, rngs=rngs)

    def __call__(self, n: int, h: int, w: int):
        """-> [n, h, w, 3*num_feats]."""
        cams = self.cam_embed(jnp.arange(n))
        rows = self.row_embed(jnp.arange(h))
        cols = self.col_embed(jnp.arange(w))
        f = self.num_feats
        return jnp.concatenate([
            jnp.broadcast_to(cams[:, None, None, :], (n, h, w, f)),
            jnp.broadcast_to(rows[None, :, None, :], (n, h, w, f)),
            jnp.broadcast_to(cols[None, None, :, :], (n, h, w, f)),
        ], axis=-1)
