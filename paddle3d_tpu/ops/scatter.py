"""Scatter ops: pillar -> BEV canvas, and generic segment helpers.

TPU-native replacement for the reference's per-sample `paddle.scatter` loop
(reference: paddle3d/models/middle_encoders/pillar_scatter.py:57-105): one
batched `.at[].set` scatter, vmapped over the batch — no host loop, no
boolean-mask gathers, fixed shapes throughout.
"""
import jax
import jax.numpy as jnp

__all__ = ["pillar_scatter", "bev_pool"]


def pillar_scatter(voxel_features: jnp.ndarray, coords: jnp.ndarray,
                   voxel_mask: jnp.ndarray, ny: int, nx: int) -> jnp.ndarray:
    """Scatter per-pillar features onto a dense BEV canvas.

    Args:
        voxel_features: [B, V, C].
        coords: [B, V, 3] int (z, y, x) voxel coords (z unused for pillars).
        voxel_mask: [B, V] validity.
        ny, nx: canvas size.
    Returns:
        canvas: [B, ny, nx, C] (NHWC — the TPU-preferred conv layout,
        vs. the reference's NCHW).
    """
    b, v, c = voxel_features.shape

    def scatter_one(feat, coord, mask):
        lin = coord[:, 1].astype(jnp.int32) * nx + coord[:, 2].astype(jnp.int32)
        # sorted/unique scatter hints were measured SLOWER here (98.7 vs
        # 109.4 scans/s end to end) — keep the plain drop-mode scatter
        lin = jnp.where(mask, lin, ny * nx)
        canvas = jnp.zeros((ny * nx + 1, c), feat.dtype)
        canvas = canvas.at[lin].set(feat, mode="drop")
        return canvas[:-1].reshape(ny, nx, c)

    return jax.vmap(scatter_one)(voxel_features, coords, voxel_mask)


def bev_pool(feats: jnp.ndarray, ranks: jnp.ndarray, valid: jnp.ndarray,
             num_cells: int) -> jnp.ndarray:
    """Sum features sharing a BEV cell rank (the bev_pool_v2 primitive,
    reference: paddle3d/ops/bev_pool_v2/bev_pool_cuda.cu:18).

    Args:
        feats: [N, C] per-(depth-bin, pixel) products.
        ranks: [N] int32 target cell ids.
        valid: [N] bool.
        num_cells: number of BEV cells.
    Returns:
        pooled: [num_cells, C].

    Autodiff supplies the backward pass, so the reference's separate
    `bev_pool_v2_bkwd` op (ops/bev_pool_v2_backward) is unnecessary.
    """
    n, c = feats.shape
    idx = jnp.where(valid, ranks, num_cells)
    out = jnp.zeros((num_cells + 1, c), feats.dtype)
    out = out.at[idx].add(feats, mode="drop")
    return out[:-1]
