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

    # The voxelizer emits voxels sorted by linear cell key (z==0 for
    # pillars ⇒ key = y*nx + x is ascending) with invalid slots as a
    # suffix — exactly the contract of the Pallas sorted-scatter kernel
    # (ops/pallas/sorted_scatter.py), which replaces XLA's pathological
    # scatter lowering (31 ms → ~4 ms for the 8×[20k]→[496,432,64] canvas).
    from .pallas.sorted_scatter import sorted_segment_sum
    keys = jnp.where(
        voxel_mask,
        coords[..., 1].astype(jnp.int32) * nx + coords[..., 2].astype(
            jnp.int32),
        jnp.int32(2**31 - 1))
    canvas = sorted_segment_sum(keys, voxel_features, ny * nx)
    return canvas.reshape(b, ny, nx, c)


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
