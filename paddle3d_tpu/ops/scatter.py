"""Scatter ops: pillar -> BEV canvas, and generic segment helpers.

TPU-native replacement for the reference's per-sample `paddle.scatter` loop
(reference: paddle3d/models/middle_encoders/pillar_scatter.py:57-105): one
batched `.at[].set` scatter, vmapped over the batch — no host loop, no
boolean-mask gathers, fixed shapes throughout.
"""
import jax
import jax.numpy as jnp

__all__ = ["pillar_scatter", "bev_pool", "bev_pool_sorted"]


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


def bev_pool_sorted(feat_table: jnp.ndarray, pix: jnp.ndarray,
                    depth_w: jnp.ndarray, ranks: jnp.ndarray,
                    valid: jnp.ndarray, num_cells: int) -> jnp.ndarray:
    """bev_pool in factored form: out[b, cell] = Σ depth_w·feat_table[pix].

    The naive formulation materializes the [N_cam·D·h·w, C] outer-product
    rows and scatter-adds them; XLA fuses the product into the scatter and
    the lowering serializes (~46 ms inside the RTEBev view transformer vs
    5 ms standalone — tools/bench_bevpool.py). This version sorts only the
    SCALAR payloads (rank, pixel id, depth weight), rebuilds the rows from
    the small per-pixel feature table by gather (the table is N_cam·h·w
    rows, ~700 KB — gather from it runs at bandwidth), and reduces with
    the Pallas sorted scatter (3.9 ms at the RTEBev shape).

    Args:
        feat_table: [B, Npix, C] per-(camera, pixel) context features.
        pix: [B, R] int32 row index into feat_table's Npix axis.
        depth_w: [B, R] float per-row weight (depth-bin probability).
        ranks: [B, R] int32 target cell ids.
        valid: [B, R] bool.
        num_cells: BEV cell count.
    Returns:
        pooled: [B, num_cells, C] in feat_table.dtype.
    """
    from .pallas.sorted_scatter import sorted_segment_sum

    b = feat_table.shape[0]
    keys_l, rows_l = [], []
    # python loop over the (small, static) batch dim: a vmapped/batched
    # variadic sort takes XLA's slow batched path on TPU (30.8 ms vs
    # 5.5 ms for the same 2M-row sort in 1-D form — profiler trace)
    for i in range(b):
        key = jnp.where(valid[i], ranks[i], jnp.int32(2**31 - 1))
        skey, spix, sdep = jax.lax.sort(
            [key, pix[i], depth_w[i].astype(jnp.float32)],
            num_keys=1, is_stable=False)
        rows = feat_table[i][spix] * sdep[:, None].astype(feat_table.dtype)
        keys_l.append(skey)
        rows_l.append(rows)
    keys = jnp.stack(keys_l)
    rows = jnp.stack(rows_l)
    return sorted_segment_sum(keys, rows, num_cells)
