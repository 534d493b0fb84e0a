"""Hard voxelization as a single fused XLA program.

TPU-native replacement for the reference CUDA pipeline
(reference: paddle3d/ops/voxel/voxelize_op.cu:63,106,122,158,182 — point→cell
map, valid-cell prefix scan, buffer assignment), re-designed around fixed
shapes: one stable sort groups points by cell id, a segmented scan numbers
voxels and ranks points within each voxel, and two scatters materialize the
capacity-padded outputs. Deterministic by construction (stable sort keeps
first-arrival points, matching the CUDA first-writer-wins semantics for
points fed in file order).

Everything is `vmap`-able over a leading batch axis, so a batch voxelizes as
one program with no per-sample host loop (unlike the reference's python loop
in models/voxelizers/voxelize.py:60-82).
"""
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["hard_voxelize", "points_to_voxel_coords", "voxel_mean",
           "voxel_mean_batch"]


def points_to_voxel_coords(points: jnp.ndarray, voxel_size: Sequence[float],
                           point_cloud_range: Sequence[float]
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map points to integer grid coords (x,y,z order) + validity mask.

    points: [N, C>=3]; a point is invalid if any coordinate is non-finite or
    falls outside point_cloud_range.
    """
    pc_range = jnp.asarray(point_cloud_range, dtype=points.dtype)
    vsize = jnp.asarray(voxel_size, dtype=points.dtype)
    grid_size = jnp.round((pc_range[3:6] - pc_range[0:3]) / vsize).astype(
        jnp.int32)
    xyz = points[:, :3]
    coords = jnp.floor((xyz - pc_range[0:3]) / vsize).astype(jnp.int32)
    in_range = jnp.all((coords >= 0) & (coords < grid_size), axis=-1)
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    return coords, in_range & finite


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "point_cloud_range",
                     "max_points_in_voxel", "max_voxels"))
def hard_voxelize(points: jnp.ndarray,
                  voxel_size: Tuple[float, ...],
                  point_cloud_range: Tuple[float, ...],
                  max_points_in_voxel: int,
                  max_voxels: int):
    """Voxelize one sample with fixed-capacity outputs.

    Args:
        points: [N, C] float array. Padding points may be encoded as
            non-finite values or points outside the range.
        voxel_size / point_cloud_range: static python tuples.
        max_points_in_voxel: P.
        max_voxels: V.

    Returns:
        voxels:      [V, P, C] point payloads (zero padded).
        coords:      [V, 3] int32 (z, y, x) — matches the reference layout.
        num_points:  [V] int32 number of valid points per voxel (<= P).
        voxel_mask:  [V] bool validity of each voxel slot.

    Equivalent of the reference's `hard_voxelize` custom op
    (reference: paddle3d/ops/voxel/voxelize_op.cc:183-187) with `voxels_num`
    replaced by the mask (mask.sum() == voxels_num).
    """
    n, c = points.shape
    # a sample can never occupy more voxels than it has points: shrink the
    # static capacity accordingly (halves the voxel buffer + downstream
    # encoder work for sparse scans; exact, not an approximation)
    max_voxels = min(max_voxels, n)
    coords_xyz, valid = points_to_voxel_coords(points, voxel_size,
                                               point_cloud_range)
    pc_range = jnp.asarray(point_cloud_range, dtype=points.dtype)
    vsize = jnp.asarray(voxel_size, dtype=points.dtype)
    # int32 keys: realistic grids (e.g. 1504x1504x40 for 0.075m nuScenes)
    # stay well under 2^31 cells.
    grid = jnp.round((pc_range[3:6] - pc_range[0:3]) / vsize).astype(jnp.int32)
    gx, gy = grid[0], grid[1]

    # Linear cell key; invalid points get a sentinel larger than any key so
    # they sort to the end.
    key = (coords_xyz[:, 2] * gy * gx + coords_xyz[:, 1] * gx +
           coords_xyz[:, 0])
    sentinel = gx * gy * grid[2] + 1
    key = jnp.where(valid, key, sentinel)

    # Stable sort by cell: groups points of a voxel contiguously while
    # preserving input order within each voxel (determinism).
    order = jnp.argsort(key, stable=True)
    skey = key[order]
    svalid = valid[order]

    # Head of each voxel segment.
    head = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]) & svalid
    # voxel slot per sorted point (0-based); invalid tail gets garbage slots
    # that are masked out below.
    voxel_id = jnp.cumsum(head.astype(jnp.int32)) - 1
    # Rank of each point within its voxel: position - segment_start.
    pos = jnp.arange(n, dtype=jnp.int32)
    seg_start = jnp.maximum.accumulate(jnp.where(head, pos, -1))
    rank = pos - seg_start

    keep = svalid & (voxel_id < max_voxels) & (rank < max_points_in_voxel)
    # Route dropped points to a trash slot (V*P) that is sliced away.
    flat_idx = jnp.where(keep, voxel_id * max_points_in_voxel + rank,
                         max_voxels * max_points_in_voxel)

    sorted_pts = points[order]
    voxels = jnp.zeros((max_voxels * max_points_in_voxel + 1, c),
                       dtype=points.dtype)
    voxels = voxels.at[flat_idx].set(sorted_pts, mode="drop")
    voxels = voxels[:-1].reshape(max_voxels, max_points_in_voxel, c)

    # Per-voxel coords in (z, y, x) order, taken at segment heads.
    szyx = coords_xyz[order][:, ::-1].astype(jnp.int32)
    head_slot = jnp.where(head & (voxel_id < max_voxels), voxel_id,
                          max_voxels)
    coords = jnp.full((max_voxels + 1, 3), -1, dtype=jnp.int32)
    coords = coords.at[head_slot].set(szyx, mode="drop")[:-1]

    # Count of valid (kept) points per voxel.
    ones = keep.astype(jnp.int32)
    num_points = jnp.zeros((max_voxels + 1,), jnp.int32).at[
        jnp.where(keep, voxel_id, max_voxels)].add(ones, mode="drop")[:-1]

    num_valid_voxels = jnp.sum(head.astype(jnp.int32))
    voxel_mask = jnp.arange(max_voxels) < jnp.minimum(num_valid_voxels,
                                                      max_voxels)
    return voxels, coords, num_points, voxel_mask


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "point_cloud_range",
                     "max_points_in_voxel", "max_voxels", "in_channels"))
def voxel_mean(points: jnp.ndarray,
               voxel_size: Tuple[float, ...],
               point_cloud_range: Tuple[float, ...],
               max_points_in_voxel: int,
               max_voxels: int,
               in_channels: int = None):
    """Fused hard_voxelize + VoxelMean for one sample — the [V, P, C]
    buffer never exists.

    The buffer path (hard_voxelize → VoxelMean) costs a 250k-row gather
    plus a 1.6M-slot scatter on TPU (~426 ms for the nuScenes 0.075 grid at
    batch 4 — measured, tools/bench_voxels_stages.py); since VoxelMean
    (reference: paddle3d/models/voxel_encoders/voxel_encoder.py:44) only
    ever reads the buffer's per-voxel mean, two multi-operand sorts and a
    bounded segment scan produce the same result directly:

      sort(points by cell) → capped segment mean at each voxel's emission
      row → compaction sort (emission rows to the front, key order kept).

    Matches hard_voxelize+VoxelMean semantics: first `max_points_in_voxel`
    points per voxel in arrival order (stable sort), first `max_voxels`
    voxels in ascending-key order, coords (z, y, x) at segment heads. The
    mean is accumulated in f32 by a log-depth doubling scan, so it can
    differ from the buffer path's sequential sum by f32 rounding only.

    Returns (feats [V, Cm], coords [V, 3] zyx int32, num_points [V] int32,
    mask [V] bool) with Cm = in_channels or C.
    """
    from .segmented import blocked_cumsum, seg_prefix_sum_bounded

    n, c = points.shape
    cm = in_channels or c
    max_voxels = min(max_voxels, n)
    coords_xyz, valid = points_to_voxel_coords(points, voxel_size,
                                               point_cloud_range)
    pc_range = jnp.asarray(point_cloud_range, dtype=points.dtype)
    vsize = jnp.asarray(voxel_size, dtype=points.dtype)
    grid = jnp.round((pc_range[3:6] - pc_range[0:3]) / vsize).astype(
        jnp.int32)
    gx, gy = grid[0], grid[1]
    sentinel = gx * gy * grid[2] + 1

    key = (coords_xyz[:, 2] * gy * gx + coords_xyz[:, 1] * gx +
           coords_xyz[:, 0])
    key = jnp.where(valid, key, sentinel)

    cols = [points[:, i].astype(jnp.float32) for i in range(cm)]
    sorted_ops = jax.lax.sort([key] + cols, num_keys=1, is_stable=True)
    skey = sorted_ops[0]
    svals = jnp.stack(sorted_ops[1:], axis=-1)          # [N, Cm] f32

    svalid = skey < sentinel
    head = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]) & svalid
    # tail from the KEY boundary, not tail_flags(head): head is masked by
    # svalid, so the valid→sentinel transition carries no head flag and the
    # last valid voxel would silently lose its emission row (same rationale
    # as ops/pillar_ops.pillar_decorate_sorted)
    next_key = jnp.concatenate(
        [skey[1:], jnp.full((1,), sentinel, skey.dtype)])
    tail = svalid & (skey != next_key)
    rcount = seg_prefix_sum_bounded(
        jnp.ones((n,), jnp.int32), skey, max_points_in_voxel + 1)
    rank = rcount - 1
    voxel_id = blocked_cumsum(head.astype(jnp.int32)) - 1
    keep = (svalid & (rank < max_points_in_voxel) & (voxel_id < max_voxels))
    emit = keep & (tail | (rank == max_points_in_voxel - 1))

    # where, not multiply: dropped rows can be NaN padding (NaN * 0 = NaN)
    kept_vals = jnp.where(keep[:, None], svals, 0.)
    sums = seg_prefix_sum_bounded(
        jnp.concatenate([kept_vals,
                         keep[:, None].astype(svals.dtype)], -1),
        skey, max_points_in_voxel)
    count = sums[:, cm]
    mean = sums[:, :cm] / jnp.maximum(count, 1.)[:, None]

    # compaction: emission rows to the front, ascending-key order preserved
    key2 = jnp.where(emit, skey, jnp.int32(2**31 - 1))
    packed = jax.lax.sort(
        [key2, count] + [mean[:, i] for i in range(cm)],
        num_keys=1, is_stable=True)
    k2 = packed[0][:max_voxels]
    cnt = packed[1][:max_voxels]
    feats = jnp.stack([p[:max_voxels] for p in packed[2:]], axis=-1)

    mask = k2 < sentinel
    z = k2 // (gy * gx)
    rem = k2 - z * (gy * gx)
    y = rem // gx
    x = rem - y * gx
    coords = jnp.where(mask[:, None],
                       jnp.stack([z, y, x], axis=-1),
                       jnp.int32(-1))
    num_points = jnp.where(mask, cnt.astype(jnp.int32), 0)
    feats = (feats * mask[:, None].astype(feats.dtype)).astype(points.dtype)
    return feats, coords, num_points, mask


def voxel_mean_batch(points: jnp.ndarray, voxel_size, point_cloud_range,
                     max_points_in_voxel: int, max_voxels: int,
                     in_channels: int = None):
    """Batched fused voxelize+mean: points [B, N, C] -> ([B,V,Cm], [B,V,3],
    [B,V], [B,V])."""
    fn = functools.partial(
        voxel_mean,
        voxel_size=tuple(voxel_size),
        point_cloud_range=tuple(point_cloud_range),
        max_points_in_voxel=max_points_in_voxel,
        max_voxels=max_voxels, in_channels=in_channels)
    return jax.vmap(fn)(points)


def hard_voxelize_batch(points: jnp.ndarray, voxel_size, point_cloud_range,
                        max_points_in_voxel: int, max_voxels: int):
    """Batched voxelization: points [B, N, C] -> batched fixed-cap outputs."""
    fn = functools.partial(
        hard_voxelize,
        voxel_size=tuple(voxel_size),
        point_cloud_range=tuple(point_cloud_range),
        max_points_in_voxel=max_points_in_voxel,
        max_voxels=max_voxels)
    return jax.vmap(fn)(points)
