"""Parity tests for the fused PFN Pallas kernel (interpret mode on CPU)
against the XLA segmented-scan path in ops/pillar_ops.fused_pillar_canvas,
which itself has exact eval parity with the [V, P, C] buffer path."""
import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

from paddle3d_tpu.models.middle_encoders.pillar_scatter import \
    PointPillarsScatter
from paddle3d_tpu.models.voxel_encoders.pillar_encoder import PillarFeatureNet
from paddle3d_tpu.models.voxelizers.voxelize import HardVoxelizer
from paddle3d_tpu.ops.pillar_ops import (_fused_pillar_canvas_pallas,
                                         fused_pillar_canvas)

PC_RANGE = (0., -4., -2., 12.8, 4., 2.)   # grid 32 x 20 @ 0.4
VOXEL = (0.4, 0.4, 4.0)


def build(feat_channels, max_points=8, max_voxels=512, with_distance=False,
          in_channels=4):
    rngs = nnx.Rngs(0)
    vox = HardVoxelizer(VOXEL, PC_RANGE, max_points,
                        [max_voxels, max_voxels])
    pfn = PillarFeatureNet(in_channels=in_channels,
                           feat_channels=feat_channels,
                           max_num_points_in_voxel=max_points,
                           voxel_size=VOXEL, point_cloud_range=PC_RANGE,
                           with_distance=with_distance,
                           legacy=False, rngs=rngs)
    mid = PointPillarsScatter(feat_channels[-1], VOXEL, PC_RANGE)
    # randomized running stats so the BN fold is non-trivial; eval mode
    rng = np.random.default_rng(3)
    for layer in pfn.pfn_layers:
        bn = layer.mlp.bn
        bn.mean.value = jnp.asarray(rng.normal(0, .2, bn.mean.value.shape),
                                    jnp.float32)
        bn.var.value = jnp.asarray(rng.uniform(.5, 2., bn.var.value.shape),
                                   jnp.float32)
        bn.use_running_average = True
    return vox, pfn, mid


def make_points(rng, b, n, c=4, clustered=True):
    lo = np.array([0., -4., -2., 0.])[:c]
    hi = np.array([12.8, 4., 2., 1.])[:c]
    pts = rng.uniform(lo, hi, (b, n, c)).astype(np.float32)
    if clustered:
        # heavy duplicates: half the points into a handful of cells to
        # exercise the rank cap and long-segment paths
        k = n // 2
        centers = rng.uniform(lo[:2] + 0.5, hi[:2] - 0.5, (4, 2))
        asn = rng.integers(0, 4, k)
        pts[:, :k, 0] = centers[asn, 0] + rng.normal(0, .05, (b, k))
        pts[:, :k, 1] = centers[asn, 1] + rng.normal(0, .05, (b, k))
    # some out-of-range rows -> sentinel keys
    pts[:, -n // 10:, 0] = 100.0
    return jnp.asarray(pts)


@pytest.mark.parametrize("feat_channels,occ", [
    ((16,), False),
    ((16, 16), False),
    ((16, 16), True),
])
def test_kernel_matches_xla_path(feat_channels, occ):
    rng = np.random.default_rng(0)
    vox, pfn, mid = build(feat_channels)
    pts = make_points(rng, 2, 1000)
    ref = fused_pillar_canvas(vox, pfn, mid, pts, training=False,
                              with_occupancy=occ)
    out = _fused_pillar_canvas_pallas(vox, pfn, mid, pts,
                                      with_occupancy=occ, interpret=True)
    if occ:
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                                   rtol=1e-5, atol=1e-5)
    else:
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_kernel_multi_block_and_voxel_cap():
    """Small block_rows forces several grid steps: halos + the SMEM
    voxel-ordinal carry must reproduce the XLA path's cap semantics."""
    import functools

    import jax

    from paddle3d_tpu.ops.pallas.fused_pfn import fused_pfn_rows
    from paddle3d_tpu.ops.pillar_ops import (pfn_folded_weights,
                                             sort_points_by_cell)

    rng = np.random.default_rng(1)
    vox, pfn, mid = build((16, 16), max_points=8, max_voxels=40)
    pts = make_points(rng, 2, 1000)

    ref = fused_pillar_canvas(vox, pfn, mid, pts, training=False)

    keys, pts_t = jax.vmap(functools.partial(
        sort_points_by_cell, voxel_size=tuple(vox.voxel_size),
        point_cloud_range=tuple(vox.point_cloud_range)))(pts)
    w1t, b1, w2t, b2 = pfn_folded_weights(pfn)
    rows_t = fused_pfn_rows(
        keys, pts_t, w1t, b1, w2t, b2, n_layers=2, P=8, maxV=40,
        nx=mid.nx, vx=pfn.vx, vy=pfn.vy, x_off=pfn.x_offset,
        y_off=pfn.y_offset, interpret=True, block_rows=256)
    from paddle3d_tpu.ops.pallas.sorted_scatter import sorted_segment_sum
    rows = jnp.swapaxes(rows_t, 1, 2)
    table = sorted_segment_sum(keys, rows, mid.ny * mid.nx)
    out = table.reshape(2, mid.ny, mid.nx, -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_kernel_with_distance_and_5ch():
    rng = np.random.default_rng(2)
    vox, pfn, mid = build((16, 16), with_distance=True, in_channels=5)
    lo = np.array([0., -4., -2., 0., 0.])
    hi = np.array([12.8, 4., 2., 1., .5])
    pts = jnp.asarray(rng.uniform(lo, hi, (2, 600, 5)).astype(np.float32))
    ref = fused_pillar_canvas(vox, pfn, mid, pts, training=False)
    out = _fused_pillar_canvas_pallas(vox, pfn, mid, pts,
                                      with_occupancy=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
