"""Parity of the fused voxelize+mean (ops/voxelize.voxel_mean) against the
buffer path (hard_voxelize -> VoxelMean)."""
import jax.numpy as jnp
import numpy as np
import pytest

from paddle3d_tpu.models.voxel_encoders.voxel_encoder import VoxelMean
from paddle3d_tpu.ops.voxelize import (hard_voxelize_batch, voxel_mean_batch)

VS = (0.4, 0.4, 1.0)
PCR = (-4.0, -4.0, -2.0, 4.0, 4.0, 2.0)


def _pts(rng, b, n, c, nan_tail=50):
    pts = rng.uniform(-4.2, 4.2, size=(b, n, c)).astype(np.float32)
    pts[:, n - nan_tail:, :] = np.nan
    return pts


@pytest.mark.parametrize("maxp,maxv,cin", [
    (10, 64, None),     # voxel cap binds (64 << occupied cells)
    (2, 4096, 4),       # point cap binds; in_channels < C
    (10, 4096, None),   # nothing binds
])
def test_fused_matches_buffer_path(rng, maxp, maxv, cin):
    b, n, c = 2, 1200, 5
    pts = _pts(rng, b, n, c)
    voxels, coords, num_points, vmask = hard_voxelize_batch(
        pts, VS, PCR, maxp, maxv)
    enc = VoxelMean(in_channels=cin or c)
    ref_feats = enc(jnp.asarray(voxels), jnp.asarray(num_points),
                    jnp.asarray(coords))
    ref_feats = ref_feats * jnp.asarray(vmask)[..., None].astype(
        ref_feats.dtype)

    feats, fcoords, fnum, fmask = voxel_mean_batch(
        jnp.asarray(pts), VS, PCR, maxp, maxv, in_channels=cin)

    np.testing.assert_array_equal(np.asarray(fmask), np.asarray(vmask))
    np.testing.assert_array_equal(np.asarray(fcoords)[np.asarray(fmask)],
                                  np.asarray(coords)[np.asarray(vmask)])
    np.testing.assert_array_equal(np.asarray(fnum), np.asarray(num_points))
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref_feats),
                               rtol=1e-5, atol=1e-5)


def test_fused_bf16_points(rng):
    """bf16 inputs (the bench/AMP path): same binning and near-identical
    means as the bf16 BUFFER path (bf16 coords quantize differently from
    f32 near cell boundaries, so cross-dtype comparison is meaningless —
    compare within the dtype)."""
    b, n, c = 2, 800, 5
    pts = jnp.asarray(_pts(rng, b, n, c), jnp.bfloat16)
    voxels, coords, num_points, vmask = hard_voxelize_batch(
        pts, VS, PCR, 10, 512)
    enc = VoxelMean(in_channels=c)
    ref = enc(voxels, num_points, coords)
    ref = ref * vmask[..., None].astype(ref.dtype)

    feats16, c16, n16, m16 = voxel_mean_batch(pts, VS, PCR, 10, 512)
    assert feats16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(m16), np.asarray(vmask))
    np.testing.assert_array_equal(np.asarray(c16)[np.asarray(m16)],
                                  np.asarray(coords)[np.asarray(vmask)])
    np.testing.assert_allclose(
        np.asarray(feats16, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_all_invalid_sample(rng):
    pts = np.full((1, 100, 5), np.nan, np.float32)
    feats, coords, num, mask = voxel_mean_batch(
        jnp.asarray(pts), VS, PCR, 10, 64)
    assert not bool(np.asarray(mask).any())
    assert float(np.abs(np.asarray(feats, np.float32)).sum()) == 0.0
