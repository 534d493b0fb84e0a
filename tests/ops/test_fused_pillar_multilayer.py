"""Multi-layer fused pillar pipeline (ops.pillar_ops.fused_pillar_canvas)
vs the [V, P, C] buffer path — the CenterPoint-nuScenes configuration
(feat_channels [64, 64], reference pillar_encoder.py:64 PFNLayer concat)."""
import jax.numpy as jnp
import numpy as np
from flax import nnx

from paddle3d_tpu.models.middle_encoders import PointPillarsScatter
from paddle3d_tpu.models.voxel_encoders import PillarFeatureNet
from paddle3d_tpu.models.voxelizers import HardVoxelizer
from paddle3d_tpu.ops.pillar_ops import fused_pillar_canvas


def _setup(feat_channels):
    voxel_size = (1.0, 1.0, 4.0)
    pc_range = (0., -8., -2., 16., 8., 2.)
    rngs = nnx.Rngs(0)
    vz = HardVoxelizer(voxel_size, pc_range, 8, [100, 120])
    pfn = PillarFeatureNet(
        in_channels=4, feat_channels=feat_channels, max_num_points_in_voxel=8,
        voxel_size=voxel_size, point_cloud_range=pc_range, legacy=False,
        rngs=rngs)
    me = PointPillarsScatter(feat_channels[-1], voxel_size, pc_range)
    return vz, pfn, me


def _buffer_canvas(vz, pfn, me, pts):
    voxels, coords, num_points, vmask = vz(pts, training=False)
    feats = pfn(voxels, num_points, coords)
    feats = feats * vmask[..., None].astype(feats.dtype)
    return me(feats, coords, vmask)


def test_two_layer_fused_matches_buffer(rng):
    vz, pfn, me = _setup((16, 16))
    # eval mode: running BN stats so both paths see identical normalizers
    pfn.set_attributes(use_running_average=True, raise_if_not_found=False)

    pts = rng.uniform([0, -8, -2, 0], [16, 8, 2, 1],
                      size=(2, 256, 4)).astype(np.float32)
    pts = jnp.asarray(pts)
    ref = np.asarray(_buffer_canvas(vz, pfn, me, pts))
    out = np.asarray(fused_pillar_canvas(vz, pfn, me, pts, training=False))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_single_layer_with_occupancy(rng):
    vz, pfn, me = _setup((16,))
    pfn.set_attributes(use_running_average=True, raise_if_not_found=False)
    pts = rng.uniform([0, -8, -2, 0], [16, 8, 2, 1],
                      size=(2, 256, 4)).astype(np.float32)
    pts = jnp.asarray(pts)
    ref = np.asarray(_buffer_canvas(vz, pfn, me, pts))
    out, occ = fused_pillar_canvas(vz, pfn, me, pts, training=False,
                                   with_occupancy=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    # occupancy covers every non-empty canvas cell (a pillar CAN produce an
    # all-zero feature row, so occupancy may strictly contain the nonzero
    # set — assert containment in that direction only)
    nonzero = np.abs(ref).sum(-1) > 0
    occ = np.asarray(occ) > 0
    assert (nonzero & ~occ).sum() == 0
    assert occ.sum() >= nonzero.sum()
