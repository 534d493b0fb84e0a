import numpy as np
import jax.numpy as jnp

from paddle3d_tpu.ops import hard_voxelize, hard_voxelize_batch, pillar_scatter

VOXEL_SIZE = (0.5, 0.5, 4.0)
PC_RANGE = (0.0, 0.0, -2.0, 8.0, 8.0, 2.0)


def _ref_voxelize(points, voxel_size, pc_range, max_pts, max_vox):
    """Slow numpy reference with the same first-arrival semantics."""
    vs = np.asarray(voxel_size)
    lo = np.asarray(pc_range[:3])
    hi = np.asarray(pc_range[3:])
    grid = np.round((hi - lo) / vs).astype(int)
    voxels = {}
    order = []
    for i, p in enumerate(points):
        if not np.all(np.isfinite(p[:3])):
            continue
        c = np.floor((p[:3] - lo) / vs).astype(int)
        if np.any(c < 0) or np.any(c >= grid):
            continue
        key = tuple(c[::-1])  # (z, y, x)
        if key not in voxels:
            if len(voxels) >= max_vox:
                # late voxels beyond capacity are dropped entirely
                continue
            voxels[key] = []
            order.append(key)
        if len(voxels[key]) < max_pts:
            voxels[key].append(p)
    return voxels, order


def test_hard_voxelize_matches_reference(rng):
    pts = rng.uniform(-1, 9, size=(200, 4)).astype(np.float32)
    v, coords, npts, mask = hard_voxelize(
        jnp.asarray(pts), VOXEL_SIZE, PC_RANGE, max_points_in_voxel=8,
        max_voxels=64)
    v, coords, npts, mask = map(np.asarray, (v, coords, npts, mask))

    ref, _ = _ref_voxelize(pts, VOXEL_SIZE, PC_RANGE, 8, 64)
    got = {}
    for i in range(64):
        if not mask[i]:
            continue
        key = tuple(coords[i])
        got[key] = [v[i, j] for j in range(npts[i])]

    assert set(got.keys()) == set(ref.keys())
    for key in ref:
        ref_pts = np.stack(ref[key])
        got_pts = np.stack(got[key])
        # same point *sets* per voxel (order inside voxel is input order for
        # both, so compare directly)
        np.testing.assert_allclose(got_pts, ref_pts, rtol=1e-6)


def test_hard_voxelize_respects_caps(rng):
    # all points into one voxel -> num_points capped
    pts = np.tile(np.array([[1.1, 1.1, 0.0, 1.0]], np.float32), (50, 1))
    v, coords, npts, mask = hard_voxelize(
        jnp.asarray(pts), VOXEL_SIZE, PC_RANGE, max_points_in_voxel=4,
        max_voxels=8)
    assert int(mask.sum()) == 1
    assert int(npts[0]) == 4
    np.testing.assert_array_equal(np.asarray(coords[0]), [0, 2, 2])


def test_hard_voxelize_handles_padding_nan():
    pts = np.full((32, 4), np.nan, np.float32)
    pts[0] = [1.0, 1.0, 0.0, 0.5]
    v, coords, npts, mask = hard_voxelize(
        jnp.asarray(pts), VOXEL_SIZE, PC_RANGE, max_points_in_voxel=4,
        max_voxels=8)
    assert int(mask.sum()) == 1
    assert int(npts.sum()) == 1


def test_batch_voxelize_and_scatter(rng):
    pts = rng.uniform(0, 8, size=(2, 100, 4)).astype(np.float32)
    v, coords, npts, mask = hard_voxelize_batch(
        jnp.asarray(pts), VOXEL_SIZE, PC_RANGE, 8, 64)
    assert v.shape == (2, 64, 8, 4)
    feats = jnp.mean(v, axis=2)  # [2, 64, 4]
    canvas = pillar_scatter(feats, coords, mask, ny=16, nx=16)
    assert canvas.shape == (2, 16, 16, 4)
    # every valid pillar lands at its (y, x) cell
    coords_np, mask_np = np.asarray(coords), np.asarray(mask)
    canvas_np, feats_np = np.asarray(canvas), np.asarray(feats)
    for b in range(2):
        for i in range(64):
            if mask_np[b, i]:
                y, x = coords_np[b, i, 1], coords_np[b, i, 2]
                np.testing.assert_allclose(
                    canvas_np[b, y, x], feats_np[b, i], rtol=1e-6)
