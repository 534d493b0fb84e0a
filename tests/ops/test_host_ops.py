import numpy as np
import jax.numpy as jnp

from paddle3d_tpu.ops.host_ops import (host_hard_voxelize,
                                       host_points_in_boxes,
                                       native_available)

VS = (0.5, 0.5, 4.0)
PR = (0.0, 0.0, -2.0, 8.0, 8.0, 2.0)


def test_native_builds():
    assert native_available(), "g++ build of csrc/host_ops.cpp failed"


def test_host_voxelize_matches_device(rng):
    from paddle3d_tpu.ops import hard_voxelize
    pts = rng.uniform(-1, 9, (300, 4)).astype(np.float32)
    hv, hc, hn, nv = host_hard_voxelize(pts, VS, PR, 8, 64)
    dv, dc, dn, dmask = hard_voxelize(jnp.asarray(pts), VS, PR, 8, 64)
    dv, dc, dn = map(np.asarray, (dv, dc, dn))
    assert nv == int(np.asarray(dmask).sum())
    host = {tuple(hc[i]): set(map(tuple, hv[i, :hn[i]].tolist()))
            for i in range(nv)}
    dev = {tuple(dc[i]): set(map(tuple, dv[i, :dn[i]].tolist()))
           for i in range(nv)}
    assert host == dev


def test_host_points_in_boxes(rng):
    pts = rng.uniform(-5, 5, (200, 4)).astype(np.float32)
    boxes = np.array([
        [0., 0., -1., 2., 4., 2., 0.3],
        [3., 3., -1., 1., 1., 1., -0.5],
    ], np.float32)
    got = host_points_in_boxes(pts, boxes)
    # cross-check vs the geometry module's polygon test (BEV) + z
    from paddle3d_tpu.geometries import points_in_rbbox_bev
    ref = points_in_rbbox_bev(pts, boxes, origin=(0.5, 0.5, 0.0))
    np.testing.assert_array_equal(got, ref)
