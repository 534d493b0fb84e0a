import numpy as np
import jax.numpy as jnp

from paddle3d_tpu.ops.pointnet2 import (ball_query, farthest_point_sample,
                                        gather_operation, grouping_operation,
                                        interpolation_weights, knn_query,
                                        three_interpolate, three_nn)


def test_fps_spreads_points(rng):
    # two distant clusters: FPS must pick from both
    a = rng.normal(0, 0.1, (50, 3)) + [0, 0, 0]
    b = rng.normal(0, 0.1, (50, 3)) + [100, 0, 0]
    xyz = jnp.asarray(np.vstack([a, b]).astype(np.float32))
    mask = jnp.ones(100, bool)
    idx = np.asarray(farthest_point_sample(xyz, mask, 8))
    assert len(set(idx.tolist())) == 8  # distinct
    picked = np.asarray(xyz)[idx]
    assert (picked[:, 0] < 50).any() and (picked[:, 0] > 50).any()


def test_fps_ignores_masked(rng):
    xyz = rng.uniform(0, 10, (32, 3)).astype(np.float32)
    mask = np.zeros(32, bool)
    mask[:10] = True
    idx = np.asarray(
        farthest_point_sample(jnp.asarray(xyz), jnp.asarray(mask), 5))
    assert np.all(idx < 10)


def test_ball_query_semantics(rng):
    xyz = np.zeros((20, 3), np.float32)
    xyz[:, 0] = np.arange(20)  # points on a line, spacing 1
    centers = np.array([[0., 0., 0.], [10., 0., 0.]], np.float32)
    idx, count = ball_query(
        1.5, 4, jnp.asarray(xyz), jnp.asarray(centers),
        jnp.ones(20, bool))
    idx, count = np.asarray(idx), np.asarray(count)
    # center 0: points 0,1 in radius
    assert count[0] == 2
    assert set(idx[0, :2].tolist()) == {0, 1}
    # empty slots duplicate first hit
    assert idx[0, 2] == idx[0, 0] and idx[0, 3] == idx[0, 0]
    # center 10: points 9,10,11
    assert count[1] == 3


def test_ball_query_respects_mask(rng):
    xyz = np.zeros((10, 3), np.float32)
    mask = np.ones(10, bool)
    mask[0] = False
    idx, count = ball_query(
        1.0, 4, jnp.asarray(xyz), jnp.asarray(np.zeros((1, 3), np.float32)),
        jnp.asarray(mask))
    assert int(count[0]) == 4
    assert 0 not in np.asarray(idx)[0].tolist()


def test_gather_group(rng):
    feats = rng.normal(size=(16, 5)).astype(np.float32)
    idx = np.array([3, 1, 7], np.int32)
    np.testing.assert_allclose(
        np.asarray(gather_operation(jnp.asarray(feats), jnp.asarray(idx))),
        feats[idx])
    gidx = np.array([[0, 1], [2, 3]], np.int32)
    grouped = np.asarray(
        grouping_operation(jnp.asarray(feats), jnp.asarray(gidx)))
    np.testing.assert_allclose(grouped, feats[gidx])


def test_knn_and_interpolate(rng):
    known = rng.uniform(0, 10, (30, 3)).astype(np.float32)
    unknown = rng.uniform(0, 10, (7, 3)).astype(np.float32)
    mask = np.ones(30, bool)
    d2, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known),
                       jnp.asarray(mask))
    d2, idx = np.asarray(d2), np.asarray(idx)
    # brute-force check
    full = ((unknown[:, None] - known[None])**2).sum(-1)
    np.testing.assert_allclose(np.sort(d2, axis=1),
                               np.sort(full, axis=1)[:, :3], rtol=1e-5)
    w = interpolation_weights(jnp.asarray(d2))
    feats = rng.normal(size=(30, 4)).astype(np.float32)
    out = three_interpolate(jnp.asarray(feats), jnp.asarray(idx), w)
    assert out.shape == (7, 4)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
