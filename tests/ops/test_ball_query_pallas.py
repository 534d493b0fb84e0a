"""Parity test: Pallas ball-query kernel vs the XLA reference formulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddle3d_tpu.ops.pallas.ball_query import ball_query_batched
from paddle3d_tpu.ops.pointnet2 import ball_query


def _clustered(rng, b, n, valid):
    pts = np.zeros((b, n, 3), np.float32)
    for i in range(b):
        centers = rng.uniform(-20, 20, size=(8, 3)).astype(np.float32)
        asn = rng.integers(0, 8, size=n)
        pts[i] = centers[asn] + rng.normal(0, 1.5, size=(n, 3))
    mask = np.arange(n)[None, :] < np.asarray(valid)[:, None]
    return jnp.asarray(pts), jnp.asarray(mask)


@pytest.mark.parametrize("m,n,nsample,radius", [
    (200, 700, 16, 1.2),
    (64, 2048, 32, 0.8),
    (513, 1000, 8, 2.5),
])
def test_pallas_matches_xla(m, n, nsample, radius):
    rng = np.random.default_rng(0)
    b = 3
    xyz, mask = _clustered(rng, b, n, [n, n - 57, max(n // 3, 1)])
    q, _ = _clustered(rng, b, m, [m, m, m])
    new_xyz = q[:, :m]

    idx_p, cnt_p = ball_query_batched(radius, nsample, xyz, new_xyz, mask,
                                      interpret=True)
    idx_x, cnt_x = ball_query_batched(radius, nsample, xyz, new_xyz, mask,
                                      force_xla=True)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_x))
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


def test_no_points_in_range():
    b, n, m = 1, 256, 8
    xyz = jnp.ones((b, n, 3)) * 50.0
    mask = jnp.ones((b, n), bool)
    q = jnp.zeros((b, m, 3))
    idx, cnt = ball_query_batched(0.5, 4, xyz, q, mask, interpret=True)
    assert np.all(np.asarray(cnt) == 0)
    assert np.all(np.asarray(idx) == 0)
