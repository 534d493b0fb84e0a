"""Parity test: Pallas FPS kernel vs the XLA fori_loop formulation."""
import jax.numpy as jnp
import numpy as np
import pytest

from paddle3d_tpu.ops.pallas.fps import farthest_point_sample_batched


@pytest.mark.parametrize("n,npoint,valid", [
    (1200, 128, (1200, 777)),
    (4096, 512, (4096, 100)),
])
def test_pallas_fps_matches_xla(n, npoint, valid):
    rng = np.random.default_rng(3)
    b = 2
    pts = np.zeros((b, n, 3), np.float32)
    for i in range(b):
        c = rng.uniform(-30, 30, (6, 3)).astype(np.float32)
        pts[i] = c[rng.integers(0, 6, n)] + rng.normal(0, 2.0, (n, 3))
    mask = np.arange(n)[None, :] < np.asarray(valid)[:, None]
    xyz, m = jnp.asarray(pts), jnp.asarray(mask)

    idx_p = farthest_point_sample_batched(xyz, m, npoint, interpret=True)
    idx_x = farthest_point_sample_batched(xyz, m, npoint, force_xla=True)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
