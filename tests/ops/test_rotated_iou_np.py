import numpy as np
import jax.numpy as jnp

from paddle3d_tpu.geometries.bbox import rotated_iou_2d
from paddle3d_tpu.ops import boxes_iou_bev


def test_numpy_iou_matches_jax(rng):
    a = rng.uniform(0, 10, (15, 5)).astype(np.float32)
    b = rng.uniform(0, 10, (11, 5)).astype(np.float32)
    a[:, 2:4] = rng.uniform(0.5, 4, (15, 2))
    b[:, 2:4] = rng.uniform(0.5, 4, (11, 2))
    a[:, 4] = rng.uniform(-np.pi, np.pi, 15)
    b[:, 4] = rng.uniform(-np.pi, np.pi, 11)
    got = rotated_iou_2d(a, b)
    want = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_numpy_iou_criteria():
    # inter/area_a and inter/area_b denominators (DontCare modes)
    a = np.array([[0, 0, 2, 2, 0]], np.float32)   # area 4
    b = np.array([[1, 0, 2, 2, 0]], np.float32)   # overlap 2
    np.testing.assert_allclose(rotated_iou_2d(a, b, -1)[0, 0], 2 / 6,
                               atol=1e-5)
    np.testing.assert_allclose(rotated_iou_2d(a, b, 0)[0, 0], 0.5, atol=1e-5)
    np.testing.assert_allclose(rotated_iou_2d(a, b, 1)[0, 0], 0.5, atol=1e-5)


def test_numpy_iou_empty():
    a = np.zeros((0, 5), np.float32)
    b = np.ones((3, 5), np.float32)
    assert rotated_iou_2d(a, b).shape == (0, 3)
