"""Rotated-IoU cross-validation against OpenCV's independent geometry.

cv2.rotatedRectangleIntersection is a third-party exact convex-intersection
oracle (no code shared with either this repo or the reference), so agreement
here is genuine parity evidence for:
  - geometries.bbox.rotated_iou_2d (host evaluator path), and
  - ops.iou3d_nms.boxes_iou_bev (device NMS path),
which together back every KITTI/Waymo AP number and every NMS decision.
(reference comparator: paddle3d/ops/iou3d_nms/iou3d_nms_kernel.cu:275 and
thirdparty/kitti_object_eval_python/rotate_iou.py:294)
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from paddle3d_tpu.geometries.bbox import rotated_iou_2d


def _cv2_inter_area(a, b):
    """Intersection area of two (cx, cy, dx, dy, yaw_rad) boxes via cv2."""
    ra = ((float(a[0]), float(a[1])), (float(a[2]), float(a[3])),
          float(np.degrees(a[4])))
    rb = ((float(b[0]), float(b[1])), (float(b[2]), float(b[3])),
          float(np.degrees(b[4])))
    ret, pts = cv2.rotatedRectangleIntersection(ra, rb)
    if ret == cv2.INTERSECT_NONE or pts is None:
        return 0.0
    hull = cv2.convexHull(pts)
    return float(cv2.contourArea(hull))


def _random_boxes(rng, n, spread=10.0):
    return np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread, spread, n),
        rng.uniform(0.5, 6.0, n),
        rng.uniform(0.5, 6.0, n),
        rng.uniform(-np.pi, np.pi, n),
    ], axis=1).astype(np.float64)


def test_rotated_iou_2d_matches_cv2(rng):
    a = _random_boxes(rng, 40)
    b = _random_boxes(rng, 40)
    iou = rotated_iou_2d(a, b)
    for i in range(a.shape[0]):
        for j in range(b.shape[0]):
            inter = _cv2_inter_area(a[i], b[j])
            union = a[i, 2] * a[i, 3] + b[j, 2] * b[j, 3] - inter
            expect = inter / max(union, 1e-9)
            np.testing.assert_allclose(iou[i, j], expect, atol=2e-4)


def test_rotated_iou_2d_overlapping_cluster_matches_cv2(rng):
    # dense cluster: most pairs genuinely intersect (the hard branch)
    a = _random_boxes(rng, 30, spread=2.0)
    b = _random_boxes(rng, 30, spread=2.0)
    iou = rotated_iou_2d(a, b)
    n_pos = 0
    for i in range(a.shape[0]):
        for j in range(b.shape[0]):
            inter = _cv2_inter_area(a[i], b[j])
            union = a[i, 2] * a[i, 3] + b[j, 2] * b[j, 3] - inter
            expect = inter / max(union, 1e-9)
            n_pos += expect > 0.1
            np.testing.assert_allclose(iou[i, j], expect, atol=2e-4)
    assert n_pos > 100  # the cluster really exercises intersections


def test_device_iou_bev_matches_cv2(rng):
    import jax.numpy as jnp

    from paddle3d_tpu.ops import boxes_iou_bev

    a = _random_boxes(rng, 24, spread=3.0).astype(np.float32)
    b = _random_boxes(rng, 24, spread=3.0).astype(np.float32)
    iou = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    for i in range(a.shape[0]):
        for j in range(b.shape[0]):
            inter = _cv2_inter_area(a[i], b[j])
            union = a[i, 2] * a[i, 3] + b[j, 2] * b[j, 3] - inter
            expect = inter / max(union, 1e-9)
            np.testing.assert_allclose(iou[i, j], expect, atol=5e-3)
