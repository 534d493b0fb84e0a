"""Pallas pairwise-intersection kernel vs the XLA clip formulation
(interpret mode runs the kernel on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest


def random_boxes(rng, n):
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = rng.uniform(-20, 20, n)
    b[:, 1] = rng.uniform(-20, 20, n)
    b[:, 2] = rng.uniform(-2, 0, n)
    b[:, 3] = rng.uniform(0.5, 4.0, n)
    b[:, 4] = rng.uniform(0.5, 4.0, n)
    b[:, 5] = rng.uniform(0.5, 3.0, n)
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_pallas_clip_matches_xla(rng):
    from paddle3d_tpu.ops.box_ops import boxes_to_corners_bev
    from paddle3d_tpu.ops.iou3d_nms import _pairwise_intersection_area
    from paddle3d_tpu.ops.pallas.iou_clip import \
        pairwise_intersection_area_pallas

    # cluster boxes so a good fraction genuinely overlaps
    a = random_boxes(rng, 40)
    b = a.copy()
    b[:, :2] += rng.uniform(-1.5, 1.5, (40, 2))
    b[:, 6] += rng.uniform(-0.5, 0.5, 40)

    ca = boxes_to_corners_bev(jnp.asarray(a)).astype(jnp.float32)
    cb = boxes_to_corners_bev(jnp.asarray(b)).astype(jnp.float32)

    ref = np.asarray(_pairwise_intersection_area(ca, cb))
    out = np.asarray(
        pairwise_intersection_area_pallas(ca, cb, interpret=True))
    assert out.shape == ref.shape == (40, 40)
    assert (ref > 0.1).sum() > 40, "fixture should contain real overlaps"
    # f32 reassociation (inv-d2 multiply, hoisted side terms) wiggles the
    # crossing points by ~2e-4 area units
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_pallas_clip_identity_and_disjoint(rng):
    from paddle3d_tpu.ops.box_ops import boxes_to_corners_bev
    from paddle3d_tpu.ops.pallas.iou_clip import \
        pairwise_intersection_area_pallas

    a = random_boxes(rng, 8)
    ca = boxes_to_corners_bev(jnp.asarray(a)).astype(jnp.float32)
    out = np.asarray(
        pairwise_intersection_area_pallas(ca, ca, interpret=True))
    # diagonal = own area
    np.testing.assert_allclose(np.diag(out), a[:, 3] * a[:, 4], rtol=1e-4)

    far = a.copy()
    far[:, 0] += 1000.0
    cf = boxes_to_corners_bev(jnp.asarray(far)).astype(jnp.float32)
    out2 = np.asarray(
        pairwise_intersection_area_pallas(ca, cf, interpret=True))
    assert np.all(out2 == 0.0)
