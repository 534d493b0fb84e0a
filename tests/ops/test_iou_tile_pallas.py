"""Tiled Pallas intersection-area kernel (ops/pallas/iou_tile.py) vs the
fused XLA slot-list clip (interpret mode runs the kernel on CPU)."""
import jax.numpy as jnp
import numpy as np

from test_iou_clip_pallas import random_boxes


def test_tiled_clip_matches_xla(rng):
    from paddle3d_tpu.ops.box_ops import boxes_to_corners_bev
    from paddle3d_tpu.ops.iou3d_nms import _pairwise_intersection_area
    from paddle3d_tpu.ops.pallas.iou_tile import \
        pairwise_intersection_area_tiled

    a = random_boxes(rng, 150)  # non-multiple of the 128 tile => padding path
    b = a.copy()
    b[:, :2] += rng.uniform(-1.5, 1.5, (150, 2))
    b[:, 6] += rng.uniform(-0.5, 0.5, 150)

    ca = boxes_to_corners_bev(jnp.asarray(a)).astype(jnp.float32)
    cb = boxes_to_corners_bev(jnp.asarray(b)).astype(jnp.float32)

    ref = np.asarray(_pairwise_intersection_area(ca, cb))
    out = np.asarray(pairwise_intersection_area_tiled(ca, cb, interpret=True))
    assert out.shape == ref.shape == (150, 150)
    assert (ref > 0.1).sum() > 150, "fixture should contain real overlaps"
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_tiled_clip_identity_and_disjoint(rng):
    from paddle3d_tpu.ops.box_ops import boxes_to_corners_bev
    from paddle3d_tpu.ops.pallas.iou_tile import \
        pairwise_intersection_area_tiled

    a = random_boxes(rng, 16)
    ca = boxes_to_corners_bev(jnp.asarray(a)).astype(jnp.float32)
    out = np.asarray(pairwise_intersection_area_tiled(ca, ca, interpret=True))
    np.testing.assert_allclose(np.diag(out), a[:, 3] * a[:, 4], rtol=1e-4)

    far = a.copy()
    far[:, 0] += 1000.0
    cf = boxes_to_corners_bev(jnp.asarray(far)).astype(jnp.float32)
    out2 = np.asarray(pairwise_intersection_area_tiled(ca, cf, interpret=True))
    assert np.all(out2 == 0.0)
