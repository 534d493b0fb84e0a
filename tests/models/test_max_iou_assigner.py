"""MaxIoUAssigner (nearest-BEV, mmdet 4-step protocol) vs a sequential
numpy oracle mirroring the reference loop
(max_iou_assigner.py:227 assign)."""
import jax.numpy as jnp
import numpy as np

from paddle3d_tpu.models.heads.target_assigners import MaxIoUAssigner
from paddle3d_tpu.models.detection.pointpillars.target_assigner import \
    nearest_iou_similarity


def _oracle(iou, pos_thr, neg_thr, min_pos_iou, gt_max_assign_all):
    a, g = iou.shape
    assigned = np.full(a, -1, np.int64)
    max_overlaps = iou.max(axis=1) if g else np.full(a, -1.)
    argmax = iou.argmax(axis=1) if g else np.zeros(a, np.int64)
    assigned[(max_overlaps >= 0) & (max_overlaps < neg_thr)] = 0
    pos = max_overlaps >= pos_thr
    assigned[pos] = argmax[pos] + 1
    for i in range(g):
        gt_best = iou[:, i].max()
        if gt_best >= min_pos_iou:
            if gt_max_assign_all:
                assigned[iou[:, i] == gt_best] = i + 1
            else:
                assigned[iou[:, i].argmax()] = i + 1
    return assigned


def test_max_iou_assigner_matches_oracle(rng):
    a, g = 64, 7
    boxes = np.zeros((a, 7), np.float32)
    boxes[:, :2] = rng.uniform(-20, 20, (a, 2))
    boxes[:, 3:5] = rng.uniform(1, 4, (a, 2))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, a)
    gts = np.zeros((g, 7), np.float32)
    gts[:, :2] = boxes[rng.integers(0, a, g), :2] + rng.normal(0, 1, (g, 2))
    gts[:, 3:5] = rng.uniform(1, 4, (g, 2))
    gts[:, 6] = rng.uniform(-np.pi, np.pi, g)
    labels = np.zeros(g, np.int64)
    labels[-2:] = -1  # padding rows

    assigner = MaxIoUAssigner(pos_iou_thr=0.6, neg_iou_thr=0.45,
                              min_pos_iou=0.3)
    assigned, mo = assigner.assign(jnp.asarray(boxes), jnp.asarray(gts),
                                   jnp.asarray(labels))

    iou = np.asarray(nearest_iou_similarity(jnp.asarray(boxes),
                                            jnp.asarray(gts)))
    iou = iou[:, :g - 2]  # oracle sees only valid gts
    want = _oracle(iou, 0.6, 0.45, 0.3, True)
    np.testing.assert_array_equal(np.asarray(assigned), want)
    np.testing.assert_allclose(np.asarray(mo), iou.max(axis=1), atol=1e-6)


def test_max_iou_assigner_single_best(rng):
    assigner = MaxIoUAssigner(pos_iou_thr=0.9, neg_iou_thr=0.3,
                              min_pos_iou=0.1, gt_max_assign_all=False)
    boxes = np.array([[0, 0, 0, 4, 4, 1, 0],
                      [0.5, 0, 0, 4, 4, 1, 0],
                      [20, 0, 0, 4, 4, 1, 0]], np.float32)
    gts = np.array([[0.2, 0, 0, 4, 4, 1, 0]], np.float32)
    labels = np.zeros(1, np.int64)
    assigned, _ = assigner.assign(jnp.asarray(boxes), jnp.asarray(gts),
                                  jnp.asarray(labels))
    assigned = np.asarray(assigned)
    assert (assigned == 1).sum() == 1   # only the single best anchor claimed
    assert assigned[2] == 0             # far anchor negative


def test_max_iou_assigner_empty_gt():
    """All-padding gt -> everything background (reference
    assign_wrt_overlaps num_gts == 0 behavior)."""
    assigner = MaxIoUAssigner(pos_iou_thr=0.6, neg_iou_thr=0.45)
    boxes = np.zeros((5, 7), np.float32)
    boxes[:, 3:6] = 1.0
    gts = np.zeros((3, 7), np.float32)
    labels = np.full(3, -1, np.int64)
    assigned, mo = assigner.assign(jnp.asarray(boxes), jnp.asarray(gts),
                                   jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(assigned), 0)
    np.testing.assert_array_equal(np.asarray(mo), 0.0)
