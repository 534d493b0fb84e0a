"""ProposalTargetLayer parity: rotated-IoU matching, fg/bg subsampling
capacities, and IoU-conditioned cls targets vs a numpy oracle (reference:
paddle3d/models/heads/roi_heads/target_assigner/proposal_target_layer.py:27,
90,157)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def axis_aligned_iou3d(a, b):
    """Oracle 3D IoU for axis-aligned (yaw=0) boxes, bottom-z convention."""
    out = np.zeros((len(a), len(b)))
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            lo = np.maximum(x[:3] - [x[3] / 2, x[4] / 2, 0],
                            y[:3] - [y[3] / 2, y[4] / 2, 0])
            hi = np.minimum(x[:3] + [x[3] / 2, x[4] / 2, x[5]],
                            y[:3] + [y[3] / 2, y[4] / 2, y[5]])
            inter = np.prod(np.maximum(hi - lo, 0))
            union = x[3] * x[4] * x[5] + y[3] * y[4] * y[5] - inter
            out[i, j] = inter / max(union, 1e-9)
    return out


def make_scene(rng, p=32, g=4):
    gt = np.zeros((g, 7), np.float32)
    gt[:, 0] = rng.uniform(-20, 20, g)
    gt[:, 1] = rng.uniform(-20, 20, g)
    gt[:, 2] = -1.8
    gt[:, 3:6] = [1.6, 3.9, 1.5]
    gt_labels = np.array([0, 0, 1, -1], np.int32)

    rois = np.zeros((p, 7), np.float32)
    # half the rois are jittered copies of gts (fg-ish), half are far away
    for i in range(p // 2):
        rois[i] = gt[i % g]
        rois[i, :2] += rng.uniform(-0.4, 0.4, 2)
    rois[p // 2:, 0] = rng.uniform(30, 60, p - p // 2)
    rois[p // 2:, 1] = rng.uniform(30, 60, p - p // 2)
    rois[p // 2:, 2] = -1.8
    rois[p // 2:, 3:6] = [1.6, 3.9, 1.5]
    roi_labels = np.tile(np.array([0, 0, 1, 1], np.int32), p // 4)
    roi_scores = rng.uniform(0.1, 1.0, p).astype(np.float32)
    return rois, roi_labels, roi_scores, gt, gt_labels


def test_match_rois_to_gt_vs_oracle(rng):
    from paddle3d_tpu.models.heads.proposal_target_layer import \
        match_rois_to_gt

    rois, roi_labels, roi_scores, gt, gt_labels = make_scene(rng)
    max_iou, assign = jax.jit(match_rois_to_gt, static_argnames="by_class")(
        jnp.asarray(rois), jnp.ones(len(rois), bool),
        jnp.asarray(roi_labels), jnp.asarray(gt), jnp.asarray(gt_labels),
        by_class=True)

    oracle = axis_aligned_iou3d(rois, gt)
    oracle[:, gt_labels < 0] = 0
    class_ok = roi_labels[:, None] == gt_labels[None, :]
    oracle = np.where(class_ok, oracle, 0)
    np.testing.assert_allclose(np.asarray(max_iou), oracle.max(1),
                               atol=2e-3)
    # assignment agrees wherever a real overlap exists
    has = oracle.max(1) > 0.05
    np.testing.assert_array_equal(np.asarray(assign)[has],
                                  oracle.argmax(1)[has])


def test_subsample_capacities_and_cls_targets(rng):
    from paddle3d_tpu.models.heads.proposal_target_layer import (
        ProposalTargetConfig, proposal_targets)

    rois, roi_labels, roi_scores, gt, gt_labels = make_scene(rng, p=64)
    cfg = ProposalTargetConfig(roi_per_image=16, fg_ratio=0.5,
                               reg_fg_thresh=0.55, cls_fg_thresh=0.75,
                               cls_bg_thresh=0.25, cls_bg_thresh_lo=0.1,
                               hard_bg_ratio=0.8)
    out = jax.jit(lambda k, *a: proposal_targets(k, *a, cfg))(
        jax.random.key(0), jnp.asarray(rois)[None],
        jnp.ones((1, len(rois)), bool), jnp.asarray(roi_labels)[None],
        jnp.asarray(roi_scores)[None], jnp.asarray(gt)[None],
        jnp.asarray(gt_labels)[None])
    out = jax.device_get(out)

    assert out["rois"].shape == (1, 16, 7)
    assert out["valid"].all(), "scene has fg and bg: all slots fill"

    oracle = axis_aligned_iou3d(rois, gt)
    oracle[:, gt_labels < 0] = 0
    oracle = np.where(roi_labels[:, None] == gt_labels[None, :], oracle, 0)
    n_fg_avail = int((oracle.max(1) >= 0.55).sum())
    exp_fg = min(8, n_fg_avail)  # fg_ratio * roi_per_image = 8
    n_fg_sel = int((out["roi_ious"][0] >= 0.55).sum())
    assert n_fg_sel == exp_fg

    # cls targets: fg -> 1, easy bg -> 0, interval -> soft value in (0,1)
    ious = out["roi_ious"][0]
    cls = out["rcnn_cls_labels"][0]
    assert np.all(cls[ious > 0.75] == 1.0)
    assert np.all(cls[ious < 0.25] == 0.0)
    mid = (ious >= 0.25) & (ious <= 0.75)
    np.testing.assert_allclose(cls[mid], (ious[mid] - 0.25) / 0.5,
                               atol=1e-5)
    # reg mask matches reg_fg_thresh
    np.testing.assert_array_equal(out["reg_valid_mask"][0], ious > 0.55)

    # sampled fg rois carry their matched gt
    fg = ious >= 0.55
    assert np.all(out["gt_label_of_rois"][0][fg] >= 0)
    d = np.linalg.norm(out["rois"][0][fg, :2] -
                       out["gt_of_rois"][0][fg, :2], axis=-1)
    assert np.all(d < 1.0)


def test_no_fg_all_bg(rng):
    from paddle3d_tpu.models.heads.proposal_target_layer import (
        ProposalTargetConfig, proposal_targets)

    rois, roi_labels, roi_scores, gt, gt_labels = make_scene(rng, p=32)
    rois[:, :2] += 100.0  # no roi overlaps any gt
    cfg = ProposalTargetConfig(roi_per_image=8)
    out = jax.device_get(proposal_targets(
        jax.random.key(1), jnp.asarray(rois)[None],
        jnp.ones((1, len(rois)), bool), jnp.asarray(roi_labels)[None],
        jnp.asarray(roi_scores)[None], jnp.asarray(gt)[None],
        jnp.asarray(gt_labels)[None], cfg))
    assert out["valid"].all()
    assert not out["reg_valid_mask"].any()
    assert np.all(out["rcnn_cls_labels"] == 0.0)


def test_no_bg_all_fg(rng):
    from paddle3d_tpu.models.heads.proposal_target_layer import (
        ProposalTargetConfig, proposal_targets)

    gt = np.array([[0, 0, -1.8, 1.6, 3.9, 1.5, 0.]], np.float32)
    gt_labels = np.array([0], np.int32)
    rois = np.tile(gt, (6, 1))
    cfg = ProposalTargetConfig(roi_per_image=8, fg_ratio=0.5)
    out = jax.device_get(proposal_targets(
        jax.random.key(2), jnp.asarray(rois)[None],
        jnp.ones((1, 6), bool), jnp.zeros((1, 6), np.int32),
        jnp.ones((1, 6), np.float32), jnp.asarray(gt)[None],
        jnp.asarray(gt_labels)[None], cfg))
    # reference fills all roi_per_image slots with (repeated) fg
    assert out["valid"].all()
    assert np.all(out["roi_ious"] > 0.99)
