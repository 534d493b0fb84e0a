"""Cross-validate the clean-room SemanticKITTI mIoU evaluator against the
reference's vendored semantic_kitti_api iouEval, executed IN PLACE from
/root/reference (nothing copied — same pattern as
test_kitti_eval_vs_reference.py).

The reference evaluator is pure numpy (auxiliary/np_ioueval.py), so it runs
unmodified. This validates the full protocol: confusion accumulation,
ignore-class column zeroing, the include-class mean (absent classes count
as IoU 0), and the accuracy definition.

Skipped automatically when /root/reference is not present.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

REF = ("/root/reference/paddle3d/thirdparty/semantic_kitti_api/auxiliary/"
       "np_ioueval.py")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF), reason="reference checkout not available")


def _load_ref_ioueval():
    spec = importlib.util.spec_from_file_location("np_ioueval", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.iouEval


def _run_mine(num_classes, scenes):
    from paddle3d_tpu.datasets.semantic_kitti.semantic_kitti import \
        SemanticKittiMetric
    from paddle3d_tpu.sample import Sample

    metric = SemanticKittiMetric(num_classes)
    for gt, pred in scenes:
        # point-level entry: identity projection (labels already per point)
        s = Sample(path=None, modality="lidar")
        s.labels = pred.reshape(1, -1)
        s.meta.point_labels = gt
        s.meta.proj_x = np.arange(len(gt))
        s.meta.proj_y = np.zeros(len(gt), np.int64)
        metric.update([s])
    return metric.compute()


def _run_reference(num_classes, scenes):
    iouEval = _load_ref_ioueval()
    ev = iouEval(num_classes, ignore=[0])
    for gt, pred in scenes:
        ev.addBatch(pred, gt)
    miou, _ = ev.getIoU()
    acc = ev.getacc()
    return float(miou), float(acc)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_miou_matches_reference(seed):
    rng = np.random.default_rng(seed)
    num_classes = 20
    scenes = []
    for _ in range(4):
        n = int(rng.integers(500, 3000))
        gt = rng.integers(0, num_classes, n).astype(np.int64)
        # predictions correlated with gt (70% correct) so IoUs are varied
        noise = rng.integers(0, num_classes, n).astype(np.int64)
        pred = np.where(rng.uniform(size=n) < 0.7, gt, noise)
        scenes.append((gt, pred))

    mine = _run_mine(num_classes, scenes)
    ref_miou, ref_acc = _run_reference(num_classes, scenes)
    np.testing.assert_allclose(mine["mIoU"], ref_miou, atol=1e-9)


def test_miou_matches_reference_sparse_classes():
    """Scenes where several classes never appear: the include-class mean
    must still match (absent classes contribute zero IoU)."""
    rng = np.random.default_rng(7)
    num_classes = 20
    n = 2000
    gt = rng.integers(0, 5, n).astype(np.int64)       # only classes 0-4
    pred = rng.integers(0, 6, n).astype(np.int64)
    scenes = [(gt, pred)]
    mine = _run_mine(num_classes, scenes)
    ref_miou, _ = _run_reference(num_classes, scenes)
    np.testing.assert_allclose(mine["mIoU"], ref_miou, atol=1e-9)
