"""Cross-validate the clean-room KITTI AP evaluator against the reference's
vendored kitti_object_eval_python, executed IN PLACE from /root/reference
(nothing is copied into this repo).

The reference evaluator is numba/CUDA-jitted; here numba is replaced by a
no-op decorator stub (pure-Python execution — fine for tiny synthetic
scenes) and its CUDA rotated-IoU by a host intersection built on
geometries.bbox.rotated_iou_2d, which tests/parity/test_rotated_iou_cv2.py
independently validates against OpenCV. What this test therefore verifies
is the whole AP *protocol*: difficulty gating, Van/Person_sitting neighbor
classes, DontCare regions, greedy per-gt matching, 41-point recall-sampled
thresholds, and R11/R40 interpolation
(reference: paddle3d/thirdparty/kitti_object_eval_python/eval.py:482).

Skipped automatically when /root/reference is not present.
"""
import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/paddle3d/thirdparty/kitti_object_eval_python"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not available")

from paddle3d_tpu.datasets.kitti.eval import (METRIC_3D, METRIC_BBOX,
                                              METRIC_BEV, ap_r11, ap_r40,
                                              eval_class)
from paddle3d_tpu.geometries.bbox import rotated_iou_2d


def _numba_stub():
    """numba module whose jit decorators are passthroughs."""
    mod = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(fn):
            return fn

        return deco

    mod.jit = jit
    mod.njit = jit
    mod.prange = range
    cuda = types.ModuleType("numba.cuda")
    cuda.jit = jit
    mod.cuda = cuda
    return mod


def _rotate_iou_stub(boxes, qboxes, criterion=-1, device_id=0):
    """Host replacement for the reference's CUDA rotate_iou_gpu_eval.

    boxes/qboxes: [N,5] (x, z, l, w, ry). criterion: -1 IoU, 0 inter/area_a,
    1 inter/area_b, else raw intersection area (the mode d3_box_overlap
    uses, rotate_iou.py:294).
    """
    boxes = np.asarray(boxes, np.float64)
    qboxes = np.asarray(qboxes, np.float64)
    if boxes.shape[0] == 0 or qboxes.shape[0] == 0:
        return np.zeros((boxes.shape[0], qboxes.shape[0]), np.float32)
    area_a = boxes[:, 2] * boxes[:, 3]
    area_b = qboxes[:, 2] * qboxes[:, 3]
    inter = rotated_iou_2d(boxes, qboxes, criterion=0) * area_a[:, None]
    if criterion == -1:
        denom = area_a[:, None] + area_b[None, :] - inter
    elif criterion == 0:
        denom = np.broadcast_to(area_a[:, None], inter.shape)
    elif criterion == 1:
        denom = np.broadcast_to(area_b[None, :], inter.shape)
    else:
        return inter.astype(np.float32)
    return (inter / np.maximum(denom, 1e-9)).astype(np.float32)


@pytest.fixture(scope="module")
def ref_eval():
    """Load the reference eval.py from /root/reference with stubs."""
    import importlib.util

    saved = {k: sys.modules.get(k) for k in
             ("numba", "kitti_ref", "kitti_ref.rotate_iou", "kitti_ref.eval")}
    sys.modules["numba"] = _numba_stub()
    pkg = types.ModuleType("kitti_ref")
    pkg.__path__ = [REF_DIR]
    sys.modules["kitti_ref"] = pkg
    riou = types.ModuleType("kitti_ref.rotate_iou")
    riou.rotate_iou_gpu_eval = _rotate_iou_stub
    sys.modules["kitti_ref.rotate_iou"] = riou
    spec = importlib.util.spec_from_file_location(
        "kitti_ref.eval", os.path.join(REF_DIR, "eval.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["kitti_ref.eval"] = mod
    spec.loader.exec_module(mod)
    yield mod
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def _synthetic_annos(rng, n_frames=16):
    """Random camera-frame scenes with gt/dt pairs in BOTH dict conventions.

    Returns (gt_ref, dt_ref, gt_ours, dt_ours): the reference stores
    dimensions as (l, h, w) (kitti_common.get_label_annos), ours as the
    raw KITTI label order (h, w, l).
    """
    classes = ["Car", "Car", "Car", "Van", "Pedestrian", "Cyclist",
               "Person_sitting", "DontCare"]
    gt_ref, dt_ref, gt_ours, dt_ours = [], [], [], []
    for _ in range(n_frames):
        n_gt = rng.integers(0, 7)
        names, trunc, occl, bbox, dims_hwl, loc, rot = [], [], [], [], [], [], []
        for _ in range(n_gt):
            name = classes[rng.integers(0, len(classes))]
            names.append(name)
            trunc.append(float(rng.uniform(0, 0.6)))
            occl.append(int(rng.integers(0, 4)))
            x1 = rng.uniform(0, 1100)
            y1 = rng.uniform(0, 300)
            h_px = rng.uniform(15, 120)
            bbox.append([x1, y1, x1 + h_px * rng.uniform(0.8, 2.5),
                         y1 + h_px])
            if name == "Pedestrian" or name == "Person_sitting":
                d = [rng.uniform(1.5, 1.9), rng.uniform(0.4, 0.8),
                     rng.uniform(0.4, 1.0)]
            elif name == "Cyclist":
                d = [rng.uniform(1.5, 1.9), rng.uniform(0.4, 0.8),
                     rng.uniform(1.5, 2.0)]
            else:
                d = [rng.uniform(1.4, 1.8), rng.uniform(1.5, 1.9),
                     rng.uniform(3.5, 4.8)]
            dims_hwl.append(d)
            loc.append([rng.uniform(-20, 20), rng.uniform(1.2, 2.2),
                        rng.uniform(5, 60)])
            rot.append(float(rng.uniform(-np.pi, np.pi)))

        # detections: perturbed copies of most gts + random false positives
        d_names, d_bbox, d_dims, d_loc, d_rot, d_score = [], [], [], [], [], []
        for i in range(n_gt):
            if names[i] == "DontCare" or rng.uniform() < 0.25:
                continue
            d_names.append(names[i] if rng.uniform() > 0.1
                           else classes[rng.integers(0, 7)])
            # mix tight matches (exercise 3D IoU>0.7 TPs) with loose ones
            s = 0.1 if rng.uniform() < 0.6 else 1.0
            d_bbox.append(list(np.array(bbox[i]) + rng.normal(0, 3 * s, 4)))
            d_dims.append(list(np.array(dims_hwl[i]) *
                               rng.uniform(1 - 0.1 * s, 1 + 0.1 * s, 3)))
            d_loc.append(list(np.array(loc[i]) + rng.normal(0, 0.2 * s, 3)))
            d_rot.append(rot[i] + float(rng.normal(0, 0.1 * s)))
            d_score.append(float(rng.uniform(0.1, 1.0)))
        for _ in range(rng.integers(0, 3)):
            d_names.append(classes[rng.integers(0, 7)])
            x1 = rng.uniform(0, 1100)
            y1 = rng.uniform(0, 300)
            h_px = rng.uniform(15, 120)
            d_bbox.append([x1, y1, x1 + h_px * 1.5, y1 + h_px])
            d_dims.append([rng.uniform(1.4, 1.8), rng.uniform(1.5, 1.9),
                           rng.uniform(3.5, 4.8)])
            d_loc.append([rng.uniform(-20, 20), rng.uniform(1.2, 2.2),
                          rng.uniform(5, 60)])
            d_rot.append(float(rng.uniform(-np.pi, np.pi)))
            d_score.append(float(rng.uniform(0.1, 1.0)))

        def mk(names, trunc, occl, bbox, dims_hwl, loc, rot, score, ref):
            dims = np.array(dims_hwl, np.float64).reshape(-1, 3)
            if ref:  # reference convention: (l, h, w)
                dims = dims[:, [2, 0, 1]]
            # alpha derived from pose so AOS has real signal
            rot_a = np.array(rot, np.float64)
            loc_a = np.array(loc, np.float64).reshape(-1, 3)
            alpha = rot_a - np.arctan2(loc_a[:, 0], loc_a[:, 2] + 1e-9) \
                if len(names) else np.zeros(0)
            anno = {
                "name": np.array(names),
                "truncated": np.array(trunc, np.float64),
                "occluded": np.array(occl, np.int64),
                "alpha": alpha,
                "bbox": np.array(bbox, np.float64).reshape(-1, 4),
                "dimensions": dims,
                "location": np.array(loc, np.float64).reshape(-1, 3),
                "rotation_y": np.array(rot, np.float64),
            }
            if score is not None:
                anno["score"] = np.array(score, np.float64)
            return anno

        zeros = [0.0] * len(d_names)
        gt_ref.append(mk(names, trunc, occl, bbox, dims_hwl, loc, rot,
                         None, True))
        gt_ours.append(mk(names, trunc, occl, bbox, dims_hwl, loc, rot,
                          None, False))
        dt_ref.append(mk(d_names, zeros, [0] * len(d_names), d_bbox, d_dims,
                         d_loc, d_rot, d_score, True))
        dt_ours.append(mk(d_names, zeros, [0] * len(d_names), d_bbox, d_dims,
                          d_loc, d_rot, d_score, False))
    return gt_ref, dt_ref, gt_ours, dt_ours


@pytest.mark.parametrize("seed", [0, 7])
def test_ap_matches_reference_evaluator(ref_eval, seed):
    rng = np.random.default_rng(seed)
    gt_ref, dt_ref, gt_ours, dt_ours = _synthetic_annos(rng)

    # reference: class ids 0=car 1=pedestrian 2=cyclist; min_overlaps
    # [num_minoverlap, metric, class]
    min_overlaps = np.array(
        [[[0.7, 0.5, 0.5], [0.7, 0.5, 0.5], [0.7, 0.5, 0.5]]])
    ref = ref_eval.eval_class(
        gt_ref, dt_ref, [0, 1, 2], [0, 1, 2], METRIC_BBOX, min_overlaps,
        compute_aos=True, num_parts=1)
    ref_bev = ref_eval.eval_class(
        gt_ref, dt_ref, [0, 1, 2], [0, 1, 2], METRIC_BEV, min_overlaps,
        num_parts=1)
    ref_3d = ref_eval.eval_class(
        gt_ref, dt_ref, [0, 1, 2], [0, 1, 2], METRIC_3D, min_overlaps,
        num_parts=1)

    name_of = {0: "Car", 1: "Pedestrian", 2: "Cyclist"}
    ol_of = {0: 0.7, 1: 0.5, 2: 0.5}
    for metric, ref_ret in ((METRIC_BBOX, ref), (METRIC_BEV, ref_bev),
                            (METRIC_3D, ref_3d)):
        for m in range(3):
            for d in range(3):
                want_aos = metric == METRIC_BBOX
                prec, _, aos = eval_class(gt_ours, dt_ours, name_of[m], d,
                                          metric, ol_of[m],
                                          compute_aos=want_aos)
                ref_prec = ref_ret["precision"][m, d, 0]
                np.testing.assert_allclose(
                    prec, ref_prec, atol=1e-6,
                    err_msg="metric=%d class=%s diff=%d" %
                            (metric, name_of[m], d))
                if want_aos:
                    np.testing.assert_allclose(
                        aos, ref_ret["orientation"][m, d, 0], atol=1e-6,
                        err_msg="aos class=%s diff=%d" % (name_of[m], d))
                # AP summaries agree too (ref get_mAP_v2 / get_mAP_r40)
                np.testing.assert_allclose(
                    ap_r11(prec),
                    float(ref_eval.get_mAP_v2(ref_prec[None])[0]), atol=1e-6)
                np.testing.assert_allclose(
                    ap_r40(prec),
                    float(ref_eval.get_mAP_r40(ref_prec[None])[0]), atol=1e-6)
