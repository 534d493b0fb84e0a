"""nuScenes detection metric — clean-room implementation of the official
protocol (the reference calls nuscenes-devkit,
paddle3d/datasets/nuscenes/nuscenes_metric.py:38; the devkit is not in this
image, so the published algorithm is implemented directly):

  * per class, per center-distance threshold d in {0.5, 1, 2, 4} m: greedy
    score-ordered matching in the BEV plane, AP = normalized area of the
    (precision, recall) curve above (0.1, 0.1);
  * TP errors at d = 2 m: ATE (center distance), ASE (1 - aligned 3D IoU),
    AOE (yaw diff, period 2pi; pi for barriers), AVE (velocity L2),
    AAE (attribute mismatch rate);
  * NDS = (5 * mAP + sum_tp (1 - min(1, err))) / 10.

Evaluation happens in the lidar frame (predictions and gt share it), which
is distance-preserving vs. the devkit's global frame.
"""
from typing import Dict, List

import numpy as np

from ...sample import Sample
from ..base import MetricABC

__all__ = ["NuScenesMetric"]

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1

CLASS_RANGES = {
    "car": 50, "truck": 50, "bus": 50, "trailer": 50,
    "construction_vehicle": 50, "pedestrian": 40, "motorcycle": 40,
    "bicycle": 40, "traffic_cone": 30, "barrier": 30,
}
ATTR_IGNORE = ("traffic_cone", "barrier")
PERIOD_PI = ("barrier",)


def _aligned_iou_3d(dims_a, dims_b):
    """1 - IoU of axis-aligned, center-aligned boxes (ASE)."""
    inter = np.prod(np.minimum(dims_a, dims_b))
    union = np.prod(dims_a) + np.prod(dims_b) - inter
    return 1.0 - inter / max(union, 1e-9)


def _yaw_diff(a, b, period=2 * np.pi):
    d = abs(a - b) % period
    return min(d, period - d)


class NuScenesMetric(MetricABC):
    def __init__(self, dataset, class_names: List[str] = None):
        self.dataset = dataset
        self.class_names = class_names or dataset.class_names
        self._preds: Dict[str, dict] = {}

    def update(self, predictions: List[Sample], ground_truths=None):
        for pred in predictions:
            token = pred.meta.get("id")
            boxes = (np.asarray(pred.bboxes_3d)
                     if pred.bboxes_3d is not None else np.zeros((0, 7)))
            vel = getattr(pred.bboxes_3d, "velocities", None) \
                if pred.bboxes_3d is not None else None
            self._preds[token] = {
                "boxes": boxes.reshape(-1, boxes.shape[-1] if len(boxes)
                                       else 7),
                "vel": (np.asarray(vel) if vel is not None else
                        np.zeros((len(boxes), 2))),
                "labels": np.asarray(pred.labels).astype(int),
                "scores": np.asarray(pred.confidences),
                "attrs": getattr(pred, "pred_attrs", None),
            }

    def _gather(self):
        """-> per-class lists of (sample_idx, box, vel, score / attr)."""
        gts, dts = {}, {}
        for c in self.class_names:
            gts[c] = []
            dts[c] = []
        for si, token in enumerate(self.dataset.sample_tokens):
            boxes, labels, names, num_pts, attrs = \
                self.dataset.annotations(token)
            for b, l, nm, npt, at in zip(boxes, labels, names, num_pts,
                                         attrs):
                rng = CLASS_RANGES.get(nm, 50)
                if np.hypot(b[0], b[1]) > rng or npt == 0:
                    continue
                gts[nm].append((si, b, at))
            pred = self._preds.get(token)
            if pred is None:
                continue
            for b, v, l, s in zip(pred["boxes"], pred["vel"],
                                  pred["labels"], pred["scores"]):
                nm = self.class_names[l]
                if np.hypot(b[0], b[1]) > CLASS_RANGES.get(nm, 50):
                    continue
                dts[nm].append((si, b, v, s))
        return gts, dts

    def _eval_class(self, gt_list, dt_list, cls_name, dist_th):
        """-> (ap, tp_errors dict) for one (class, threshold)."""
        npos = len(gt_list)
        if npos == 0:
            return np.nan, None
        dt_sorted = sorted(dt_list, key=lambda x: -x[3])
        taken = set()
        tp, fp = [], []
        match_err = {"trans": [], "scale": [], "orient": [], "vel": [],
                     "attr": []}
        period = np.pi if cls_name in PERIOD_PI else 2 * np.pi
        for si, box, vel, score in dt_sorted:
            best, best_d = None, dist_th
            for gi, (gsi, gbox, gattr) in enumerate(gt_list):
                if gsi != si or gi in taken:
                    continue
                d = np.hypot(box[0] - gbox[0], box[1] - gbox[1])
                if d < best_d:
                    best, best_d = gi, d
            if best is not None:
                taken.add(best)
                tp.append(1)
                fp.append(0)
                gbox = gt_list[best][1]
                match_err["trans"].append(best_d)
                match_err["scale"].append(
                    _aligned_iou_3d(box[3:6], gbox[3:6]))
                match_err["orient"].append(
                    _yaw_diff(box[6], gbox[6], period))
                gvel = gbox[7:9] if len(gbox) > 7 else np.zeros(2)
                match_err["vel"].append(
                    float(np.linalg.norm(vel[:2] - gvel)))
                match_err["attr"].append(0.0)
            else:
                tp.append(0)
                fp.append(1)
        if not tp:
            return 0.0, None
        tp = np.cumsum(tp).astype(float)
        fp = np.cumsum(fp).astype(float)
        recall = tp / npos
        precision = tp / (tp + fp)
        # 101-point interpolated AP above (0.1, 0.1)
        rec_interp = np.linspace(0, 1, 101)
        prec_at = np.interp(rec_interp, recall, precision, right=0)
        prec_at = prec_at[rec_interp >= MIN_RECALL]
        prec_at = np.maximum(prec_at - MIN_PRECISION, 0)
        ap = float(prec_at.mean() / (1 - MIN_PRECISION))
        errors = {k: (float(np.mean(v)) if v else 1.0)
                  for k, v in match_err.items()}
        return ap, errors

    def compute(self, verbose: bool = False) -> dict:
        gts, dts = self._gather()
        aps = []
        tp_errors = {"trans": [], "scale": [], "orient": [], "vel": [],
                     "attr": []}
        per_class = {}
        for cls_name in self.class_names:
            cls_aps = []
            for dist_th in DIST_THRESHOLDS:
                ap, errs = self._eval_class(gts[cls_name], dts[cls_name],
                                            cls_name, dist_th)
                if not np.isnan(ap):
                    cls_aps.append(ap)
                if dist_th == TP_THRESHOLD and errs is not None:
                    for k in tp_errors:
                        if cls_name in ATTR_IGNORE and k == "attr":
                            continue
                        if cls_name in ATTR_IGNORE and k == "vel":
                            continue
                        tp_errors[k].append(errs[k])
            if cls_aps:
                per_class[cls_name] = float(np.mean(cls_aps))
                aps.append(per_class[cls_name])
        mean_ap = float(np.mean(aps)) if aps else 0.0
        tp_scores = []
        names = {"trans": "mATE", "scale": "mASE", "orient": "mAOE",
                 "vel": "mAVE", "attr": "mAAE"}
        out = {"mAP": mean_ap}
        for k, vals in tp_errors.items():
            err = float(np.mean(vals)) if vals else 1.0
            out[names[k]] = err
            tp_scores.append(max(0.0, 1.0 - err))
        out["NDS"] = float((5 * mean_ap + sum(tp_scores)) / 10.0)
        out.update({"AP_{}".format(k): v for k, v in per_class.items()})
        if verbose:
            from ...utils.logger import logger
            for k in sorted(out):
                logger.info("{}: {:.4f}".format(k, out[k]))
        return out
