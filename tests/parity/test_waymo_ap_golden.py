"""Hand-computed golden scene for the Waymo AP/APH protocol (VERDICT r1:
the clean-room Waymo metric had no external oracle). Expected values are
derived BY HAND from the protocol definition (waymo-open-dataset
metrics/ops/detection_metrics: IoU-matched PR curve, 101-point
running-max-interpolated AP; APH weighs every TP by heading accuracy
1 - min(|dyaw|, 2pi - |dyaw|)/pi in both PR numerators):

Scene (class Vehicle, one frame): 3 GT at x = 0, 20, 40, yaw 0, >5 pts.
Predictions:
  p1 = exact copy of GT1 but yaw pi/2, score .9 -> TP (IoU 1 for the
       square 4x4 box under the 90-degree rotation), heading acc 0.5
  p2 at x = 60, score .8 -> FP

Recalls land strictly between 101-grid points (1/3, 1/6) so f32 rounding
of the heading term cannot flip a grid sample.

AP:  tp=[1,0]; recall ends at 1/3, precision 1 -> grid points 0.00..0.33
(34 points) interpolate to 1.0, 0 beyond -> AP = 34/101.
APH: weighted tp cumulative 0.5; recall_h ends at 1/6 -> 17 grid points
(0.00..0.16) at precision 0.5 -> APH = 17*0.5/101.

L1 == L2 here (all GT have >5 points).
"""
import numpy as np

from paddle3d_tpu.geometries import BBoxes3D
from paddle3d_tpu.sample import Sample


class _StubWaymo:
    class_names = ["Vehicle"]

    def __init__(self):
        self.infos = [{
            "frame_id": "f0",
            "boxes": np.array([
                [0.0, 0.0, 0.0, 4.0, 4.0, 2.0, 0.0],
                [20.0, 0.0, 0.0, 4.0, 4.0, 2.0, 0.0],
                [40.0, 0.0, 0.0, 4.0, 4.0, 2.0, 0.0],
            ], np.float32),
            "labels": np.array([0, 0, 0], np.int32),
            "num_points_in_gt": np.array([10, 10, 10]),
        }]

    def __len__(self):
        return len(self.infos)


def test_waymo_ap_aph_golden():
    from paddle3d_tpu.datasets.waymo.waymo_det import WaymoMetric

    metric = WaymoMetric(_StubWaymo())
    s = Sample(path=None, modality="lidar")
    boxes = np.array([
        [0.0, 0.0, 0.0, 4.0, 4.0, 2.0, np.pi / 2],   # TP, heading off 90deg
        [60.0, 0.0, 0.0, 4.0, 4.0, 2.0, 0.0],        # FP
    ], np.float32)
    s.bboxes_3d = BBoxes3D(boxes, origin=[.5, .5, .5])
    s.labels = np.zeros(2, np.int64)
    s.confidences = np.array([0.9, 0.8], np.float32)
    s.meta.id = "f0"
    metric.update([s])
    res = metric.compute()

    ap_expected = 34 / 101 * 100
    aph_expected = 17 * 0.5 / 101 * 100
    for level in ("L1", "L2"):
        np.testing.assert_allclose(res[f"Vehicle {level} AP"], ap_expected,
                                   atol=1e-6)
        np.testing.assert_allclose(res[f"Vehicle {level} APH"],
                                   aph_expected, atol=1e-6)
