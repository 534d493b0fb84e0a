import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def waymo_root(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = str(tmp_path_factory.mktemp("waymo"))
    os.makedirs(os.path.join(root, "points"))
    infos = []
    for i in range(6):
        pts = rng.uniform([-30, -30, -2, 0], [30, 30, 4, 1],
                          (4000, 4)).astype(np.float32)
        fname = "points/{:03d}.npy".format(i)
        np.save(os.path.join(root, fname), pts)
        boxes = np.zeros((3, 7), np.float32)
        boxes[:, 0] = [5. + i, -8., 12.]
        boxes[:, 1] = [2., -1., 6.]
        boxes[:, 3:6] = [[2.1, 4.8, 1.8], [0.9, 0.9, 1.7], [0.8, 1.8, 1.7]]
        boxes[:, 6] = [0.2, -0.3, 1.0]
        infos.append({
            "lidar_file": fname,
            "boxes": boxes,
            "labels": np.array([0, 1, 2], np.int32),
            "num_points_in_gt": np.array([50, 8, 3]),
            "frame_id": "f{:03d}".format(i),
        })
    with open(os.path.join(root, "val_infos.pkl"), "wb") as f:
        pickle.dump(infos, f)
    return root


def test_waymo_load_and_metric(waymo_root):
    from paddle3d_tpu.datasets.waymo import WaymoPCDataset
    ds = WaymoPCDataset(dataset_root=waymo_root, mode="val")
    assert len(ds) == 6
    s = ds[0]
    assert s.data.shape == (4000, 4)
    assert len(s.bboxes_3d) == 3

    # gt roundtrip -> high AP; note Cyclist has <=5 pts so L1 excludes it
    metric = ds.metric
    preds = []
    for i in range(len(ds)):
        p = ds[i]
        p.confidences = np.array([0.9, 0.8, 0.7], np.float32)
        preds.append(p)
    metric.update(preds)
    res = metric.compute()
    assert res["Vehicle L1 AP"] > 99
    assert res["Vehicle L2 AP"] > 99
    assert res["Pedestrian L2 AP"] > 99
    # degraded -> lower
    for p in preds:
        np.asarray(p.bboxes_3d)[:, 0] += 3.0
    metric2 = ds.metric
    metric2.update(preds)
    assert metric2.compute()["Vehicle L2 AP"] < 50
