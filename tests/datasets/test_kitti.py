"""Hermetic KITTI tests: a synthetic on-disk KITTI tree (the reference's
dataset tests need real KITTI on disk — SURVEY.md §4 calls out this gap)."""
import os

import numpy as np
import pytest
from PIL import Image

F, CX, CY = 700.0, 620.0, 190.0


def _calib_text():
    P = "{} 0 {} 0 0 {} {} 0 0 0 1 0".format(F, CX, F, CY)
    return "\n".join([
        "P0: " + P, "P1: " + P, "P2: " + P, "P3: " + P,
        "R0_rect: 1 0 0 0 1 0 0 0 1",
        "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0",
        ""])


def _project(loc):
    u = F * loc[0] / loc[2] + CX
    v = F * loc[1] / loc[2] + CY
    return u, v


def _label_line(cls, loc, hwl, ry):
    # build a 2D bbox big enough to pass the easy gate (>40px high)
    u, v = _project(loc)
    h2d = max(45.0, F * hwl[0] / loc[2])
    w2d = max(30.0, F * hwl[2] / loc[2])
    bbox = (u - w2d / 2, v - h2d, u + w2d / 2, v)
    return ("{} 0.0 0 0.0 {:.2f} {:.2f} {:.2f} {:.2f} "
            "{:.2f} {:.2f} {:.2f} {:.2f} {:.2f} {:.2f} {:.2f}").format(
                cls, *bbox, *hwl, *loc, ry)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    (root / "ImageSets").mkdir()
    for sub in ("velodyne", "label_2", "calib", "image_2"):
        (root / "training" / sub).mkdir(parents=True)

    rng = np.random.default_rng(0)
    ids = ["%06d" % i for i in range(25)]
    (root / "ImageSets" / "train.txt").write_text("\n".join(ids) + "\n")
    (root / "ImageSets" / "val.txt").write_text("\n".join(ids) + "\n")

    for i, idx in enumerate(ids):
        (root / "training" / "calib" / f"{idx}.txt").write_text(_calib_text())
        # two cars in front of the camera (camera coords: x right, y down,
        # z forward; location is the box bottom-center)
        labels = [
            _label_line("Car", (-2.0 + i * 0.15, 1.6, 8.0 + 0.5 * i),
                        (1.5, 1.6, 3.9), 0.2),
            _label_line("Car", (2.0, 1.6, 14.0), (1.5, 1.6, 3.9), -0.5),
            _label_line("DontCare", (-10.0, -1.0, 999.0), (-1, -1, -1), -10),
        ]
        (root / "training" / "label_2" / f"{idx}.txt").write_text(
            "\n".join(labels) + "\n")
        pts = rng.uniform([0, -20, -2, 0], [40, 20, 1, 1],
                          (3000, 4)).astype(np.float32)
        pts.tofile(root / "training" / "velodyne" / f"{idx}.bin")
        Image.new("RGB", (1242, 375)).save(
            root / "training" / "image_2" / f"{idx}.png")
    return str(root)


def test_dataset_loads_samples(kitti_root):
    from paddle3d_tpu.datasets.kitti.kitti_det import KittiPCDataset
    from paddle3d_tpu.transforms import LoadPointCloud

    ds = KittiPCDataset(
        dataset_root=kitti_root, class_names=["Car"],
        transforms=[LoadPointCloud(dim=4, use_dim=4)], mode="train")
    assert len(ds) == 25
    s = ds[0]
    assert s.data.shape == (3000, 4)
    assert len(s.bboxes_3d) == 2  # DontCare filtered out
    assert s.labels.tolist() == [0, 0]
    # lidar-frame sanity: cars are in front (x>0), near ground (z ~ -1.6..0)
    boxes = np.asarray(s.bboxes_3d)
    assert np.all(boxes[:, 0] > 0)
    assert np.all(np.abs(boxes[:, 2]) < 3)
    # round trip camera -> lidar -> camera is identity
    from paddle3d_tpu.datasets.kitti import kitti_utils
    calib = ds.load_calib("000000")
    anno = ds.load_anno("000000")
    cam = kitti_utils.lidar_boxes_to_camera_anno(boxes, calib)
    keep = anno["name"] == "Car"
    np.testing.assert_allclose(cam["location"], anno["location"][keep],
                               atol=1e-4)
    np.testing.assert_allclose(cam["dimensions"], anno["dimensions"][keep],
                               atol=1e-4)
    r_diff = (cam["rotation_y"] - anno["rotation_y"][keep] + np.pi) \
        % (2 * np.pi) - np.pi
    np.testing.assert_allclose(r_diff, 0, atol=1e-5)


def test_metric_gt_roundtrip_gives_full_ap(kitti_root):
    from paddle3d_tpu.datasets.kitti.kitti_det import KittiPCDataset
    from paddle3d_tpu.transforms import LoadPointCloud

    ds = KittiPCDataset(
        dataset_root=kitti_root, class_names=["Car"],
        transforms=[LoadPointCloud(dim=4, use_dim=4)], mode="val")
    metric = ds.metric
    preds = []
    for i in range(len(ds)):
        s = ds[i]
        s.confidences = np.linspace(0.9, 0.5, len(s.bboxes_3d))
        preds.append(s)
    metric.update(preds)
    res = metric.compute()
    for k, v in res.items():
        assert v > 99.0, "{} = {}".format(k, v)


def test_metric_penalizes_misses_and_fps(kitti_root):
    from paddle3d_tpu.datasets.kitti.kitti_det import KittiPCDataset
    from paddle3d_tpu.geometries import BBoxes3D
    from paddle3d_tpu.transforms import LoadPointCloud

    ds = KittiPCDataset(
        dataset_root=kitti_root, class_names=["Car"],
        transforms=[LoadPointCloud(dim=4, use_dim=4)], mode="val")
    metric = ds.metric
    preds = []
    for i in range(len(ds)):
        s = ds[i]
        boxes = np.asarray(s.bboxes_3d)[:1]  # drop one gt per frame
        # add one far-away false positive
        fp = np.array([[30., 10., -1.6, 1.6, 3.9, 1.5, 0.]], np.float32)
        s.bboxes_3d = BBoxes3D(np.vstack([boxes, fp]), origin=[.5, .5, 0.])
        s.labels = np.zeros(2, np.int32)
        s.confidences = np.array([0.9, 0.8], np.float32)
        preds.append(s)
    metric.update(preds)
    res = metric.compute()
    ap = res["Car 3d moderate AP_R40"]
    assert 20.0 < ap < 80.0  # half recall + FPs => mid AP


def test_cbgs_wrapper_balances_classes(kitti_root):
    """CBGS duplicates rare-class frames toward an equal per-class share."""
    from paddle3d_tpu.datasets import CBGSDataset, KittiPCDataset
    ds = KittiPCDataset(dataset_root=str(kitti_root),
                        class_names=["Car", "Pedestrian", "Cyclist"],
                        mode="train",
                        transforms=None)
    wrapped = CBGSDataset(ds)
    assert len(wrapped) >= len(ds)
    # delegation: capacities and collate come from the inner dataset
    assert wrapped.point_dim == ds.point_dim
    assert wrapped.class_names == ds.class_names
    # every resampled index maps to a real frame
    labels = wrapped.frame_labels(0)
    assert labels.dtype.kind == "i"


def test_kitti_depth_dataset(kitti_root):
    """KittiDepthDataset emits the CADDN contract: resized image, pixel
    img2lidar, lidar gt boxes, lidar-projected min-depth map (reference:
    kitti_depth_det.py:59, kitti_metric.py:198)."""
    from paddle3d_tpu.datasets.kitti import (KittiDepthDataset,
                                             KittiDepthMetric)

    ds = KittiDepthDataset(
        dataset_root=kitti_root, mode="train", class_names=["Car"],
        image_size=(96, 320), depth_downsample_factor=4,
        point_cloud_range=[0, -40, -3, 70.4, 40, 1])
    assert len(ds) == 25
    s = ds[0]
    assert s.data.shape == (96, 320, 3)
    assert s.meta.depth_map.shape == (24, 80)
    assert (s.meta.depth_map > 0).any(), "some lidar points project inside"
    # projecting a gt center through lidar2img gives positive depth and
    # in-bounds pixels
    box = np.asarray(s.bboxes_3d)[0]
    proj = s.meta.lidar2img @ np.array([box[0], box[1], box[2], 1.0])
    assert proj[2] > 0
    u, v = proj[0] / proj[2], proj[1] / proj[2]
    assert 0 <= u < 320 and 0 <= v < 96
    # img2lidar is the exact inverse
    np.testing.assert_allclose(
        s.meta.img2lidar @ s.meta.lidar2img, np.eye(4), atol=1e-3)

    batch, metas = ds.collate_fn([ds[0], ds[1]])
    assert batch["data"].shape == (2, 96, 320, 3)
    assert batch["depth_map"].shape == (2, 24, 80)
    assert batch["img2lidars"].shape == (2, 4, 4)
    assert batch["gt_boxes"].shape == (2, 50, 7)
    assert isinstance(ds.metric, KittiDepthMetric)
