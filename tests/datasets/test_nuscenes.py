"""Hermetic nuScenes tests over a synthetic v1.0 table tree."""
import json
import os

import numpy as np
import pytest

N_SAMPLES = 12


def _write(root, version, name, rows):
    with open(os.path.join(root, version, name + ".json"), "w") as f:
        json.dump(rows, f)


@pytest.fixture(scope="module")
def nusc_root(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = str(tmp_path_factory.mktemp("nusc"))
    version = "v1.0-mini"
    os.makedirs(os.path.join(root, version))
    os.makedirs(os.path.join(root, "sweeps"))
    os.makedirs(os.path.join(root, "samples"))

    scenes, samples, sample_datas, ego_poses, calibs = [], [], [], [], []
    sensors = [{"token": "sen0", "channel": "LIDAR_TOP",
                "modality": "lidar"}]
    categories = [
        {"token": "cat_car", "name": "vehicle.car"},
        {"token": "cat_ped", "name": "human.pedestrian.adult"},
    ]
    attributes = [
        {"token": "attr0", "name": "vehicle.parked"},
        {"token": "attr1", "name": "pedestrian.standing"},
    ]
    instances, annotations = [], []

    scene_tok = "scene0"
    sample_toks = ["samp{:02d}".format(i) for i in range(N_SAMPLES)]
    scenes.append({
        "token": scene_tok, "name": "scene-0061",
        "first_sample_token": sample_toks[0],
        "last_sample_token": sample_toks[-1],
    })

    # static objects so every frame sees the same gt (plus ego at origin)
    objs = []
    for k in range(3):
        objs.append({
            "pos": np.array([8. + 6 * k, -4. + 4 * k, 0.0]),
            "size": [1.9, 4.6, 1.7] if k < 2 else [0.7, 0.7, 1.7],  # w,l,h
            "cat": "cat_car" if k < 2 else "cat_ped",
            "attr": "attr0" if k < 2 else "attr1",
            "inst": "inst{}".format(k),
        })
        instances.append({
            "token": "inst{}".format(k),
            "category_token": objs[k]["cat"],
        })

    ann_grid = {}
    for i, tok in enumerate(sample_toks):
        ts = 1_000_000 * (i + 1)
        samples.append({
            "token": tok, "timestamp": ts, "scene_token": scene_tok,
            "prev": sample_toks[i - 1] if i > 0 else "",
            "next": sample_toks[i + 1] if i < N_SAMPLES - 1 else "",
            "data": {"LIDAR_TOP": "sd{:02d}".format(i)},
        })
        ego_poses.append({
            "token": "ep{:02d}".format(i),
            "translation": [0.1 * i, 0.0, 0.0],
            "rotation": [1.0, 0.0, 0.0, 0.0],
        })
        calibs.append({
            "token": "cs0",
            "translation": [0., 0., 1.8],
            "rotation": [1.0, 0.0, 0.0, 0.0],
            "sensor_token": "sen0", "camera_intrinsic": [],
        })
        fname = "samples/lidar_{:02d}.bin".format(i)
        pts = rng.uniform([-20, -20, -2, 0, 0], [20, 20, 2, 1, 0],
                          (1500, 5)).astype(np.float32)
        pts.tofile(os.path.join(root, fname))
        sample_datas.append({
            "token": "sd{:02d}".format(i), "sample_token": tok,
            "ego_pose_token": "ep{:02d}".format(i),
            "calibrated_sensor_token": "cs0",
            "timestamp": ts, "filename": fname, "is_key_frame": True,
            "prev": "sd{:02d}".format(i - 1) if i > 0 else "",
            "next": "sd{:02d}".format(i + 1) if i < N_SAMPLES - 1 else "",
        })
        for k, obj in enumerate(objs):
            atok = "ann{:02d}_{}".format(i, k)
            annotations.append({
                "token": atok, "sample_token": tok,
                "instance_token": obj["inst"],
                "translation": list(obj["pos"] + [0.05 * i, 0., 0.]),
                "size": obj["size"],
                "rotation": [np.cos(0.15), 0., 0., np.sin(0.15)],
                "num_lidar_pts": 25, "num_radar_pts": 0,
                "attribute_tokens": [obj["attr"]],
                "prev": "ann{:02d}_{}".format(i - 1, k) if i > 0 else "",
                "next": ("ann{:02d}_{}".format(i + 1, k)
                         if i < N_SAMPLES - 1 else ""),
            })
    # dedupe calibs (one row)
    calibs = calibs[:1]

    _write(root, version, "scene", scenes)
    _write(root, version, "sample", samples)
    _write(root, version, "sample_data", sample_datas)
    _write(root, version, "ego_pose", ego_poses)
    _write(root, version, "calibrated_sensor", calibs)
    _write(root, version, "sensor", sensors)
    _write(root, version, "category", categories)
    _write(root, version, "attribute", attributes)
    _write(root, version, "instance", instances)
    _write(root, version, "sample_annotation", annotations)
    return root


def test_dataset_loads(nusc_root):
    from paddle3d_tpu.datasets.nuscenes import NuscenesPCDataset
    from paddle3d_tpu.transforms import LoadPointCloud

    ds = NuscenesPCDataset(
        dataset_root=nusc_root, version="v1.0-mini", mode="train",
        class_names=["car", "pedestrian"],
        transforms=[LoadPointCloud(dim=5, use_dim=4, use_time_lag=True)],
        max_sweeps=3)
    assert len(ds) == N_SAMPLES
    s = ds[5]
    assert s.data.shape[1] == 5  # 4 dims + time lag
    assert s.data.shape[0] > 1500  # sweeps aggregated
    assert len(s.bboxes_3d) == 3
    assert sorted(s.labels.tolist()) == [0, 0, 1]
    # boxes near expected positions (ego at ~(0.5,0,0), sensor z +1.8)
    b = np.asarray(s.bboxes_3d)
    assert abs(b[0, 2] - (-1.8 - 1.7 / 2 + 1.7 / 2 - 0)) < 3  # sane z
    vel = np.asarray(s.bboxes_3d.velocities)
    np.testing.assert_allclose(vel[:, 0], 0.05, atol=0.02)  # moving +x

    batch, metas = ds.collate_fn([ds[0], ds[1]])
    assert batch["gt_boxes"].shape[-1] == 9


def test_metric_roundtrip(nusc_root):
    from paddle3d_tpu.datasets.nuscenes import NuscenesPCDataset
    from paddle3d_tpu.geometries import BBoxes3D
    from paddle3d_tpu.sample import Sample

    ds = NuscenesPCDataset(
        dataset_root=nusc_root, version="v1.0-mini", mode="train",
        class_names=["car", "pedestrian"], max_sweeps=0)
    metric = ds.metric
    preds = []
    for tok in ds.sample_tokens:
        boxes, labels, names, npts, attrs = ds.annotations(tok)
        s = Sample(path=None, modality="lidar")
        s.bboxes_3d = BBoxes3D(boxes[:, :7], origin=[.5, .5, 0.],
                               velocities=boxes[:, 7:9])
        s.labels = labels
        s.confidences = np.linspace(0.95, 0.7, len(labels))
        s.meta.id = tok
        preds.append(s)
    metric.update(preds)
    res = metric.compute()
    assert res["mAP"] > 0.99
    assert res["NDS"] > 0.95
    assert res["mATE"] < 0.01

    # degraded predictions drop the score
    metric2 = ds.metric
    for s in preds:
        np.asarray(s.bboxes_3d)[:, 0] += 3.0  # 3m offset
    metric2.update(preds)
    res2 = metric2.compute()
    assert res2["mAP"] < res["mAP"]
    assert res2["NDS"] < res["NDS"]


def test_multiview_dataset(nusc_root, tmp_path):
    """Extend the fixture with camera tables and load MV samples."""
    import json
    from PIL import Image as PILImage
    version = "v1.0-mini"
    # add one camera channel reusing the lidar poses
    for name in ("sample", "sample_data", "calibrated_sensor"):
        pass
    with open(os.path.join(nusc_root, version, "sample.json")) as f:
        samples = json.load(f)
    with open(os.path.join(nusc_root, version, "sample_data.json")) as f:
        sds = json.load(f)
    with open(os.path.join(nusc_root, version,
                           "calibrated_sensor.json")) as f:
        calibs = json.load(f)
    calibs.append({
        "token": "cs_cam", "translation": [1.5, 0., 1.6],
        "rotation": [0.5, -0.5, 0.5, -0.5],
        "sensor_token": "sen_cam",
        "camera_intrinsic": [[400., 0., 400.], [0., 400., 225.],
                             [0., 0., 1.]],
    })
    os.makedirs(os.path.join(nusc_root, "samples_cam"), exist_ok=True)
    img_file = "samples_cam/cam.jpg"
    PILImage.new("RGB", (800, 450)).save(os.path.join(nusc_root, img_file))
    for i, s in enumerate(samples):
        tok = "sdcam{:02d}".format(i)
        s["data"]["CAM_FRONT"] = tok
        sds.append({
            "token": tok, "sample_token": s["token"],
            "ego_pose_token": "ep{:02d}".format(i),
            "calibrated_sensor_token": "cs_cam",
            "timestamp": s["timestamp"], "filename": img_file,
            "is_key_frame": True, "prev": "", "next": "",
        })
    for name, rows in (("sample", samples), ("sample_data", sds),
                       ("calibrated_sensor", calibs)):
        with open(os.path.join(nusc_root, version, name + ".json"),
                  "w") as f:
            json.dump(rows, f)

    from paddle3d_tpu.datasets.nuscenes import NuscenesMVDataset
    ds = NuscenesMVDataset(
        dataset_root=nusc_root, version=version, mode="train",
        class_names=["car", "pedestrian"], image_size=(64, 128),
        cameras=["CAM_FRONT"])
    s = ds[0]
    assert s.img.shape == (1, 64, 128, 3)
    assert s.meta.lidar2imgs.shape == (1, 4, 4)
    batch, metas = ds.collate_fn([ds[0], ds[1]])
    assert batch["img"].shape == (2, 1, 64, 128, 3)
    assert batch["gt_boxes"].shape[-1] == 9
    # projecting a gt center through lidar2img lands in front of a camera
    # facing +x: gt at x≈7.5 -> depth positive
    box = batch["gt_boxes"][0, 0]
    pt = np.array([box[0], box[1], box[2], 1.0], np.float32)
    proj = batch["lidar2imgs"][0, 0] @ pt
    assert proj[2] > 0


def test_nuscenes_mv_bevdet_format_and_adjacent(nusc_root):
    """bevdet_format emits the BEVDet camera-matrix contract; adjacent adds
    ego-motion-composed prev-frame views."""
    import json
    from PIL import Image as PILImage
    version = "v1.0-mini"
    with open(os.path.join(nusc_root, version, "sample.json")) as f:
        samples = json.load(f)
    with open(os.path.join(nusc_root, version, "sample_data.json")) as f:
        sds = json.load(f)
    with open(os.path.join(nusc_root, version,
                           "calibrated_sensor.json")) as f:
        calibs = json.load(f)
    if not any(c["token"] == "cs_cam" for c in calibs):
        calibs.append({
            "token": "cs_cam", "translation": [1.5, 0., 1.6],
            "rotation": [0.5, -0.5, 0.5, -0.5],
            "sensor_token": "sen_cam",
            "camera_intrinsic": [[400., 0., 400.], [0., 400., 225.],
                                 [0., 0., 1.]],
        })
    os.makedirs(os.path.join(nusc_root, "samples_cam"), exist_ok=True)
    img_file = "samples_cam/cam.jpg"
    PILImage.new("RGB", (800, 450)).save(os.path.join(nusc_root, img_file))
    for i, samp in enumerate(samples):
        if "CAM_FRONT" in samp["data"]:
            continue
        tok = "sdcam{:02d}".format(i)
        samp["data"]["CAM_FRONT"] = tok
        sds.append({
            "token": tok, "sample_token": samp["token"],
            "ego_pose_token": "ep{:02d}".format(i),
            "calibrated_sensor_token": "cs_cam",
            "timestamp": samp["timestamp"], "filename": img_file,
            "is_key_frame": True, "prev": "", "next": "",
        })
    for name, rows in (("sample", samples), ("sample_data", sds),
                       ("calibrated_sensor", calibs)):
        with open(os.path.join(nusc_root, version, name + ".json"),
                  "w") as f:
            json.dump(rows, f)

    from paddle3d_tpu.datasets.nuscenes import NuscenesMVDataset
    ds = NuscenesMVDataset(
        dataset_root=nusc_root, version=version, mode="train",
        class_names=["car", "pedestrian"], image_size=(64, 128),
        cameras=["CAM_FRONT"], bevdet_format=True, adjacent=True)
    batch, _ = ds.collate_fn([ds[0], ds[1]])
    n = 1
    assert batch["rots"].shape == (2, n, 3, 3)
    assert batch["trans"].shape == (2, n, 3)
    assert batch["cam2imgs"].shape == (2, n, 3, 3)
    assert batch["post_rots"].shape == (2, n, 3, 3)
    assert batch["bda"].shape == (2, 3, 3)
    assert batch["img_adj"].shape == batch["img"].shape
    assert batch["rots_adj"].shape == (2, n, 3, 3)
    # cam2imgs carries raw pixel intrinsics; resize lives in post_rots
    assert abs(batch["cam2imgs"][0, 0, 0, 0] - 400.) < 1e-4
    assert abs(batch["post_rots"][0, 0, 0, 0] - 128. / 800.) < 1e-6
    # consistency: rots/trans/cam2imgs/post must reproduce lidar2img
    k = np.eye(4, dtype=np.float64)
    k[:3, :3] = batch["post_rots"][0, 0] @ batch["cam2imgs"][0, 0]
    cam_from_lidar = np.eye(4)
    cam_from_lidar[:3, :3] = batch["rots"][0, 0].T
    cam_from_lidar[:3, 3] = -batch["rots"][0, 0].T @ batch["trans"][0, 0]
    # normalized-coordinate lidar2img uses intrinsics/WH; scale back
    l2i = batch["lidar2imgs"][0, 0].copy()
    l2i[0] *= 128.
    l2i[1] *= 64.
    np.testing.assert_allclose((k @ cam_from_lidar)[:3],
                               l2i[:3], rtol=1e-4, atol=1e-4)
    # frame 0 has no prev: adjacent falls back to itself
    assert np.allclose(batch["img_adj"][0], batch["img"][0])


def test_nuscenes_mm_dataset(nusc_root):
    """Multi-modality: one sample feeds BOTH branches — points (w/ sweeps)
    and camera views with the BEVDet matrix contract (reference:
    nuscenes_multi_modality.py:31 NuscenesMMDataset)."""
    from paddle3d_tpu.datasets.nuscenes import NuscenesMMDataset
    from paddle3d_tpu.transforms import LoadPointCloud
    version = "v1.0-mini"
    # camera tables were added by test_multiview_dataset (module fixture)
    ds = NuscenesMMDataset(
        dataset_root=nusc_root, version=version, mode="train",
        class_names=["car", "pedestrian"], image_size=(64, 128),
        cameras=["CAM_FRONT"], max_sweeps=2, max_points=8192,
        transforms=[
            LoadPointCloud(dim=4, use_dim=4, use_time_lag=True),
        ])
    s = ds[1]
    assert s.modality == "multimodal"
    assert s.img.shape == (1, 64, 128, 3)
    assert s.data.shape[1] == 5  # xyz+i+time_lag
    batch, metas = ds.collate_fn([ds[0], ds[1]])
    # lidar contract
    assert batch["data"].shape == (2, 8192, 5)
    assert batch["gt_boxes"].shape[-1] == 9
    # camera contract (both MV matrices and BEVDet matrices)
    assert batch["img"].shape == (2, 1, 64, 128, 3)
    for k in ("lidar2imgs", "img2lidars", "rots", "trans", "cam2imgs",
              "post_rots", "post_trans", "bda"):
        assert k in batch, k
    assert len(metas) == 2 and metas[0]["id"]


def test_nuscenes_mvseg_dataset(nusc_root):
    """Seg dataset attaches map npz files; LoadMapsFromFiles emits
    gt_semantic_map; collate stacks it (reference: reader.py:715,
    nuscenes_multiview_det.py:798)."""
    from paddle3d_tpu.datasets.nuscenes import (NuscenesMVSegDataset,
                                                NuScenesSegMetric)
    from paddle3d_tpu.transforms import LoadMapsFromFiles
    version = "v1.0-mini"

    ds = NuscenesMVSegDataset(
        dataset_root=nusc_root, version=version, mode="train",
        class_names=["car", "pedestrian"], image_size=(64, 128),
        cameras=["CAM_FRONT"], maps_root=os.path.join(nusc_root, "maps_bev"),
        transforms=[LoadMapsFromFiles()])
    os.makedirs(os.path.join(nusc_root, "maps_bev"), exist_ok=True)
    rng = np.random.default_rng(0)
    for tok in ds.sample_tokens:
        np.savez(os.path.join(nusc_root, "maps_bev", tok + ".npz"),
                 (rng.uniform(0, 1, (32, 32, 3)) > 0.5).astype(np.float32))

    s = ds[0]
    assert s.gt_semantic_map.shape == (32, 32, 3)
    batch, metas = ds.collate_fn([ds[0], ds[1]])
    assert batch["gt_semantic_map"].shape == (2, 32, 32, 3)
    assert batch["img"].shape == (2, 1, 64, 128, 3)

    # seg metric: feeding gt probabilities back gives IoU == 1
    from paddle3d_tpu.sample import Sample
    metric = ds.metric
    assert isinstance(metric, NuScenesSegMetric)
    preds = []
    for tok in ds.sample_tokens:
        p = Sample(path=None, modality="multiview")
        p.meta.id = tok
        p.labels = np.zeros((0,), np.int64)
        p.confidences = np.zeros((0,))
        p.bboxes_3d = None
        p.pred_semantic_map = np.load(
            os.path.join(nusc_root, "maps_bev", tok + ".npz"))["arr_0"]
        preds.append(p)
    metric.update(preds)
    res = metric.compute()
    for k in ("IoU_drive", "IoU_lane", "IoU_vehicle"):
        assert abs(res[k] - 1.0) < 1e-6, (k, res[k])
