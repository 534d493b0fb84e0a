"""Behavior tests for the whole-file-portability transforms
(transforms/reference_parity.py)."""
import numpy as np
import pytest

from paddle3d_tpu.sample import Sample


def _mv_sample(**kv):
    s = Sample(path=None, modality="multiview")
    for k, v in kv.items():
        s[k] = v
    return s


def test_sample_range_filter_masks_and_wraps_yaw():
    from paddle3d_tpu.transforms import SampleRangeFilter
    boxes = np.array([[0., 0., 0., 1, 1, 1, 4.0],     # inside; yaw wraps
                      [100., 0., 0., 1, 1, 1, 0.1]],  # out of range
                     np.float32)
    s = _mv_sample(gt_bboxes_3d=boxes, gt_labels_3d=np.array([1, 2]))
    s = SampleRangeFilter([-50, -50, -5, 50, 50, 3])(s)
    assert s["gt_bboxes_3d"].shape == (1, 7)
    assert list(s["gt_labels_3d"]) == [1]
    assert -np.pi <= s["gt_bboxes_3d"][0, 6] <= np.pi


def test_sample_name_filter():
    from paddle3d_tpu.transforms import SampleNameFilter
    s = _mv_sample(gt_bboxes_3d=np.zeros((3, 7), np.float32),
                   gt_labels_3d=np.array([0, 5, 1]))
    s = SampleNameFilter(classes=["car", "truck"])(s)
    assert list(s["gt_labels_3d"]) == [0, 1]


def test_sample_filer_by_key_collects():
    from paddle3d_tpu.transforms import SampleFilerByKey
    s = _mv_sample(img=np.zeros((2, 4, 4, 3)), lidar2img=np.eye(4),
                   junk="drop me")
    s.meta.id = 7
    out = SampleFilerByKey(keys=["img"])(s)
    assert "img" in out and "junk" not in out
    assert out.meta["lidar2img"] is not None
    assert out.meta.id == 7


def test_sample_filter_by_key_img_metas():
    from paddle3d_tpu.transforms import SampleFilterByKey
    s = _mv_sample(points=np.zeros((5, 4)), lidar2img=np.eye(4))
    s.meta.id = 3
    out = SampleFilterByKey(keys=["points"])(s)
    assert "points" in out
    assert "lidar2img" in out["img_metas"]


def test_convert_box_format_roundtrip_semantics():
    from paddle3d_tpu.transforms import ConvertBoxFormat
    s = Sample(path=None, modality="lidar")
    s.bboxes_3d = np.array([[1., 2., 0., 1.6, 3.9, 1.5, 0.0]], np.float32)
    s.labels = np.array([0])
    s = ConvertBoxFormat()(s)
    out = np.asarray(s.bboxes_3d)
    assert out.shape == (1, 8)
    # bottom->object center, (w,l)->(l,w), heading = -(yaw + pi/2)
    assert out[0, 2] == pytest.approx(0.75)
    assert out[0, 3] == pytest.approx(3.9)
    assert out[0, 4] == pytest.approx(1.6)
    assert out[0, 6] == pytest.approx(-np.pi / 2)
    assert out[0, 7] == 1.0  # label starts from 1
    assert "labels" not in s


def test_to_vision_based_box_quaternion():
    from paddle3d_tpu.transforms import ToVisionBasedBox
    s = Sample(path=None, modality="image")
    s.bboxes_3d = np.array([[1., 2., 10., 1.5, 1.6, 3.9, 0.0]], np.float32)
    out = np.asarray(ToVisionBasedBox()(s).bboxes_3d)
    assert out.shape == (1, 10)
    # rot=0: q = Q(x, pi/2) -> (c, c, 0, 0) with c = sqrt(1/2)
    c = np.sqrt(0.5)
    np.testing.assert_allclose(out[0, :4], [c, c, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 4:7], [1., 2. - 0.75, 10.], atol=1e-6)


def test_pad_image_divisor():
    from paddle3d_tpu.transforms import PadImage
    s = _mv_sample(img=np.ones((30, 50, 3), np.float32))
    s = PadImage(size_divisor=32)(s)
    assert s["img"].shape == (32, 64, 3)
    assert s["pad_shape"] == (32, 64, 3)


def test_resize_image_keep_ratio():
    from paddle3d_tpu.transforms import ResizeImage
    s = _mv_sample(img=np.ones((100, 200, 3), np.uint8))
    s = ResizeImage(img_scale=[(400, 100)])(s)
    h, w = s["img"].shape[:2]
    assert max(h, w) <= 400 and min(h, w) <= 100
    assert w == 2 * h  # aspect kept


def test_load_points_from_file(tmp_path):
    from paddle3d_tpu.transforms import LoadPointsFromFile
    pts = np.arange(30, dtype=np.float32).reshape(5, 6)
    f = tmp_path / "scan.bin"
    pts.tofile(f)
    s = _mv_sample(pts_filename=str(f))
    s = LoadPointsFromFile(load_dim=6, use_dim=[0, 1, 2])(s)
    np.testing.assert_allclose(s["points"], pts[:, :3])


def test_load_annotations3d():
    from paddle3d_tpu.transforms import LoadAnnotations3D
    s = _mv_sample(ann_info=dict(gt_bboxes_3d=np.zeros((2, 9)),
                                 gt_labels_3d=np.array([1, 2])))
    s = LoadAnnotations3D()(s)
    assert s["gt_bboxes_3d"].shape == (2, 9)
    assert list(s["gt_labels_3d"]) == [1, 2]


def test_generate_anchors_stamps_sample():
    from paddle3d_tpu.transforms import GenerateAnchors
    tr = GenerateAnchors(
        output_stride_factor=2,
        point_cloud_range=[0, -8, -3, 16, 8, 1],
        voxel_size=[0.5, 0.5, 4.0],
        anchor_configs=[dict(sizes=[1.6, 3.9, 1.56],
                             anchor_strides=[1.0, 1.0, 0.0],
                             anchor_offsets=[0.5, -7.5, -1.78],
                             rotations=[0, 1.57],
                             matched_threshold=0.6,
                             unmatched_threshold=0.45)],
        anchor_area_threshold=-1)
    s = Sample(path=None, modality="lidar")
    s = tr(s)
    assert s.anchors.shape[-1] == 7
    assert s.matched_thresholds.shape[0] == s.anchors.shape[0]


def test_vision_basics():
    from paddle3d_tpu.transforms import NormalizeVision, Resize, Transpose
    s = Sample(path=None, modality="image")
    s.data = np.full((20, 30, 3), 100.0, np.float32)
    s = Resize(size=(10, 12))(s)
    assert s.data.shape == (10, 12, 3)
    s = NormalizeVision(mean=[100.] * 3, std=[50.] * 3)(s)
    np.testing.assert_allclose(s.data, 0.0, atol=1e-6)
    s = Transpose()(s)
    assert s.data.shape == (3, 10, 12)


def test_device_target_specs_pass_through():
    from paddle3d_tpu.transforms import (Gt2CenterPointTarget,
                                         Gt2PointPillarsTarget,
                                         Gt2PVRCNNTarget)
    s = Sample(path=None, modality="lidar")
    s.data = np.zeros((4, 4), np.float32)
    for tr in (Gt2CenterPointTarget(down_ratio=4),
               Gt2PVRCNNTarget(anchor_configs=[]),
               Gt2PointPillarsTarget(rpn_batch_size=512)):
        assert tr(s) is s
