"""Reference pipeline transforms completing whole-file YAML portability.

These are the host-side components the reference's experiment YAMLs name in
their train/val transform lists beyond the core surface already in
transform.py/reader.py/multiview.py: GT filters and format converters
(reference: paddle3d/transforms/transform.py:91,243,650,714,1252), the
multiview file readers (reference: paddle3d/transforms/reader.py:460,533,
589), the PointPillars anchor transform (reference:
paddle3d/transforms/anchor_generator.py:29), vision basics used by
BEV-LaneDet (Resize/Transpose/NormalizeVision), and spec-carrier stand-ins
for the reference's host-side target builders whose assignment runs
on-device in this repo (Gt2CenterPointTarget / Gt2PVRCNNTarget — see the
docstrings).
"""
from typing import Any, Dict, List, Sequence

import numpy as np

from ..apis import manager
from ..geometries import BBoxes3D, CoordMode
from ..sample import Sample
from .base import TransformABC

__all__ = [
    "GenerateAnchors", "SampleRangeFilter", "SampleNameFilter",
    "SampleFilerByKey", "ConvertBoxFormat", "ToVisionBasedBox",
    "LoadMultiViewImageFromFiles", "LoadMultiViewImageFromMultiSweepsFiles",
    "LoadAnnotations3D", "Resize", "Transpose", "NormalizeVision",
    "Gt2CenterPointTarget", "Gt2PVRCNNTarget",
]


def _limit_period(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period


def _gt_arrays(sample):
    """Locate gt boxes/labels whichever record convention carries them
    (dict keys gt_bboxes_3d/gt_labels_3d in the reference's mmdet-style
    pipelines; bboxes_3d/labels on this repo's Sample)."""
    if "gt_bboxes_3d" in sample:
        return "gt_bboxes_3d", "gt_labels_3d"
    return "bboxes_3d", "labels"


@manager.TRANSFORMS.add_component
class SampleRangeFilter(object):
    """Filter GT boxes to the BEV range + wrap yaw to [-pi, pi]
    (reference: transform.py:650)."""

    def __init__(self, point_cloud_range):
        self.pcd_range = np.asarray(point_cloud_range, np.float32)

    def __call__(self, sample):
        bk, lk = _gt_arrays(sample)
        boxes = np.asarray(sample[bk])
        labels = np.asarray(sample[lk])
        rng = self.pcd_range[[0, 1, 3, 4]]
        mask = ((boxes[:, 0] > rng[0]) & (boxes[:, 1] > rng[1]) &
                (boxes[:, 0] < rng[2]) & (boxes[:, 1] < rng[3]))
        boxes = boxes[mask]
        labels = labels[mask.astype(bool)]
        boxes[:, 6] = _limit_period(boxes[:, 6], 0.5, 2 * np.pi)
        sample[bk] = boxes
        sample[lk] = labels
        return sample


@manager.TRANSFORMS.add_component
class SampleNameFilter(object):
    """Keep GT whose label index is one of the training classes
    (reference: transform.py:714)."""

    def __init__(self, classes):
        self.classes = classes
        self.labels = list(range(len(classes)))

    def __call__(self, sample):
        bk, lk = _gt_arrays(sample)
        labels = np.asarray(sample[lk])
        mask = np.array([l in self.labels for l in labels], bool)
        sample[bk] = np.asarray(sample[bk])[mask]
        sample[lk] = labels[mask]
        return sample


@manager.TRANSFORMS.add_component
class SampleFilerByKey(object):
    """Collect only task-relevant keys (+ meta) into a fresh Sample
    (reference: transform.py:1252 — sic on the name)."""

    _DEFAULT_META = (
        "filename", "ori_shape", "img_shape", "lidar2img", "depth2img",
        "cam2img", "pad_shape", "scale_factor", "flip",
        "pcd_horizontal_flip", "pcd_vertical_flip", "box_mode_3d",
        "box_type_3d", "img_norm_cfg", "pcd_trans", "sample_idx",
        "prev_idx", "next_idx", "pcd_scale_factor", "pcd_rotation",
        "pts_filename", "transformation_3d_flow", "scene_token", "can_bus")

    def __init__(self, keys, meta_keys=None):
        self.keys = list(keys)
        self.meta_keys = tuple(meta_keys) if meta_keys is not None \
            else self._DEFAULT_META

    def __call__(self, sample):
        out = Sample(path=sample.path, modality=sample.modality)
        out.meta.id = sample.meta.get("id")
        for key in self.meta_keys:
            if key in sample:
                out.meta[key] = sample[key]
            elif key in sample.meta:
                out.meta[key] = sample.meta[key]
        for key in self.keys:
            out[key] = sample[key]
        return out


@manager.TRANSFORMS.add_component
class ConvertBoxFormat(TransformABC):
    """[x,y,z,w,l,h,yaw] bottom-center -> [x,y,z,l,w,h,heading,label+1]
    object-center (reference: transform.py:243 +
    box_utils.boxes3d_kitti_lidar_to_lidar)."""

    def __call__(self, sample: Sample):
        boxes = np.asarray(sample.bboxes_3d, np.float32).copy()
        w, l, h = boxes[:, 3:4], boxes[:, 4:5], boxes[:, 5:6]
        r = boxes[:, 6:7]
        boxes[:, 2:3] += h / 2
        boxes = np.concatenate(
            [boxes[:, 0:3], l, w, h, -(r + np.pi / 2)], axis=-1)
        boxes[:, -1] = _limit_period(boxes[:, -1], 0.5, 2 * np.pi)
        labels = np.asarray(sample.labels) + 1
        sample.bboxes_3d = np.concatenate(
            [boxes, labels.reshape(-1, 1).astype(np.float32)], axis=-1)
        sample.pop("labels", None)
        return sample


@manager.TRANSFORMS.add_component
class ToVisionBasedBox(TransformABC):
    """Camera-frame KITTI boxes -> DD3D's 10-dim vision pose form
    [qw,qx,qy,qz, tx,ty,tz, w,l,h] (reference: transform.py:91 +
    bbox.py:246 to_vision_based_3d_box; the quaternion is
    Q(x-axis, pi/2) * Q(z-axis, -rot), composed here in closed form)."""

    def __call__(self, sample: Sample):
        boxes = np.asarray(sample.bboxes_3d, np.float32)
        h, w, l = boxes[:, 3:4], boxes[:, 4:5], boxes[:, 5:6]
        x, y, z = boxes[:, 0:1], boxes[:, 1:2], boxes[:, 2:3]
        rot = boxes[:, 6]
        tvec = np.concatenate([x, y - h / 2, z], axis=1)
        c = np.float32(np.sqrt(0.5))
        cr, sr = np.cos(rot / 2), np.sin(rot / 2)
        quat = np.stack([c * cr, c * cr, c * sr, -c * sr],
                        axis=1).astype(np.float32)
        new = np.concatenate([quat, tvec, w, l, h], axis=1)
        sample.bboxes_3d = BBoxes3D(
            new, origin=[.5, 1, .5], coordmode=CoordMode.KittiCamera,
            rot_axis=1)
        return sample


@manager.TRANSFORMS.add_component
class LoadMultiViewImageFromFiles(TransformABC):
    """Read the per-camera image files named in sample['img_filename']
    (reference: reader.py:460). Emits the reference's key set (img list,
    shapes, img_norm_cfg)."""

    def __init__(self, to_float32=False, project_pts_to_img_depth=False,
                 cam_depth_range=(4.0, 45.0, 1.0), constant_std=0.5,
                 imread_flag=-1):
        self.to_float32 = to_float32
        self.project_pts_to_img_depth = project_pts_to_img_depth
        self.cam_depth_range = list(cam_depth_range)
        self.constant_std = constant_std
        self.imread_flag = imread_flag

    def _imread(self, name):
        import cv2
        img = cv2.imread(name, self.imread_flag)
        if img is None:
            raise FileNotFoundError(name)
        return img

    def __call__(self, sample):
        filename = sample["img_filename"]
        img = np.stack([self._imread(n) for n in filename], axis=-1)
        if self.to_float32:
            img = img.astype(np.float32)
        sample["filename"] = filename
        sample["img"] = [img[..., i] for i in range(img.shape[-1])]
        sample["img_shape"] = img.shape
        sample["ori_shape"] = img.shape
        sample["pad_shape"] = img.shape
        num_channels = 1 if len(img.shape) < 3 else img.shape[2]
        sample["img_norm_cfg"] = dict(
            mean=np.zeros(num_channels, np.float32),
            std=np.ones(num_channels, np.float32), to_rgb=False)
        sample["img_fields"] = ["img"]
        return sample


@manager.TRANSFORMS.add_component
class LoadMultiViewImageFromMultiSweepsFiles(object):
    """Append previous-sweep camera images from sample['sweeps']
    (reference: reader.py:589 — PETRv2's temporal input)."""

    _SENSORS = ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
                "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT")

    def __init__(self, sweeps_num=5, to_float32=False,
                 pad_empty_sweeps=False, sweep_range=(3, 27),
                 sweeps_id=None, imread_flag=-1, sensors=None,
                 test_mode=True, prob=1.0):
        self.sweeps_num = sweeps_num
        self.to_float32 = to_float32
        self.pad_empty_sweeps = pad_empty_sweeps
        self.sweep_range = list(sweep_range)
        self.sweeps_id = sweeps_id
        self.imread_flag = imread_flag
        self.sensors = list(sensors) if sensors else list(self._SENSORS)
        self.test_mode = test_mode
        self.prob = prob

    def __call__(self, sample):
        import cv2
        sweeps = sample.get("sweeps", [])
        imgs = list(sample["img"])
        timestamps = [0.0] * len(imgs)
        if not sweeps and self.pad_empty_sweeps:
            for _ in range(self.sweeps_num):
                imgs.extend(list(sample["img"][:len(self.sensors)]))
                timestamps.extend([self.sweep_range[0] / 10.0]
                                  * len(self.sensors))
        else:
            if self.sweeps_id is not None:
                chosen = self.sweeps_id
            else:
                chosen = list(range(min(self.sweeps_num, len(sweeps))))
            for i in chosen:
                sweep = sweeps[min(i, len(sweeps) - 1)]
                for sensor in self.sensors:
                    info = sweep[sensor]
                    im = cv2.imread(info["data_path"], self.imread_flag)
                    if im is None:
                        raise FileNotFoundError(info["data_path"])
                    if self.to_float32:
                        im = im.astype(np.float32)
                    imgs.append(im)
                    timestamps.append(info.get("timestamp", 0.0))
        sample["img"] = imgs
        sample["timestamp"] = np.asarray(timestamps, np.float64)
        return sample


@manager.TRANSFORMS.add_component
class LoadAnnotations3D(TransformABC):
    """Move annotations out of sample['ann_info'] into the gt keys
    (reference: reader.py:533)."""

    def __init__(self, with_bbox_3d=True, with_label_3d=True,
                 with_attr_label=False, with_mask_3d=False,
                 with_seg_3d=False):
        self.with_bbox_3d = with_bbox_3d
        self.with_label_3d = with_label_3d
        self.with_attr_label = with_attr_label
        self.with_mask_3d = with_mask_3d
        self.with_seg_3d = with_seg_3d

    def __call__(self, sample):
        ann = sample["ann_info"]
        if self.with_bbox_3d:
            sample["gt_bboxes_3d"] = ann["gt_bboxes_3d"]
            sample.setdefault("bbox3d_fields", []).append("gt_bboxes_3d")
        if self.with_label_3d:
            sample["gt_labels_3d"] = ann["gt_labels_3d"]
        if self.with_attr_label:
            sample["attr_labels"] = ann["attr_labels"]
        return sample


@manager.TRANSFORMS.add_component
class GenerateAnchors(TransformABC):
    """SSD anchors for PointPillars as a pipeline transform (reference:
    anchor_generator.py:29). Reuses the model-side AnchorGenerator (same
    constructor schema, models/detection/pointpillars/anchors.py) and
    stamps anchors + thresholds (+ occupancy anchors_mask when the sample
    carries voxel coords from HardVoxelize) onto the sample."""

    def __init__(self, output_stride_factor: int,
                 point_cloud_range: Sequence[float],
                 voxel_size: Sequence[float],
                 anchor_configs: List[Dict[str, Any]],
                 anchor_area_threshold: float = 1):
        from ..models.detection.pointpillars.anchors import AnchorGenerator
        self.gen = AnchorGenerator(
            output_stride_factor=output_stride_factor,
            point_cloud_range=point_cloud_range, voxel_size=voxel_size,
            anchor_configs=anchor_configs,
            anchor_area_threshold=anchor_area_threshold)
        self.anchor_area_threshold = float(anchor_area_threshold)

    def __call__(self, sample: Sample):
        if sample.modality != "lidar":
            raise ValueError("GenerateAnchors only supports lidar data!")
        sample.anchors = self.gen.anchors
        sample.matched_thresholds = self.gen.matched_thresholds
        sample.unmatched_thresholds = self.gen.unmatched_thresholds
        if self.anchor_area_threshold >= 0 and "coords" in sample:
            import jax.numpy as jnp
            coords = jnp.asarray(sample.coords)[None]
            mask = jnp.ones(coords.shape[:2], bool)
            if "num_voxels" in sample:
                mask = (jnp.arange(coords.shape[1])[None]
                        < int(sample.num_voxels))
            sample.anchors_mask = np.asarray(
                self.gen.anchors_mask(coords, mask)[0])
        return sample


@manager.TRANSFORMS.add_component
class Resize(TransformABC):
    """Bilinear image resize to (h, w) (BEV-LaneDet pipeline; the
    reference borrows paddle.vision.Resize)."""

    def __init__(self, size):
        self.size = tuple(size)  # (h, w)

    def __call__(self, sample: Sample):
        import cv2
        h, w = self.size
        sample.data = cv2.resize(np.asarray(sample.data), (w, h),
                                 interpolation=cv2.INTER_LINEAR)
        return sample


@manager.TRANSFORMS.add_component
class Transpose(TransformABC):
    """HWC -> CHW (the reference borrows paddle.vision.Transpose; models
    here are NHWC — deploy paths that need CHW opt in via the YAML)."""

    def __init__(self, order=(2, 0, 1)):
        self.order = tuple(order)

    def __call__(self, sample: Sample):
        sample.data = np.transpose(np.asarray(sample.data), self.order)
        return sample


@manager.TRANSFORMS.add_component
class NormalizeVision(TransformABC):
    """Channelwise (x - mean) / std in the data's own scale (the reference
    borrows paddle.vision.Normalize under this name,
    transform.py:1517)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, sample: Sample):
        data = np.asarray(sample.data, np.float32)
        shape = [1] * data.ndim
        axis = -1 if data.shape[-1] == len(self.mean) else -3
        shape[axis] = len(self.mean)
        sample.data = (data - self.mean.reshape(shape)) \
            / self.std.reshape(shape)
        return sample


@manager.TRANSFORMS.add_component
class LoadPointsFromFile(TransformABC):
    """Read a raw .bin point cloud named by sample['pts_filename']
    (reference: bevfusion/bevf_transforms.py:488)."""

    def __init__(self, load_dim=6, use_dim=(0, 1, 2), shift_height=False,
                 use_color=False, coord_type=None):
        if isinstance(use_dim, int):
            use_dim = list(range(use_dim))
        assert max(use_dim) < load_dim
        self.load_dim = load_dim
        self.use_dim = list(use_dim)
        self.shift_height = shift_height
        self.use_color = use_color

    def __call__(self, sample):
        pts = np.fromfile(sample["pts_filename"], np.float32)
        pts = pts.reshape(-1, self.load_dim)[:, self.use_dim]
        if self.shift_height:
            floor = np.percentile(pts[:, 2], 0.99)
            pts = np.concatenate(
                [pts[:, :3], (pts[:, 2] - floor)[:, None], pts[:, 3:]], 1)
        sample["points"] = pts
        return sample


@manager.TRANSFORMS.add_component
class LoadPointsFromMultiSweeps(object):
    """Append previous lidar sweeps from sample['sweeps'] with per-point
    time lag (reference: bevfusion/bevf_transforms.py:548)."""

    def __init__(self, sweeps_num=10, load_dim=5, use_dim=(0, 1, 2, 4),
                 pad_empty_sweeps=False, remove_close=False,
                 test_mode=False, point_cloud_angle_range=None):
        self.sweeps_num = sweeps_num
        self.load_dim = load_dim
        self.use_dim = list(use_dim)
        self.pad_empty_sweeps = pad_empty_sweeps
        self.remove_close = remove_close
        self.test_mode = test_mode
        self.point_cloud_angle_range = point_cloud_angle_range

    def _remove_close(self, points, radius=1.0):
        keep = np.linalg.norm(points[:, :2], axis=1) >= radius
        return points[keep]

    def __call__(self, sample):
        points = np.asarray(sample["points"])
        ts = sample.get("timestamp", 0.0)
        points = np.concatenate(
            [points, np.zeros((len(points), 1), np.float32)], axis=1)
        sweep_points = [points]
        sweeps = sample.get("sweeps", [])
        if not sweeps and self.pad_empty_sweeps:
            for _ in range(self.sweeps_num):
                sweep_points.append(
                    self._remove_close(points)
                    if self.remove_close else points)
        else:
            for sweep in sweeps[:self.sweeps_num]:
                pts = np.fromfile(sweep["data_path"], np.float32)
                pts = pts.reshape(-1, self.load_dim)
                if self.remove_close:
                    pts = self._remove_close(pts)
                r = np.asarray(sweep["sensor2lidar_rotation"], np.float32)
                t = np.asarray(sweep["sensor2lidar_translation"], np.float32)
                pts[:, :3] = pts[:, :3] @ r.T + t
                lag = ts - sweep.get("timestamp", ts)
                out = np.concatenate(
                    [pts, np.full((len(pts), 1), lag, np.float32)], axis=1)
                sweep_points.append(out)
        points = np.concatenate(sweep_points, axis=0)
        sample["points"] = points[:, self.use_dim + [points.shape[1] - 1]]
        return sample


@manager.TRANSFORMS.add_component
class ResizeImage(TransformABC):
    """Scale-aware image resize (reference:
    bevfusion/bevf_transforms.py:72). Deterministic core: the first
    img_scale entry, keeping aspect ratio when keep_ratio."""

    def __init__(self, img_scale=None, multiscale_mode="range",
                 ratio_range=None, keep_ratio=True, bbox_clip_border=True,
                 backend="cv2", override=False):
        if img_scale is not None and not isinstance(img_scale, list):
            img_scale = [img_scale]
        self.img_scale = img_scale
        self.multiscale_mode = multiscale_mode
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio

    def __call__(self, sample):
        import cv2
        img = np.asarray(sample["img"] if "img" in sample else sample.data)
        max_long, max_short = max(self.img_scale[0]), min(self.img_scale[0])
        h, w = img.shape[:2]
        if self.keep_ratio:
            scale = min(max_long / max(h, w), max_short / min(h, w))
            new_w, new_h = int(w * scale + 0.5), int(h * scale + 0.5)
        else:
            new_h, new_w = self.img_scale[0]
        out = cv2.resize(img, (new_w, new_h),
                         interpolation=cv2.INTER_LINEAR)
        key = "img" if "img" in sample else "data"
        sample[key] = out
        sample["img_shape"] = out.shape
        sample["scale_factor"] = np.array(
            [new_w / w, new_h / h, new_w / w, new_h / h], np.float32)
        return sample


@manager.TRANSFORMS.add_component
class PadImage(object):
    """Pad image to a fixed size or a size divisor (reference:
    bevfusion/bevf_transforms.py:349)."""

    def __init__(self, size=None, size_divisor=None, pad_val=0):
        assert (size is not None) ^ (size_divisor is not None)
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, sample):
        key = "img" if "img" in sample else "data"
        img = np.asarray(sample[key])
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = (h + d - 1) // d * d, (w + d - 1) // d * d
        pad = [(0, th - h), (0, tw - w)] + [(0, 0)] * (img.ndim - 2)
        sample[key] = np.pad(img, pad, constant_values=self.pad_val)
        sample["pad_shape"] = sample[key].shape
        return sample


@manager.TRANSFORMS.add_component
class SampleFilterByKey(TransformABC):
    """BEVFusion's collect-by-key (reference:
    bevf_transforms.py:454) — like SampleFilerByKey but meta lands under
    sample['img_metas']."""

    _DEFAULT_META = (
        "filename", "ori_shape", "img_shape", "lidar2img", "depth2img",
        "cam2img", "pad_shape", "scale_factor", "flip",
        "pcd_horizontal_flip", "pcd_vertical_flip", "box_type_3d",
        "img_norm_cfg", "pcd_trans", "sample_idx", "pcd_scale_factor",
        "pcd_rotation", "pts_filename", "transformation_3d_flow")

    def __init__(self, keys, meta_keys=None):
        self.keys = list(keys)
        self.meta_keys = tuple(meta_keys) if meta_keys is not None \
            else self._DEFAULT_META

    def __call__(self, sample):
        out = Sample(path=sample.path, modality=sample.modality)
        out.meta.id = sample.meta.get("id")
        out["img_metas"] = {k: sample[k] for k in self.meta_keys
                            if k in sample}
        for key in self.keys:
            out[key] = sample[key]
        return out


class _DeviceTargetSpec(TransformABC):
    """Base for the reference's host-side target builders whose assignment
    runs ON-DEVICE here (SURVEY.md §7: LiDAR target-gen is part of the
    jitted train step — the head consumes raw gt_boxes/gt_labels and
    builds heatmaps/assignments inside train_forward). The transform
    validates the reference schema and passes the sample through, keeping
    the YAML verbatim-portable."""

    def __call__(self, sample: Sample):
        return sample


@manager.TRANSFORMS.add_component
class Gt2CenterPointTarget(_DeviceTargetSpec):
    """(reference: target_generator.py Gt2CenterPointTarget) — heatmap /
    regression assignment runs in CenterHead.loss on device
    (models/heads/... center_head.py)."""

    def __init__(self, tasks=None, down_ratio=4, point_cloud_range=None,
                 voxel_size=None, gaussian_overlap=0.1, max_objs=500,
                 min_radius=2, **kwargs):
        self.spec = dict(tasks=tasks, down_ratio=down_ratio,
                         point_cloud_range=point_cloud_range,
                         voxel_size=voxel_size,
                         gaussian_overlap=gaussian_overlap,
                         max_objs=max_objs, min_radius=min_radius, **kwargs)


@manager.TRANSFORMS.add_component
class Gt2PVRCNNTarget(_DeviceTargetSpec):
    """(reference: target_generator.py Gt2PVRCNNTarget) — anchor and RoI
    target assignment runs on device in the PV-RCNN heads
    (models/heads/proposal_target_layer.py)."""

    def __init__(self, **kwargs):
        self.spec = dict(kwargs)


@manager.TRANSFORMS.add_component
class Gt2PointPillarsTarget(_DeviceTargetSpec):
    """(reference: target_generator.py:527 Gt2PointPillarsTarget) — anchor
    assignment (nearest-IoU matching against GenerateAnchors' lattice)
    runs on device in the PointPillars loss
    (models/detection/pointpillars/anchors.py + target_assigners.py)."""

    def __init__(self, positive_fraction=None, rpn_batch_size=512,
                 norm_by_num_examples=False, **kwargs):
        self.spec = dict(positive_fraction=positive_fraction,
                         rpn_batch_size=rpn_batch_size,
                         norm_by_num_examples=norm_by_num_examples,
                         **kwargs)
