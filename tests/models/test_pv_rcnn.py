"""Tiny PV-RCNN / Voxel-RCNN end-to-end: stage-1 + rotated-IoU proposal
targets + RoI-grid refinement train and test forwards (reference:
paddle3d/models/detection/pv_rcnn/pv_rcnn.py:34, voxel_rcnn.py:34)."""
import jax
import numpy as np
import pytest
from flax import nnx

PC_RANGE = (0., -8., -2., 16., 8., 2.)
VOXEL = (0.5, 0.5, 0.5)

ANCHOR_CFG = [dict(sizes=[1.6, 3.9, 1.56], anchor_strides=[4.0, 4.0, 0.0],
                   anchor_offsets=[2.0, -6.0, -1.78], rotations=[0., 1.57],
                   matched_threshold=0.6, unmatched_threshold=0.45)]


def build(model_cls):
    from paddle3d_tpu.models.detection.pv_rcnn import PVRCNN, VoxelRCNN
    from paddle3d_tpu.models.backbones import SecondBackbone
    from paddle3d_tpu.models.heads import Anchor3DHead, RoIGridHead
    from paddle3d_tpu.models.middle_encoders.sparse_resnet import SparseNet3D
    from paddle3d_tpu.models.necks import SecondFPN
    from paddle3d_tpu.models.point_encoders import VoxelSetAbstraction
    from paddle3d_tpu.models.voxel_encoders import VoxelMean
    from paddle3d_tpu.models.voxelizers import HardVoxelizer

    rngs = nnx.Rngs(0)
    kwargs = dict(
        voxelizer=HardVoxelizer(VOXEL, PC_RANGE, 5, [512, 512]),
        voxel_encoder=VoxelMean(in_channels=4),
        middle_encoder=SparseNet3D(
            in_channels=4, voxel_size=VOXEL, point_cloud_range=PC_RANGE,
            stage_channels=(8, 8, 16, 16), rngs=rngs),
        backbone=SecondBackbone(16, (16,), (1,), (1,), rngs=rngs),
        neck=SecondFPN((16,), (16,), (1,), rngs=rngs),
        rpn_head=Anchor3DHead(
            num_classes=1, feature_channels=16, anchor_configs=ANCHOR_CFG,
            point_cloud_range=PC_RANGE, voxel_size=VOXEL,
            output_stride_factor=8, num_proposals=16, nms_pre=64,
            rngs=rngs),
        # VoxelRCNN pools per-level from the last two sparse stages (16ch
        # each); PVRCNN pools the VSA keypoint features (16ch) at all radii
        roi_head=RoIGridHead(
            in_channels=16 if model_cls.__name__ == "PVRCNN" else [16, 16],
            grid_size=2, mlps=(8, 8), radii=(0.8, 1.6),
            nsamples=(4, 4), head_fc=(16, 16), rngs=rngs),
        target_config=dict(roi_per_image=8, fg_ratio=0.5),
    )
    if model_cls is PVRCNN:
        kwargs["point_encoder"] = VoxelSetAbstraction(
            num_keypoints=64, bev_channels=16, bev_stride=8,
            point_cloud_range=PC_RANGE, voxel_size=VOXEL,
            raw_mlps=(8, 8), out_channels=16, rngs=rngs)
    return model_cls(**kwargs)


def make_batch(rng, b=2):
    pts = rng.uniform([0, -8, -2, 0], [16, 8, 2, 1],
                      (b, 512, 4)).astype(np.float32)
    gt = np.zeros((b, 3, 7), np.float32)
    gt[..., 0] = rng.uniform(3, 13, (b, 3))
    gt[..., 1] = rng.uniform(-5, 5, (b, 3))
    gt[..., 2] = -1.8
    gt[..., 3:6] = [1.6, 3.9, 1.56]
    labels = np.zeros((b, 3), np.int32)
    labels[:, 2] = -1
    return {"data": pts, "gt_boxes": gt, "gt_labels": labels}


@pytest.mark.parametrize("name", ["pvrcnn", "voxelrcnn"])
def test_two_stage_train_and_test(rng, name):
    from paddle3d_tpu.models.detection.pv_rcnn import PVRCNN, VoxelRCNN

    model = build(PVRCNN if name == "pvrcnn" else VoxelRCNN)
    batch = make_batch(rng)

    @nnx.jit
    def train(model, batch):
        return model.train_forward(batch)

    losses = jax.device_get(train(model, batch))
    for k in ("loss", "loss_rcnn_cls", "loss_rcnn_reg"):
        assert k in losses and np.isfinite(losses[k]), (k, losses)

    # rng stream advances: second step draws a different subsample key
    losses2 = jax.device_get(train(model, batch))
    assert np.isfinite(losses2["loss"])

    out = jax.device_get(nnx.jit(lambda m, b: m.test_forward(b))(
        model, batch))
    assert out["box3d_lidar"].shape == (2, 16, 7)
    assert out["scores"].shape == (2, 16)
