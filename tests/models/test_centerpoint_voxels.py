"""CenterPoint with the sparse-voxel middle encoder (the reference's
centerpoint_voxels configs) wired end-to-end."""
import numpy as np
import jax.numpy as jnp
from flax import nnx

PC = (0., -4., -2., 8., 4., 2.)
VS = (0.5, 0.5, 0.25)


def build_voxel_centerpoint():
    from paddle3d_tpu.models.backbones import SecondBackbone
    from paddle3d_tpu.models.detection import CenterHead, CenterPoint
    from paddle3d_tpu.models.middle_encoders import SparseNet3D
    from paddle3d_tpu.models.necks import SecondFPN
    from paddle3d_tpu.models.voxel_encoders import VoxelMean
    from paddle3d_tpu.models.voxelizers import HardVoxelizer

    rngs = nnx.Rngs(0)
    mid = SparseNet3D(in_channels=4, voxel_size=VS, point_cloud_range=PC,
                      stage_channels=(8, 16, 16, 16), rngs=rngs)
    d, h, w = mid.grid
    bev_ch = (d // 8) * 16
    test_cfg = dict(
        nms=dict(nms_pre_max_size=64, nms_post_max_size=8,
                 nms_iou_threshold=0.2),
        score_threshold=0.05, point_cloud_range=list(PC), down_ratio=8,
        voxel_size=list(VS),
        post_center_limit_range=[-12., -12., -5., 12., 12., 5.])
    return CenterPoint(
        voxelizer=HardVoxelizer(VS, PC, 5, [256, 256]),
        voxel_encoder=VoxelMean(4),
        middle_encoder=mid,
        backbone=SecondBackbone(bev_ch, (16, 32), (1, 1), (1, 2),
                                rngs=rngs),
        neck=SecondFPN((16, 32), (16, 16), (1, 2), rngs=rngs),
        bbox_head=CenterHead(
            in_channels=32, tasks=[dict(num_class=1, class_names=["car"])],
            weight=0.25, code_weights=[1.] * 8,
            common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                              rot=(2, 2)),
            share_conv_channel=16, rngs=rngs),
        test_cfg=test_cfg,
        target_assign_cfg=dict(down_ratio=8, max_objs=8))


def test_centerpoint_voxels_train_and_infer(rng):
    import optax
    model = build_voxel_centerpoint()
    pts = rng.uniform([0, -4, -2, 0], [8, 4, 2, 1], (1, 300, 4)).astype(
        np.float32)
    gt = np.array([[[4., 0., -1.5, 1.9, 3.0, 1.5, 0.2]]], np.float32)
    batch = {"data": jnp.asarray(pts), "gt_boxes": jnp.asarray(gt),
             "gt_labels": jnp.asarray(np.zeros((1, 1), np.int32))}
    optimizer = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        loss, grads = nnx.value_and_grad(
            lambda m: m.train_forward(batch)["loss"])(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(5)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    out = model.test_forward({"data": batch["data"]})
    assert out["box3d_lidar"].shape == (1, 8, 7)
