import numpy as np
import jax.numpy as jnp
from flax import nnx

PC = [-8., -8., -3., 8., 8., 3.]
VS = [0.5, 0.5, 6.0]


def build_tiny_bevfusion():
    from paddle3d_tpu.models.backbones import ResNet
    from paddle3d_tpu.models.detection import BEVFusion, CenterHead
    from paddle3d_tpu.models.middle_encoders import PointPillarsScatter
    from paddle3d_tpu.models.transformers import LSSViewTransformer
    from paddle3d_tpu.models.voxel_encoders import PillarFeatureNet
    from paddle3d_tpu.models.voxelizers import HardVoxelizer

    rngs = nnx.Rngs(0)
    grid = dict(x=[-8., 8., 0.5], y=[-8., 8., 0.5], z=[-3., 3., 6.],
                depth=[1., 9., 1.])
    head = CenterHead(
        in_channels=32, tasks=[dict(num_class=1, class_names=["car"])],
        weight=0.25, code_weights=[1.] * 8,
        common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2)),
        share_conv_channel=16, rngs=rngs)
    test_cfg = dict(
        nms=dict(nms_pre_max_size=64, nms_post_max_size=8,
                 nms_iou_threshold=0.2),
        score_threshold=0.05, point_cloud_range=PC, down_ratio=1,
        voxel_size=VS,
        post_center_limit_range=[-12., -12., -5., 12., 12., 5.])
    from paddle3d_tpu.models.backbones import SecondBackbone
    from paddle3d_tpu.models.necks import SecondFPN
    return BEVFusion(
        bbox_head=head, test_cfg=test_cfg, point_cloud_range=PC,
        voxel_size=VS,
        lidar_voxelizer=HardVoxelizer(VS, PC, 8, 100),
        lidar_voxel_encoder=PillarFeatureNet(
            4, (16,), max_num_points_in_voxel=8, voxel_size=VS,
            point_cloud_range=PC, legacy=False, rngs=rngs),
        lidar_middle_encoder=PointPillarsScatter(16, VS, PC),
        pts_backbone=SecondBackbone(in_channels=16, out_channels=(16, 32),
                                    layer_nums=(1, 1),
                                    downsample_strides=(1, 2), rngs=rngs),
        pts_neck=SecondFPN(in_channels=(16, 32), out_channels=(8, 8),
                           upsample_strides=(1, 2), rngs=rngs),
        img_backbone=ResNet(depth=18, base_channels=8, out_indices=(2,),
                            rngs=rngs),
        img_neck=None,
        img_view_transformer=LSSViewTransformer(
            grid, input_size=(64, 96), downsample=16, in_channels=32,
            out_channels=16, rngs=rngs),
        fusion_channels=32, lidar_channels=16, camera_channels=16,
        se=True, camera_depth_range=[1.0, 9.0, 1.0],
        target_assign_cfg=dict(down_ratio=1, max_objs=8), rngs=rngs)


def make_batch(rng, b=1, n=2):
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3)).copy()
    k = np.array([[40., 0, 48.], [0, 40., 32.], [0, 0, 1.]], np.float32)
    gt = np.zeros((b, 2, 7), np.float32)
    gt[..., 0] = [[2., -3.]]
    gt[..., 1] = [[1., 2.]]
    gt[..., 2] = -1.5
    gt[..., 3:6] = [1.9, 4.6, 1.7]
    return {
        "data": jnp.asarray(rng.uniform([-8, -8, -3, 0], [8, 8, 3, 1],
                                        (b, 256, 4)).astype(np.float32)),
        "img": jnp.asarray(rng.uniform(0, 1, (b, n, 64, 96, 3)).astype(
            np.float32)),
        "rots": jnp.asarray(eye),
        "trans": jnp.asarray(np.zeros((b, n, 3), np.float32)),
        "cam2imgs": jnp.asarray(np.broadcast_to(k, (b, n, 3, 3)).copy()),
        "post_rots": jnp.asarray(eye),
        "post_trans": jnp.asarray(np.zeros((b, n, 3), np.float32)),
        "bda": jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32),
                                           (b, 3, 3)).copy()),
        "gt_boxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(np.zeros((b, 2), np.int32)),
        # gaussian depth targets at the camera feature stride (D=8 bins)
        "img_depth": jnp.asarray(np.concatenate([
            rng.uniform(1.5, 8.5, (b, n, 4, 6, 1)),
            rng.dirichlet(np.ones(8), (b, n, 4, 6)),
        ], axis=-1).astype(np.float32)),
    }


def test_bevfusion_train_and_infer(rng):
    import optax
    model = build_tiny_bevfusion()
    batch = make_batch(rng)
    optimizer = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        loss, grads = nnx.value_and_grad(
            lambda m: m.train_forward(batch)["loss"])(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(5)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # camera depth supervision must be active in the loss dict
    model.train()
    ld = model.train_forward(batch)
    assert "img_depth_loss" in ld and np.isfinite(float(ld["img_depth_loss"]))

    @nnx.jit
    def infer(model, batch):
        return model.test_forward(batch)

    out = infer(model, batch)
    assert out["box3d_lidar"].shape == (1, 8, 7)
