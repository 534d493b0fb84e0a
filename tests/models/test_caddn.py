import numpy as np
import jax.numpy as jnp
from flax import nnx

PC = [0., -8., -3., 16., 8., 1.]
VS = [0.5, 0.5, 4.0]


def build_tiny_caddn():
    from paddle3d_tpu.models.backbones import ResNet, SecondBackbone
    from paddle3d_tpu.models.detection import CADDN, CenterHead
    rngs = nnx.Rngs(0)
    head = CenterHead(
        in_channels=16, tasks=[dict(num_class=1, class_names=["car"])],
        weight=0.25, code_weights=[1.] * 8,
        common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2)),
        share_conv_channel=16, rngs=rngs)
    test_cfg = dict(
        nms=dict(nms_pre_max_size=64, nms_post_max_size=8,
                 nms_iou_threshold=0.2),
        score_threshold=0.05, point_cloud_range=PC, down_ratio=1,
        voxel_size=VS,
        post_center_limit_range=[-4., -12., -5., 20., 12., 5.])
    return CADDN(
        backbone=ResNet(depth=18, base_channels=8, out_indices=(2,),
                        rngs=rngs),
        bev_backbone=nnx.Sequential(
            *[__import__('paddle3d_tpu').models.layers.layer_libs.ConvBNReLU(
                16, 16, 3, rngs=rngs)]),
        bbox_head=head, test_cfg=test_cfg,
        point_cloud_range=PC, voxel_size=VS,
        depth_bins=8, depth_range=(1.0, 17.0),
        feat_channels=16, backbone_channels=32, downsample=16,
        image_size=(64, 96),
        target_assign_cfg=dict(down_ratio=1, max_objs=8), rngs=rngs)


def test_caddn_train_and_infer(rng):
    import optax
    model = build_tiny_caddn()
    img = rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32)
    # img2lidar: lidar x = depth (camera z), y from u, z from v
    m = np.zeros((4, 4), np.float32)
    m[0, 2] = 1.0
    m[1, 0] = -0.1; m[1, 3] = 5.
    m[2, 1] = -0.05; m[2, 3] = 0.
    m[3, 3] = 1.0
    gt = np.array([[[8., 0., -1.5, 1.9, 4.0, 1.6, 0.1]]], np.float32)
    depth_map = rng.uniform(1, 17, (1, 4, 6)).astype(np.float32)
    batch = {
        "data": jnp.asarray(img),
        "img2lidars": jnp.asarray(m[None]),
        "gt_boxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(np.zeros((1, 1), np.int32)),
        "depth_map": jnp.asarray(depth_map),
    }
    optimizer = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        loss, grads = nnx.value_and_grad(
            lambda m: m.train_forward(batch)["loss"])(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(5)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    out = model.test_forward({k: batch[k] for k in ("data", "img2lidars")})
    assert out["box3d_lidar"].shape == (1, 8, 7)
