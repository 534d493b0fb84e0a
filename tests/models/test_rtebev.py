import numpy as np
from flax import nnx

from tests.models.test_bevdet import make_bev_batch


def build_tiny_rtebev():
    from paddle3d_tpu.models.backbones import CustomResNet, ResNet
    from paddle3d_tpu.models.detection import CenterHead, RTEBev
    from paddle3d_tpu.models.necks import FPN_LSS
    from paddle3d_tpu.models.transformers import LSSViewTransformer

    rngs = nnx.Rngs(0)
    grid = dict(x=[-8., 8., 0.5], y=[-8., 8., 0.5], z=[-3., 3., 6.],
                depth=[1., 9., 1.])
    vt = LSSViewTransformer(grid, input_size=(64, 96), downsample=16,
                            in_channels=32, out_channels=16, rngs=rngs)
    head = CenterHead(
        in_channels=16, tasks=[dict(num_class=1, class_names=["car"])],
        weight=0.25, code_weights=[1.] * 8,
        common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2)),
        share_conv_channel=16, rngs=rngs)
    test_cfg = dict(
        nms=dict(nms_pre_max_size=64, nms_post_max_size=8,
                 nms_iou_threshold=0.2),
        score_threshold=0.05, point_cloud_range=[-8., -8., -3., 8., 8., 3.],
        down_ratio=1, voxel_size=[0.5, 0.5, 6.0],
        post_center_limit_range=[-12., -12., -5., 12., 12., 5.])
    return RTEBev(
        img_backbone=ResNet(depth=18, base_channels=8, out_indices=(2,),
                            rngs=rngs),
        img_neck=None,
        img_view_transformer=vt,
        img_bev_encoder_backbone=CustomResNet(
            16, num_layer=(1, 1), num_channels=(16, 32), stride=(1, 2),
            rngs=rngs),
        img_bev_encoder_neck=FPN_LSS(16 + 32, 16, rngs=rngs),
        bbox_head=head,
        test_cfg=test_cfg,
        target_assign_cfg=dict(down_ratio=1, max_objs=8),
        refine_layers=1, refine_heads=2)


def test_rtebev_train_and_infer(rng):
    import optax
    model = build_tiny_rtebev()
    batch = make_bev_batch(rng)
    optimizer = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            return m.train_forward(batch)["loss"]
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(3)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    model.eval()
    out = model.test_forward(batch)
    assert out["box3d_lidar"].shape == (1, 8, 7)
    assert out["bev_feature"].ndim == 4
