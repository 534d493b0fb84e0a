import numpy as np
import jax.numpy as jnp
from flax import nnx


def build_tiny_bevdet():
    from paddle3d_tpu.models.backbones import CustomResNet, ResNet
    from paddle3d_tpu.models.detection import BEVDet, CenterHead
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
    return BEVDet(
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
        target_assign_cfg=dict(down_ratio=1, max_objs=8))


def make_bev_batch(rng, b=1, n=2):
    imgs = rng.uniform(0, 1, (b, n, 64, 96, 3)).astype(np.float32)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3)).copy()
    k = np.array([[40., 0, 48.], [0, 40., 32.], [0, 0, 1.]], np.float32)
    cam2imgs = np.broadcast_to(k, (b, n, 3, 3)).copy()
    trans = np.zeros((b, n, 3), np.float32)
    bda = np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3)).copy()
    gt = np.zeros((b, 2, 7), np.float32)
    gt[..., 0] = [[2., -3.]]
    gt[..., 1] = [[1., 2.]]
    gt[..., 2] = -1.5
    gt[..., 3:6] = [1.9, 4.6, 1.7]
    labels = np.zeros((b, 2), np.int32)
    return {
        "img": jnp.asarray(imgs), "rots": jnp.asarray(eye),
        "trans": jnp.asarray(trans), "cam2imgs": jnp.asarray(cam2imgs),
        "post_rots": jnp.asarray(eye),
        "post_trans": jnp.asarray(np.zeros((b, n, 3), np.float32)),
        "bda": jnp.asarray(bda),
        "gt_boxes": jnp.asarray(gt), "gt_labels": jnp.asarray(labels),
    }


def test_bevdet_train_and_infer(rng):
    import optax
    model = build_tiny_bevdet()
    batch = make_bev_batch(rng)
    optimizer = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            return m.train_forward(batch)["loss"]
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(5)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    @nnx.jit
    def infer(model, batch):
        return model.test_forward(batch)

    out = infer(model, batch)
    assert out["box3d_lidar"].shape == (1, 8, 7)
    assert out["bev_feature"].shape[0] == 1  # temporal carry state


def test_bevdet4d_adjacent_frame_temporal(rng):
    """BEVDet4D trains from adjacent-frame images: the dataset composes
    ego motion into rots_adj/trans_adj, the model lifts the prev frame
    into the current lidar frame under stop_gradient and concats."""
    import optax
    from paddle3d_tpu.models.backbones import CustomResNet, ResNet
    from paddle3d_tpu.models.detection import BEVDet, CenterHead
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
    model = BEVDet(
        img_backbone=ResNet(depth=18, base_channels=8, out_indices=(2,),
                            rngs=rngs),
        img_neck=None,
        img_view_transformer=vt,
        img_bev_encoder_backbone=CustomResNet(
            32, num_layer=(1, 1), num_channels=(16, 32), stride=(1, 2),
            rngs=rngs),  # 32 = 16 current + 16 prev
        img_bev_encoder_neck=FPN_LSS(16 + 32, 16, rngs=rngs),
        bbox_head=head,
        test_cfg=dict(
            nms=dict(nms_pre_max_size=64, nms_post_max_size=8,
                     nms_iou_threshold=0.2),
            score_threshold=0.05,
            point_cloud_range=[-8., -8., -3., 8., 8., 3.],
            down_ratio=1, voxel_size=[0.5, 0.5, 6.0],
            post_center_limit_range=[-12., -12., -5., 12., 12., 5.]),
        target_assign_cfg=dict(down_ratio=1, max_objs=8),
        temporal=True)

    batch = make_bev_batch(rng)
    batch["img_adj"] = batch["img"] + 0.01
    batch["rots_adj"] = batch["rots"]
    batch["trans_adj"] = batch["trans"] + 0.1  # ego moved
    optimizer = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            return m.train_forward(batch)["loss"]
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(3)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    # no adjacent frame at all: temporal falls back to self-concat
    out = model.test_forward({k: v for k, v in batch.items()
                              if not k.endswith("_adj")})
    assert np.isfinite(np.asarray(out["box3d_lidar"])).all()
