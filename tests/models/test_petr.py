import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

PC_RANGE = (-10., -10., -3., 10., 10., 3.)


def build_tiny_petr():
    from paddle3d_tpu.models.backbones import ResNet
    from paddle3d_tpu.models.detection import PETR
    from paddle3d_tpu.models.heads import PETRHead
    from paddle3d_tpu.models.necks import CPFPN

    rngs = nnx.Rngs(0)
    backbone = ResNet(depth=18, base_channels=8, out_indices=(2, 3),
                      rngs=rngs)
    neck = CPFPN(in_channels=[32, 64], out_channels=16, num_outs=2,
                 rngs=rngs)
    head = PETRHead(
        num_classes=3, in_channels=16, embed_dims=32, num_query=24,
        num_heads=4, num_layers=2, depth_num=8,
        position_range=[-12., -12., -4., 12., 12., 4.],
        pc_range=list(PC_RANGE), rngs=rngs)
    return PETR(backbone, neck, head)


def make_mv_batch(rng, b=1, n_cam=2, h=64, w=96):
    imgs = rng.uniform(0, 1, (b, n_cam, h, w, 3)).astype(np.float32)
    # simple img2lidar: frustum (u, v, d) -> lidar (d, u*d-..., ...)
    mats = np.zeros((b, n_cam, 4, 4), np.float32)
    for c in range(n_cam):
        m = np.eye(4, dtype=np.float32)
        m[0, 2] = 1.0   # x_lidar = depth
        m[0, 0] = 0.0
        m[1, 0] = 8.0   # y from u
        m[1, 3] = -4.0
        m[2, 1] = 4.0   # z from v
        m[2, 3] = -2.0
        m[2, 2] = 0.0
        m[1, 1] = 0.0
        mats[:, c] = m
    gt = np.zeros((b, 3, 9), np.float32)
    gt[..., 0] = rng.uniform(-8, 8, (b, 3))
    gt[..., 1] = rng.uniform(-8, 8, (b, 3))
    gt[..., 2] = -1.5
    gt[..., 3:6] = [1.9, 4.6, 1.7]
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (b, 3))
    labels = np.array([[0, 1, -1]] * b, np.int32)
    return {
        "img": jnp.asarray(imgs),
        "img2lidars": jnp.asarray(mats),
        "gt_boxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(labels),
    }


def test_petr_train_loss_decreases(rng):
    import optax
    model = build_tiny_petr()
    batch = make_mv_batch(rng)
    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            return m.train_forward(batch)["loss"]
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(6)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_petr_inference(rng):
    model = build_tiny_petr()
    batch = make_mv_batch(rng)

    @nnx.jit
    def infer(model, batch):
        return model.test_forward(
            {"img": batch["img"], "img2lidars": batch["img2lidars"]})

    out = infer(model, batch)
    assert out["box3d_lidar"].shape[0] == 1
    assert out["box3d_lidar"].shape[-1] == 9
    samples = model.postprocess_to_samples(
        {k: np.asarray(v) for k, v in out.items()}, [{"path": "x", "id": 0}])
    assert samples[0].modality == "multiview"


def test_petrv2_temporal(rng):
    """PETRv2 mode: 2-frame inputs as extra views with time embedding."""
    import optax
    from paddle3d_tpu.models.backbones import ResNet
    from paddle3d_tpu.models.detection import PETR
    from paddle3d_tpu.models.heads import PETRHead
    from paddle3d_tpu.models.necks import CPFPN

    rngs = nnx.Rngs(0)
    backbone = ResNet(depth=18, base_channels=8, out_indices=(2, 3),
                      rngs=rngs)
    neck = CPFPN(in_channels=[32, 64], out_channels=16, num_outs=2,
                 rngs=rngs)
    head = PETRHead(num_classes=3, in_channels=16, embed_dims=32,
                    num_query=16, num_heads=4, num_layers=2, depth_num=8,
                    position_range=[-12., -12., -4., 12., 12., 4.],
                    pc_range=list(PC_RANGE), rngs=rngs)
    model = PETR(backbone, neck, head, version=2)
    batch = make_mv_batch(rng, n_cam=4)  # 2 cams x 2 frames
    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        loss, grads = nnx.value_and_grad(
            lambda m: m.train_forward(batch)["loss"])(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(4)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_cape_head(rng):
    """CAPE: per-camera decoupled attention with camera-frame query PE."""
    import optax
    from paddle3d_tpu.models.backbones import ResNet
    from paddle3d_tpu.models.detection import PETR
    from paddle3d_tpu.models.heads import CAPEHead
    from paddle3d_tpu.models.necks import CPFPN

    rngs = nnx.Rngs(0)
    head = CAPEHead(num_classes=2, in_channels=16, embed_dims=32,
                    num_query=12, num_heads=4, num_layers=2, depth_num=4,
                    position_range=[-12., -12., -4., 12., 12., 4.],
                    pc_range=list(PC_RANGE), rngs=rngs)
    batch = make_mv_batch(rng)
    b, n = batch["img"].shape[:2]
    l2c = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    l2c[..., 2, 3] = 5.0  # all points in front

    feats = jnp.asarray(rng.normal(size=(b, n, 8, 12, 16)).astype(
        np.float32))
    all_cls, all_bbox = head(feats, batch["img2lidars"],
                             jnp.asarray(l2c))
    assert all_cls.shape == (2, b, 12, 2)
    losses = head.loss(all_cls, all_bbox, batch["gt_boxes"],
                       batch["gt_labels"])
    assert np.isfinite(float(losses["loss"]))
    out = head.predict(all_cls, all_bbox)
    assert out["box3d_lidar"].shape[0] == b


def test_petrv2_seg_head(rng):
    """PETRv2 BEV segmentation: seg queries decode BEV patches."""
    import optax
    from paddle3d_tpu.models.backbones import ResNet
    from paddle3d_tpu.models.detection import PETR
    from paddle3d_tpu.models.heads import PETRHead, PETRSegHead
    from paddle3d_tpu.models.necks import CPFPN

    rngs = nnx.Rngs(0)
    backbone = ResNet(depth=18, base_channels=8, out_indices=(2, 3),
                      rngs=rngs)
    neck = CPFPN(in_channels=[32, 64], out_channels=16, num_outs=2,
                 rngs=rngs)
    det_head = PETRHead(
        num_classes=3, in_channels=16, embed_dims=32, num_query=24,
        num_heads=4, num_layers=2, depth_num=8,
        position_range=[-12., -12., -4., 12., 12., 4.],
        pc_range=list(PC_RANGE), rngs=rngs)
    seg_head = PETRSegHead(
        num_classes=2, bev_size=(32, 32), patch_size=8, in_channels=16,
        embed_dims=32, num_heads=4, num_layers=2, depth_num=8,
        position_range=[-12., -12., -4., 12., 12., 4.],
        pc_range=list(PC_RANGE))
    model = PETR(backbone, neck, det_head, seg_head=seg_head)

    batch = make_mv_batch(rng)
    seg_gt = (rng.uniform(0, 1, (1, 32, 32, 2)) > 0.8).astype(np.float32)
    batch["gt_semantic_map"] = jnp.asarray(seg_gt)

    import optax
    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            return m.train_forward(batch)["loss"]
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(4)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    out = model.test_forward(batch)
    assert out["seg_probs"].shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out["seg_probs"])).all()


def test_cape_t_temporal(rng):
    """CAPE-T: dual query streams over two frames, per-layer ego-gated
    MLP fusion, time-normalized velocities, prev-stream aux loss."""
    import optax
    from paddle3d_tpu.models.backbones import ResNet
    from paddle3d_tpu.models.detection import PETR
    from paddle3d_tpu.models.heads import CAPEHead
    from paddle3d_tpu.models.necks import CPFPN

    rngs = nnx.Rngs(0)
    backbone = ResNet(depth=18, base_channels=8, out_indices=(2, 3),
                      rngs=rngs)
    neck = CPFPN(in_channels=[32, 64], out_channels=16, num_outs=2,
                 rngs=rngs)
    head = CAPEHead(
        num_classes=2, in_channels=16, embed_dims=32, num_query=12,
        num_heads=4, num_layers=2, depth_num=4, code_size=10,
        code_weights=[1.] * 8 + [0.2] * 2,
        position_range=[-12., -12., -4., 12., 12., 4.],
        pc_range=list(PC_RANGE), with_time=True, with_prev_aux_loss=True,
        rngs=rngs)
    model = PETR(backbone, neck, head, version=2)
    batch = make_mv_batch(rng, n_cam=4)  # 2 cams x 2 frames
    b, n = batch["img"].shape[:2]
    l2c = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    l2c[..., 2, 3] = 5.0
    # previous frame's rig rotated slightly (ego motion)
    th = 0.1
    rot = np.array([[np.cos(th), -np.sin(th), 0, 0],
                    [np.sin(th), np.cos(th), 0, 0],
                    [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    l2c[:, n // 2:] = l2c[:, n // 2:] @ rot
    batch["lidar2cams"] = jnp.asarray(l2c)
    # 9-col boxes so velocity columns exercise the time normalization
    g = batch["gt_boxes"].shape[1]
    batch["gt_boxes"] = jnp.concatenate(
        [batch["gt_boxes"], jnp.zeros((b, g, 2))], axis=-1)

    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            losses = m.train_forward(batch)
            return losses["loss"], losses
        (loss, losses), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        optimizer.update(model, grads)
        return losses

    all_losses = [jax.device_get(step(model, optimizer, batch))
                  for _ in range(4)]
    assert "loss_cls_prev" in all_losses[0]
    vals = [float(l["loss"]) for l in all_losses]
    assert np.isfinite(vals).all() and vals[-1] < vals[0]

    model.eval()
    out = model.test_forward(batch)
    assert np.isfinite(np.asarray(out["scores"])).all()
