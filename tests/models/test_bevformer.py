import numpy as np
import jax.numpy as jnp
from flax import nnx

PC = (-10., -10., -3., 10., 10., 3.)


def build_tiny_bevformer():
    from paddle3d_tpu.models.backbones import ResNet
    from paddle3d_tpu.models.detection import BEVFormer
    from paddle3d_tpu.models.heads import PETRHead
    rngs = nnx.Rngs(0)
    backbone = ResNet(depth=18, base_channels=8, out_indices=(3,), rngs=rngs)
    head = PETRHead(num_classes=2, in_channels=32, embed_dims=32,
                    num_query=16, num_heads=4, num_layers=2, depth_num=4,
                    pc_range=list(PC), position_range=list(PC), rngs=rngs)
    return BEVFormer(backbone, None, head, bev_h=8, bev_w=8, embed_dims=32,
                     num_heads=4, encoder_layers=2, pc_range=list(PC),
                     rngs=rngs)


def make_batch(rng, b=1, n=2):
    imgs = rng.uniform(0, 1, (b, n, 64, 64, 3)).astype(np.float32)
    l2i = np.zeros((b, n, 4, 4), np.float32)
    # project lidar (x,y,z) -> normalized image: u = y/x scaled, depth = x
    for c in range(n):
        m = np.zeros((4, 4), np.float32)
        m[0, 1] = 0.05; m[0, 3] = 0.5   # u from y
        m[1, 2] = 0.08; m[1, 3] = 0.5   # v from z
        m[2, 0] = 1.0                   # depth = x
        m[3, 3] = 1.0
        l2i[:, c] = m
    gt = np.zeros((b, 2, 9), np.float32)
    gt[..., 0] = [[4., -5.]]
    gt[..., 1] = [[2., 6.]]
    gt[..., 2] = -1.5
    gt[..., 3:6] = [1.9, 4.6, 1.7]
    labels = np.array([[0, 1]] * b, np.int32)
    return {"img": jnp.asarray(imgs), "lidar2imgs": jnp.asarray(l2i),
            "gt_boxes": jnp.asarray(gt), "gt_labels": jnp.asarray(labels)}


def test_bevformer_train_and_temporal(rng):
    import optax
    model = build_tiny_bevformer()
    batch = make_batch(rng)
    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            return m.train_forward(batch)["loss"]
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(4)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    @nnx.jit
    def infer(model, batch):
        return model.test_forward(batch)

    out = infer(model, {"img": batch["img"],
                        "lidar2imgs": batch["lidar2imgs"]})
    assert out["box3d_lidar"].shape[0] == 1
    # video mode: feed bev_feature back as prev_bev
    out2 = infer(model, {"img": batch["img"],
                         "lidar2imgs": batch["lidar2imgs"],
                         "prev_bev": out["bev_feature"]})
    assert out2["box3d_lidar"].shape == out["box3d_lidar"].shape


def build_tiny_bevformer_refine():
    from paddle3d_tpu.models.backbones import ResNet
    from paddle3d_tpu.models.detection import BEVFormer
    from paddle3d_tpu.models.heads import BEVFormerHead
    rngs = nnx.Rngs(0)
    backbone = ResNet(depth=18, base_channels=8, out_indices=(3,), rngs=rngs)
    head = BEVFormerHead(num_classes=2, in_channels=32, embed_dims=32,
                         num_query=16, num_heads=4, num_layers=2,
                         depth_num=4, pc_range=list(PC),
                         position_range=list(PC), with_box_refine=True,
                         rngs=rngs)
    return BEVFormer(backbone, None, head, bev_h=8, bev_w=8, embed_dims=32,
                     num_heads=4, encoder_layers=2, pc_range=list(PC),
                     rngs=rngs)


def test_rotate_prev_bev_alignment(rng):
    """A 90-degree yaw delta rotates the prev BEV map: a one-hot blob moves
    to the rotated cell (reference: transformer.py rotate(prev_bev,
    can_bus[-1]))."""
    import jax
    model = build_tiny_bevformer()
    h = w = 8
    bev = np.zeros((1, h * w, 4), np.float32)
    bev[0, 1 * w + 5, :] = 1.0  # blob at (y=1, x=5)
    out = jax.device_get(model._rotate_prev_bev(
        jnp.asarray(bev), jnp.asarray([np.pi / 2])))
    out = out.reshape(h, w, 4)
    # rotating the map by +90deg about the center (3.5, 3.5):
    # source (1,5) lands at output position where inverse rotation maps back
    iy, ix = np.unravel_index(np.argmax(out[..., 0]), (h, w))
    # forward rotate (y=1,x=5): dy=-2.5, dx=1.5 -> (dy,dx)->(dx,-dy)=(1.5,2.5)
    assert (iy, ix) == (5, 6), (iy, ix)
    # zero angle = identity
    same = jax.device_get(model._rotate_prev_bev(
        jnp.asarray(bev), jnp.asarray([0.0]))).reshape(h, w, 4)
    np.testing.assert_allclose(same, bev.reshape(h, w, 4), atol=1e-5)


def test_can_bus_shift_translation():
    """Pure forward ego translation shifts the prev-BEV sampling grid by
    meters/grid (reference: transformer.py:142-186)."""
    model = build_tiny_bevformer()
    can = np.zeros((1, 18), np.float32)
    can[0, 0] = 2.5  # 2.5 m along global +x
    can[0, -2] = 0.0  # ego yaw 0 -> bev_angle = 0
    shift = np.asarray(model._can_bus_shift(jnp.asarray(can)))
    # grid length = 20m/8 cells = 2.5 m -> shift_y = 2.5/2.5/8 = 0.125
    np.testing.assert_allclose(shift[0, 1], 0.125, atol=1e-6)
    np.testing.assert_allclose(shift[0, 0], 0.0, atol=1e-6)


def test_obtain_history_bev_and_refine_train(rng):
    """Temporal training: history queue warms up prev_bev without gradients;
    the refinement head trains; per-layer boxes differ (iterative
    refinement actually changes reference points)."""
    import jax
    import optax
    model = build_tiny_bevformer_refine()
    batch = make_batch(rng)
    t = 2
    batch["img_queue"] = jnp.stack([batch["img"]] * t, axis=1)
    batch["lidar2imgs_queue"] = jnp.stack([batch["lidar2imgs"]] * t, axis=1)
    can = np.zeros((1, 18), np.float32)
    can[0, 0] = 1.0
    can[0, -1] = 0.1
    batch["can_bus"] = jnp.asarray(can)
    batch["can_bus_queue"] = jnp.asarray(np.stack([can] * t, axis=1))

    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            return m.train_forward(batch)["loss"]
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(3)]
    assert np.isfinite(losses).all()

    # decoder refinement: layer-0 and layer-1 boxes must differ
    bev = model.get_bev_features(batch["img"], batch["lidar2imgs"],
                                 None, batch["can_bus"])
    all_cls, all_bbox = model.head.decode_over_tokens(bev, (8, 8))
    assert all_bbox.shape[0] == 2
    diff = np.abs(np.asarray(all_bbox[0]) - np.asarray(all_bbox[1])).max()
    assert diff > 1e-4
