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
