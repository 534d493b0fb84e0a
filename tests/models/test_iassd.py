import numpy as np
import jax.numpy as jnp
from flax import nnx


def build_tiny_iassd():
    from paddle3d_tpu.models.detection import IASSD
    return IASSD(
        num_classes=2, input_channel=4,
        npoint_list=(64, 32, 16),
        sample_method_list=("d-fps", "ctr_aware", "ctr_aware"),
        radius_list=((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)),
        nsample_list=((8, 8), (8, 8), (8, 8)),
        mlps=(((8, 8), (8, 8)), ((16, 16), (16, 16)), ((16, 32), (16, 32))),
        aggregation_mlps=((16,), (32,), (32,)),
        confidence_mlps=((), (16,), (16,)),
        vote_mlps=(32,),
        cls_fc=(32,), reg_fc=(32,),
        nms_cfg=dict(score_threshold=0.1, iou_threshold=0.1,
                     pre_max_size=16, post_max_size=8),
        rngs=nnx.Rngs(0))


def make_batch(rng, b=1, n=256):
    pts = rng.uniform([0, -8, -2, 0], [16, 8, 2, 1], (b, n, 4)).astype(
        np.float32)
    gt = np.zeros((b, 2, 7), np.float32)
    gt[..., 0] = [[5., 11.]]
    gt[..., 1] = [[-2., 3.]]
    gt[..., 2] = -1.7
    gt[..., 3:6] = [1.9, 4.6, 1.7]
    labels = np.array([[0, 1]] * b, np.int32)
    return {"data": jnp.asarray(pts), "gt_boxes": jnp.asarray(gt),
            "gt_labels": jnp.asarray(labels)}


def test_iassd_train_and_infer(rng):
    import optax
    model = build_tiny_iassd()
    batch = make_batch(rng)
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
    def infer(model, pts):
        return model.test_forward({"data": pts})

    out = infer(model, batch["data"])
    assert out["box3d_lidar"].shape == (1, 8, 7)
