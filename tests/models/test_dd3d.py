import numpy as np
import jax.numpy as jnp
from flax import nnx


def build_tiny_dd3d():
    from paddle3d_tpu.models.backbones import ResNet
    from paddle3d_tpu.models.detection import DD3D
    from paddle3d_tpu.models.necks import FPN
    rngs = nnx.Rngs(0)
    backbone = ResNet(depth=18, base_channels=8, out_indices=(1, 2, 3),
                      rngs=rngs)
    neck = FPN(in_channels=[16, 32, 64], out_channels=16, rngs=rngs)
    return DD3D(backbone, neck, num_classes=2, in_channels=16,
                feat_channels=16, num_convs=1, strides=(8, 16, 32),
                size_ranges=((0, 32), (32, 64), (64, 1e8)),
                depth_ref=(15., 8.),
                dim_ref=((3.88, 1.63, 1.53), (0.8, 1.7, 0.7)),
                max_detection=16, score_threshold=0.1, rngs=rngs)


def test_dd3d_train_and_infer(rng):
    import optax
    model = build_tiny_dd3d()
    b, h, w = 1, 64, 96
    img = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    g = 3
    gt2d = np.zeros((b, g, 4), np.float32)
    gt2d[0, 0] = [10, 10, 40, 40]
    gt2d[0, 1] = [50, 20, 90, 60]
    gt3d = np.zeros((b, g, 7), np.float32)
    gt3d[0, :2] = [[-1., 1.5, 12., 1.5, 1.6, 3.9, 0.3],
                   [2., 1.5, 20., 1.5, 1.6, 3.9, -0.2]]
    labels = np.array([[0, 1, -1]], np.int32)
    k = np.array([[60., 0, 48.], [0, 60., 32.], [0, 0, 1.]], np.float32)
    batch = {
        "data": jnp.asarray(img),
        "gt_boxes_2d": jnp.asarray(gt2d),
        "gt_boxes_cam": jnp.asarray(gt3d),
        "gt_labels": jnp.asarray(labels),
    }
    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        loss, grads = nnx.value_and_grad(
            lambda m: m.train_forward(batch)["loss"])(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(5)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    out = model.test_forward({
        "data": batch["data"],
        "K_inv": jnp.asarray(np.linalg.inv(k)[None]),
    })
    assert out["box3d_cam"].shape[-1] == 7
    samples = model.postprocess_to_samples(
        {k2: np.asarray(v) for k2, v in out.items()},
        [{"path": "x", "id": 0}])
    assert samples[0].frame == "camera"
