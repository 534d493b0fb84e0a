import numpy as np
import jax.numpy as jnp
from flax import nnx


def test_squeezesegv3(rng):
    import optax
    from paddle3d_tpu.models.segmentation import SACRangeNet, SqueezeSegV3
    rngs = nnx.Rngs(0)
    model = SqueezeSegV3(
        SACRangeNet(5, (8, 8), rngs=rngs), num_classes=4, rngs=rngs)
    img = rng.normal(size=(1, 8, 32, 5)).astype(np.float32)
    labels = rng.integers(0, 4, (1, 8, 32)).astype(np.int32)
    mask = np.ones((1, 8, 32), bool)
    batch = {"data": jnp.asarray(img), "proj_labels": jnp.asarray(labels),
             "proj_mask": jnp.asarray(mask)}
    optimizer = nnx.Optimizer(model, optax.adam(3e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        loss, grads = nnx.value_and_grad(
            lambda m: m.train_forward(batch)["loss"])(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(8)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    out = model.test_forward(batch)
    assert out["pred_labels"].shape == (1, 8, 32)


def test_range_projection(tmp_path, rng):
    from paddle3d_tpu.sample import Sample
    from paddle3d_tpu.transforms import LoadSemanticKITTIRange
    pts = rng.uniform([-20, -20, -2, 0], [20, 20, 1, 1], (500, 4)).astype(
        np.float32)
    f = tmp_path / "scan.bin"
    pts.tofile(f)
    s = Sample(path=str(f), modality="lidar")
    s.labels = rng.integers(0, 5, 500).astype(np.int32)
    t = LoadSemanticKITTIRange(proj_H=16, proj_W=128)
    s = t(s)
    assert s.data.shape == (16, 128, 5)
    assert s.proj_mask.sum() > 100
    assert s.proj_labels.shape == (16, 128)


def test_paconv(rng):
    import optax
    from paddle3d_tpu.models.classification import PAConv
    model = PAConv(num_classes=5, k=8, num_kernels=4, channels=(8, 16),
                   rngs=nnx.Rngs(0))
    pts = rng.normal(size=(2, 64, 3)).astype(np.float32)
    labels = np.array([1, 3], np.int32)
    batch = {"data": jnp.asarray(pts), "labels": jnp.asarray(labels)}
    optimizer = nnx.Optimizer(model, optax.adam(3e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        loss, grads = nnx.value_and_grad(
            lambda m: m.train_forward(batch)["loss"])(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(10)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    out = model.test_forward(batch)
    assert out["pred"].shape == (2,)
