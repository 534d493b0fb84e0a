import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx


def build_tiny_smoke(num_classes=1):
    from paddle3d_tpu.models.backbones.dla import DLA
    from paddle3d_tpu.models.detection.smoke import (SMOKE,
                                                     SMOKELossComputation,
                                                     SMOKEPredictor)
    rngs = nnx.Rngs(0)
    depth_ref = (20.0, 10.0)
    dim_ref = [[3.88, 1.63, 1.53]]
    backbone = DLA(levels=(1, 1, 1, 1, 1, 1), channels=(8, 8, 8, 16, 16, 16),
                   down_ratio=4, rngs=rngs)
    head = SMOKEPredictor(num_classes=num_classes,
                          reg_channels=(1, 2, 3, 2, 2), num_channels=16,
                          in_channels=8, rngs=rngs)
    loss = SMOKELossComputation(depth_ref, dim_ref, max_objs=8)
    return SMOKE(backbone, head, loss, depth_ref=depth_ref, dim_ref=dim_ref,
                 max_detection=8, det_threshold=0.2)


def make_mono_batch(rng, b=1, h=96, w=128, num_classes=1):
    from paddle3d_tpu.sample import Sample
    from paddle3d_tpu.transforms.target_generator import Gt2SmokeTarget
    from paddle3d_tpu.geometries import BBoxes3D

    gen = Gt2SmokeTarget(mode="train", num_classes=num_classes,
                         flip_prob=0.0, max_objs=8, input_size=(w, h),
                         output_stride=(4, 4))
    data, targets = [], []
    for i in range(b):
        s = Sample(path=None, modality="image")
        s.data = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        s.meta.camera_intrinsic = np.array(
            [[60., 0, w / 2], [0, 60., h / 2], [0, 0, 1]], np.float32)
        # one car 15m in front, slightly left
        s.bboxes_3d = np.array([[-1.0, 1.5, 15.0, 1.5, 1.6, 3.9, 0.3]],
                               np.float32)
        s.labels = np.array([0], np.int64)
        s = gen(s)
        data.append(s.data)
        targets.append(s.target)
    batch = {
        "data": jnp.asarray(np.stack(data)),
        "target": {k: jnp.asarray(np.stack([t[k] for t in targets]))
                   for k in targets[0]},
    }
    return batch


def test_smoke_target_and_train(rng):
    import optax
    model = build_tiny_smoke()
    batch = make_mono_batch(rng)
    assert float(batch["target"]["hm"].max()) == 1.0
    assert int(batch["target"]["reg_mask"].sum()) == 1

    optimizer = nnx.Optimizer(model, optax.adam(3e-3), wrt=nnx.Param)

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


def test_smoke_inference_shapes(rng):
    model = build_tiny_smoke()
    batch = make_mono_batch(rng)

    @nnx.jit
    def infer(model, batch):
        return model.test_forward(batch)

    out = infer(model, batch)
    assert out["box3d_cam"].shape == (1, 8, 7)
    assert out["scores"].shape == (1, 8)
    samples = model.postprocess_to_samples(
        {k: np.asarray(v) for k, v in out.items()}, [{"path": "x", "id": 0}])
    assert samples[0].frame == "camera"
