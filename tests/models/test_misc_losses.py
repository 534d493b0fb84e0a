import numpy as np
import jax.numpy as jnp


def test_focal_and_ce_losses(rng):
    from paddle3d_tpu.models.losses import FocalLoss, WeightedCrossEntropyLoss
    logits = jnp.asarray(rng.normal(size=(4, 10, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(-1, 3, (4, 10)).astype(np.int32))
    fl = FocalLoss()(logits, labels)
    ce = WeightedCrossEntropyLoss()(logits, labels)
    assert np.isfinite(float(fl)) and float(fl) > 0
    assert np.isfinite(float(ce)) and float(ce) > 0
    # all-ignore labels give a finite (zero-ish) loss, not NaN
    fl0 = FocalLoss()(logits, jnp.full((4, 10), -1, jnp.int32))
    assert np.isfinite(float(fl0))


def test_giou_loss_perfect_box_is_zero():
    from paddle3d_tpu.models.losses import GIoULoss, IoULoss, giou_2d
    box = jnp.asarray([[0., 0., 4., 2.]])
    assert abs(float(giou_2d(box, box)[0]) - 1.0) < 1e-5
    assert float(GIoULoss()(box, box)) < 1e-5
    # disjoint boxes: giou < 0
    other = jnp.asarray([[10., 10., 12., 12.]])
    assert float(giou_2d(box, other)[0]) < 0


def test_disentangled_box3d_loss(rng):
    import jax
    from paddle3d_tpu.models.losses import DisentangledBox3DLoss
    gt = jnp.asarray(rng.uniform(1, 5, (6, 7)).astype(np.float32))
    loss = DisentangledBox3DLoss()
    assert float(loss(gt, gt)) < 1e-6
    pred = gt + 0.5
    val = float(loss(pred, gt))
    assert np.isfinite(val) and val > 0
    g = jax.grad(lambda p: loss(p, gt))(pred)
    assert np.isfinite(np.asarray(g)).all()
