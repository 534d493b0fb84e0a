import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx


def build_tiny_model():
    from paddle3d_tpu.models.backbones import SecondBackbone
    from paddle3d_tpu.models.detection import PointPillars
    from paddle3d_tpu.models.detection.pointpillars import (PointPillarsLoss,
                                                            SSDHead)
    from paddle3d_tpu.models.losses import (SigmoidFocalClassificationLoss,
                                            WeightedSmoothL1RegressionLoss,
                                            WeightedSoftmaxClassificationLoss)
    from paddle3d_tpu.models.middle_encoders import PointPillarsScatter
    from paddle3d_tpu.models.necks import SecondFPN
    from paddle3d_tpu.models.voxel_encoders import PillarFeatureNet
    from paddle3d_tpu.models.voxelizers import HardVoxelizer

    voxel_size = (1.0, 1.0, 4.0)
    pc_range = (0., -8., -2., 16., 8., 2.)  # grid 16 x 16
    rngs = nnx.Rngs(0)
    model = PointPillars(
        voxelizer=HardVoxelizer(voxel_size, pc_range, 8, [100, 120]),
        pillar_encoder=PillarFeatureNet(
            in_channels=4, feat_channels=(16,), max_num_points_in_voxel=8,
            voxel_size=voxel_size, point_cloud_range=pc_range, rngs=rngs),
        middle_encoder=PointPillarsScatter(16, voxel_size, pc_range),
        backbone=SecondBackbone(16, (16, 16, 32), (1, 1, 1), (2, 2, 2),
                                rngs=rngs),
        neck=SecondFPN((16, 16, 32), (16, 16, 16), (1, 2, 4), rngs=rngs),
        head=SSDHead(num_classes=1, feature_channels=48, num_anchor_per_loc=2,
                     nms_post_max_size=10, rngs=rngs),
        loss=PointPillarsLoss(
            num_classes=1,
            classification_loss=SigmoidFocalClassificationLoss(),
            regression_loss=WeightedSmoothL1RegressionLoss(),
            direction_loss=WeightedSoftmaxClassificationLoss()),
        anchor_configs=[dict(
            sizes=[1.6, 3.9, 1.56],
            anchor_strides=[2.0, 2.0, 1.0],
            anchor_offsets=[1.0, -7.0, -1.78],
            rotations=[0., 1.5707963],
            matched_threshold=0.6,
            unmatched_threshold=0.45)],
        anchor_area_threshold=1)
    return model


def make_batch(rng, batch_size=2, num_points=256, num_gt=5):
    pts = rng.uniform([0, -8, -2, 0], [16, 8, 2, 1],
                      size=(batch_size, num_points, 4)).astype(np.float32)
    gt = np.zeros((batch_size, num_gt, 7), np.float32)
    gt[..., 0] = rng.uniform(2, 14, (batch_size, num_gt))
    gt[..., 1] = rng.uniform(-6, 6, (batch_size, num_gt))
    gt[..., 2] = -1.78
    gt[..., 3:6] = [1.6, 3.9, 1.56]
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (batch_size, num_gt))
    labels = np.zeros((batch_size, num_gt), np.int64)
    labels[:, -1] = -1  # one padding row
    return {
        "data": jnp.asarray(pts),
        "gt_boxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(labels),
    }


def test_train_forward_and_grads(rng):
    model = build_tiny_model()
    batch = make_batch(rng)

    graphdef, state = nnx.split(model)

    def loss_fn(state, batch):
        m = nnx.merge(graphdef, state)
        losses = m.train_forward(batch)
        _, new_state = nnx.split(m)
        return losses["loss"], (losses, new_state)

    (loss, (losses, _)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state, batch)
    assert np.isfinite(float(loss))
    assert {"loss", "loss_cls", "loss_reg", "loss_dir"} <= set(losses)
    # at least one parameter grad must be nonzero
    leaves = jax.tree.leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_test_forward_shapes(rng):
    model = build_tiny_model()
    batch = make_batch(rng)
    graphdef, state = nnx.split(model)

    @jax.jit
    def infer(state, points):
        m = nnx.merge(graphdef, state)
        return m.test_forward({"data": points})

    out = infer(state, batch["data"])
    assert out["box3d_lidar"].shape == (2, 10, 7)
    assert out["scores"].shape == (2, 10)
    assert out["label_preds"].shape == (2, 10)
    # padding rows are -1
    scores = np.asarray(out["scores"])
    assert np.all((scores >= 0) | (scores == -1))


def test_overfit_tiny_batch(rng):
    """One fixed batch, a few adam steps -> loss decreases."""
    import optax
    model = build_tiny_model()
    batch = make_batch(rng, batch_size=1, num_points=128, num_gt=3)
    optimizer = nnx.Optimizer(model, optax.adam(3e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            return m.train_forward(batch)["loss"]

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    losses = []
    for _ in range(8):
        losses.append(float(step(model, optimizer, batch)))
    assert losses[-1] < losses[0]


def test_fused_path_matches_buffer_path(rng=np.random.default_rng(3)):
    """The fused points->canvas pipeline (ops/pillar_ops.py) must reproduce
    the buffer pipeline (voxelize -> PFN -> scatter) exactly in eval mode."""
    model = build_tiny_model()
    model.eval()
    batch = make_batch(rng)
    pts = jnp.asarray(batch["data"])
    assert model._can_fuse()
    f_fused, m_fused = model._extract_feats_fused(pts, training=False)
    model._can_fuse = lambda: False
    f_buf, m_buf = model._extract_feats(pts, training=False)
    np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_buf),
                               rtol=1e-5, atol=1e-5)
    assert bool(jnp.all(m_fused == m_buf))
