"""Query-denoising training (reference: cape_dn_head.py:47 — noisy GT
queries, attention masks, known-assignment dn loss split)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

PC_RANGE = (-10., -10., -3., 10., 10., 3.)


def test_dn_attn_mask_semantics():
    from paddle3d_tpu.models.heads.denoising import dn_attn_mask

    m = np.asarray(dn_attn_mask(num_query=4, groups=2, group_size=3))
    assert m.shape == (10, 10)
    # matching sees matching only
    assert m[:4, :4].all() and not m[:4, 4:].any()
    # group 0 (rows 4..6): sees matching + itself, not group 1
    assert m[4:7, :4].all() and m[4:7, 4:7].all()
    assert not m[4:7, 7:].any()
    # group 1 symmetric
    assert m[7:, 7:].all() and not m[7:, 4:7].any()


def test_build_dn_queries(rng):
    from paddle3d_tpu.models.heads.denoising import (DenoisingConfig,
                                                     build_dn_queries)

    gt = np.zeros((2, 3, 7), np.float32)
    gt[..., 0] = rng.uniform(-8, 8, (2, 3))
    gt[..., 1] = rng.uniform(-8, 8, (2, 3))
    gt[..., 2] = -1.0
    gt[..., 3:6] = [1.9, 4.6, 1.7]
    labels = np.array([[0, 1, -1], [2, -1, -1]], np.int32)
    cfg = DenoisingConfig(groups=2, box_noise_scale=0.3,
                          label_noise_ratio=0.0, negative=True)
    out = build_dn_queries(jax.random.key(0), jnp.asarray(gt),
                           jnp.asarray(labels), 3, PC_RANGE, cfg)
    qdn = 2 * 3 * 2
    assert out["ref"].shape == (2, qdn, 3)
    out = jax.device_get(out)
    # pad gt slots are invalid
    assert out["valid"].sum() == 2 * (2 + 1) * 2  # groups*2 reps per real gt
    # positives carry the true label (no label noise here), negatives = bg
    pos = out["pos"]
    assert np.all(out["labels"][pos] != 3)
    neg = out["valid"] & ~pos
    assert np.all(out["labels"][neg] == 3)
    # positive refs stay within ~box_noise_scale*dim/2 of the gt center
    pc = np.asarray(PC_RANGE)
    world = out["ref"] * (pc[3:] - pc[:3]) + pc[:3]
    gidx = out["gt_idx"]
    centers = np.take_along_axis(gt[..., :3], gidx[..., None], axis=1)
    d = np.abs(world - centers)
    assert np.all(d[pos] <= 0.31 * 4.6 / 2 + 1e-3)


def build_tiny_petr_dn():
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
    return PETR(backbone, neck, head,
                dn_config=dict(groups=2, box_noise_scale=0.3,
                               label_noise_ratio=0.1))


def make_mv_batch(rng, b=1, n_cam=2, h=32, w=48):
    imgs = rng.uniform(0, 1, (b, n_cam, h, w, 3)).astype(np.float32)
    mats = np.zeros((b, n_cam, 4, 4), np.float32)
    for c in range(n_cam):
        m = np.eye(4, dtype=np.float32)
        m[0, 2] = 1.0
        m[0, 0] = 0.0
        m[1, 0] = 8.0
        m[1, 3] = -4.0
        m[2, 1] = 4.0
        m[2, 3] = -2.0
        m[2, 2] = 0.0
        m[1, 1] = 0.0
        mats[:, c] = m
    gt = np.zeros((b, 3, 9), np.float32)
    gt[..., 0] = rng.uniform(-8, 8, (b, 3))
    gt[..., 1] = rng.uniform(-8, 8, (b, 3))
    gt[..., 2] = -1.5
    gt[..., 3:6] = [1.9, 4.6, 1.7]
    labels = np.array([[0, 1, -1]] * b, np.int32)
    return {"img": jnp.asarray(imgs), "img2lidars": jnp.asarray(mats),
            "gt_boxes": jnp.asarray(gt), "gt_labels": jnp.asarray(labels)}


def test_petr_dn_train_decreases(rng):
    import optax
    model = build_tiny_petr_dn()
    batch = make_mv_batch(rng)
    optimizer = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            losses = m.train_forward(batch)
            return losses["loss"], losses
        (loss, losses), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        optimizer.update(model, grads)
        return losses

    hist = [jax.device_get(step(model, optimizer, batch))
            for _ in range(10)]
    assert "loss_cls_dn" in hist[0] and "loss_bbox_dn" in hist[0]
    dn0 = hist[0]["loss_cls_dn"] + hist[0]["loss_bbox_dn"]
    dn9 = hist[-1]["loss_cls_dn"] + hist[-1]["loss_bbox_dn"]
    assert np.isfinite(dn0) and np.isfinite(dn9)
    assert dn9 < dn0, (dn0, dn9)
    # eval path is unaffected by DN (matching queries only: topk over
    # num_query * num_classes = 72 slots)
    out = model.test_forward({k: batch[k] for k in ("img", "img2lidars")})
    assert out["scores"].shape[1] == 24 * 3


def test_cape_dn_with_lidar2cams(rng):
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
        num_classes=3, in_channels=16, embed_dims=32, num_query=16,
        num_heads=4, num_layers=2, depth_num=8,
        position_range=[-12., -12., -4., 12., 12., 4.],
        pc_range=list(PC_RANGE), rngs=rngs)
    model = PETR(backbone, neck, head,
                 dn_config=dict(groups=2, box_noise_scale=0.3))
    batch = make_mv_batch(rng)
    # lidar->cam: trivially the inverse of img2lidar without intrinsics
    batch["lidar2cams"] = jnp.asarray(
        np.linalg.inv(np.asarray(batch["img2lidars"])))

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            losses = m.train_forward(batch)
            return losses["loss"], losses
        (loss, losses), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        optimizer.update(model, grads)
        return losses

    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)
    losses = jax.device_get(step(model, optimizer, batch))
    assert "loss_cls_dn" in losses
    for v in losses.values():
        assert np.isfinite(v)
