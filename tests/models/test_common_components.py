"""Config-surface components added for reference name parity: mmdet-style
losses, bbox coders, match costs, samplers, 3D positional encodings,
transform combos, and the alias registry."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def test_losses_numerics(rng):
    from paddle3d_tpu.models.losses import (CrossEntropyLoss,
                                            GaussianFocalLoss, SmoothL1Loss,
                                            WeightedFocalLoss,
                                            WeightedL1Loss,
                                            WeightedSmoothL1Loss)
    pred = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, 4, 6))

    ce = CrossEntropyLoss()(pred, tgt)
    want = -np.take_along_axis(
        np.asarray(jax.nn.log_softmax(pred, -1)), np.asarray(tgt)[:, None],
        1).mean()
    np.testing.assert_allclose(float(ce), want, rtol=1e-5)

    sl = SmoothL1Loss(beta=1.0)(jnp.zeros(4), jnp.asarray([0.5, 2., -3., 0.]))
    np.testing.assert_allclose(float(sl),
                               np.mean([0.125, 1.5, 2.5, 0.]), rtol=1e-6)

    fl = WeightedFocalLoss()(pred, tgt)
    assert np.isfinite(float(fl)) and float(fl) > 0

    hm = jnp.asarray(rng.uniform(0.01, 0.99, (8, 8, 2)).astype(np.float32))
    tgt_hm = jnp.zeros((8, 8, 2)).at[4, 4, 0].set(1.0)
    gf = GaussianFocalLoss()(hm, tgt_hm)
    assert np.isfinite(float(gf)) and float(gf) > 0

    d = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    wl1 = WeightedL1Loss()(d, jnp.zeros_like(d))
    np.testing.assert_allclose(np.asarray(wl1), np.abs(np.asarray(d)),
                               rtol=1e-6)
    ws = WeightedSmoothL1Loss(beta=1.0, code_weights=[2.0] * 7)(
        d, jnp.zeros_like(d))
    assert ws.shape == d.shape


def test_bbox_coders_roundtrip(rng):
    from paddle3d_tpu.models.heads import (CenterPointBBoxCoder,
                                           DeltaXYZWLHRBBoxCoder,
                                           NMSFreeCoder)
    coder = DeltaXYZWLHRBBoxCoder()
    anchors = jnp.asarray(
        np.stack([rng.uniform(-10, 10, 12), rng.uniform(-10, 10, 12),
                  rng.uniform(-2, 0, 12), rng.uniform(1, 3, 12),
                  rng.uniform(1, 3, 12), rng.uniform(1, 3, 12),
                  rng.uniform(-3, 3, 12)], 1).astype(np.float32))
    gt = anchors + jnp.asarray(rng.normal(size=(12, 7)) * 0.2,
                               jnp.float32)
    dec = coder.decode(anchors, coder.encode(anchors, gt))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gt), atol=1e-4)

    nf = NMSFreeCoder(max_num=5, num_classes=3,
                      post_center_range=[-60, -60, -10, 60, 60, 10])
    cls = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    box = jnp.asarray(rng.normal(size=(8, 10)).astype(np.float32) * 0.3)
    out = nf.decode_single(cls, box)
    assert out["bboxes"].shape == (5, 9) and out["scores"].shape == (5,)

    cp = CenterPointBBoxCoder(pc_range=[-51.2, -51.2, -5, 51.2, 51.2, 3],
                              voxel_size=[0.2, 0.2, 8], out_size_factor=4,
                              max_num=6, score_threshold=0.0)
    hm = jnp.asarray(rng.uniform(0, 1, (16, 16, 2)).astype(np.float32))
    z = lambda c: jnp.asarray(  # noqa: E731
        rng.normal(size=(16, 16, c)).astype(np.float32) * 0.1)
    out = cp.decode_single(hm, z(2), z(1), z(3), z(2), z(2))
    assert out["bboxes"].shape == (6, 9)
    # top peak decodes to the argmax cell's neighborhood
    flat = np.asarray(hm).transpose(2, 0, 1).reshape(-1)
    assert float(out["scores"][0]) == flat.max()


def test_match_costs_and_sampler(rng):
    from paddle3d_tpu.models.heads import (BBoxL1Cost, ClassificationCost,
                                           IoUCost, RandomSampler)
    cls = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    labels = jnp.asarray([0, 2, 1])
    c = ClassificationCost()(cls, labels)
    assert c.shape == (6, 3) and np.all(np.asarray(c) <= 0)

    b = jnp.asarray(rng.uniform(0, 1, (4, 4)).astype(np.float32))
    assert BBoxL1Cost()(b, b).shape == (4, 4)
    np.testing.assert_allclose(np.diag(np.asarray(BBoxL1Cost()(b, b))), 0,
                               atol=1e-6)

    boxes = jnp.asarray([[0, 0, 2, 2], [10, 10, 12, 12]], jnp.float32)
    iou_c = np.asarray(IoUCost(iou_mode="iou")(boxes, boxes))
    np.testing.assert_allclose(np.diag(iou_c), -1.0, atol=1e-6)

    assigned = jnp.asarray(rng.integers(-1, 5, 256))
    pos, neg = RandomSampler(num=64, pos_fraction=0.25).sample(
        assigned, jax.random.key(0))
    n_pos = int(jnp.sum(pos))
    assert n_pos <= 16
    assert int(jnp.sum(neg)) <= 64
    assert not bool(jnp.any(pos & (assigned <= 0)))
    assert not bool(jnp.any(neg & (assigned != 0)))


def test_positional_encodings_3d():
    from paddle3d_tpu.models.transformers.positional_encoding import (
        LearnedPositionalEncoding3D, SinePositionalEncoding3D)
    pe = SinePositionalEncoding3D(num_feats=32)(6, 8, 10)
    assert pe.shape == (6, 8, 10, 96)
    le = LearnedPositionalEncoding3D(num_feats=16, row_num_embed=8,
                                     col_num_embed=10, cam_num_embed=6,
                                     rngs=nnx.Rngs(0))(6, 8, 10)
    assert le.shape == (6, 8, 10, 48)


def test_alias_registry_resolves():
    import paddle3d_tpu  # noqa: F401  (registers everything)
    from paddle3d_tpu.apis import manager
    from paddle3d_tpu.models import detection

    assert manager.MODELS.components_dict["Petr3D"] is detection.PETR
    assert manager.MODELS.components_dict["BEVDet4D"] is detection.BEVDet
    assert "VoxelRCNNHead" in manager.HEADS.components_dict
    assert "PointShuffle" in manager.TRANSFORMS.components_dict
    assert "SACRangeNet53" in manager.BACKBONES.components_dict


def test_combined_transforms(rng):
    import paddle3d_tpu  # noqa: F401
    from paddle3d_tpu.apis import manager
    from paddle3d_tpu.geometries import BBoxes3D, CoordMode, PointCloud
    from paddle3d_tpu.sample import Sample

    s = Sample(path=None, modality="lidar")
    s.data = PointCloud(rng.normal(size=(100, 4)).astype(np.float32))
    s.bboxes_3d = BBoxes3D(
        rng.normal(size=(3, 7)).astype(np.float32), origin=[.5, .5, 0],
        coordmode=CoordMode.KittiLidar, rot_axis=2)
    t1 = manager.TRANSFORMS.components_dict["GlobalRotScaleTrans"](
        rot_range=[-0.3, 0.3], scale_ratio_range=[0.9, 1.1],
        translation_std=[0.1, 0.1, 0.1])
    t2 = manager.TRANSFORMS.components_dict["RandomFlip3D"](
        flip_ratio_bev_horizontal=1.0, flip_ratio_bev_vertical=1.0)
    out = t2(t1(s))
    assert out.data.shape == (100, 4)
    assert np.isfinite(np.asarray(out.bboxes_3d)).all()


def test_random_sampler_edge_cases(rng):
    import jax
    from paddle3d_tpu.models.heads import RandomSampler

    assigned = jnp.asarray(rng.integers(-1, 5, 256))
    # zero positive budget must not crash and selects no positives
    pos, neg = RandomSampler(num=64, pos_fraction=0.01).sample(
        assigned, jax.random.key(0))
    assert int(jnp.sum(pos)) == 0
    assert int(jnp.sum(neg)) <= 64
    # neg_pos_ub caps negatives at ub x positives
    pos, neg = RandomSampler(num=64, pos_fraction=0.25, neg_pos_ub=2).sample(
        assigned, jax.random.key(1))
    n_pos = int(jnp.sum(pos))
    assert n_pos > 0
    assert int(jnp.sum(neg)) <= 2 * n_pos


def test_random_flip3d_horizontal_flips_y(rng):
    """Reference RandomFlip3D 'horizontal' negates Y (bevf_transforms.py:919)."""
    import paddle3d_tpu  # noqa: F401
    from paddle3d_tpu.apis import manager
    from paddle3d_tpu.geometries import PointCloud
    from paddle3d_tpu.sample import Sample

    s = Sample(path=None, modality="lidar")
    pts = rng.normal(size=(16, 4)).astype(np.float32)
    s.data = PointCloud(pts.copy())
    t = manager.TRANSFORMS.components_dict["RandomFlip3D"](
        flip_ratio_bev_horizontal=1.0, flip_ratio_bev_vertical=0.0)
    out = np.asarray(t(s).data)
    np.testing.assert_allclose(out[:, 1], -pts[:, 1], atol=1e-6)
    np.testing.assert_allclose(out[:, 0], pts[:, 0], atol=1e-6)


def test_fpn_top_block(rng):
    from paddle3d_tpu.models.necks.fpn import FPN, LastLevelP6P7

    fpn = FPN(in_channels=[32, 64], out_channels=16, num_outs=2,
              top_block=LastLevelP6P7(16, 16, in_feature="p5",
                                      rngs=nnx.Rngs(0)),
              rngs=nnx.Rngs(0))
    ins = [jnp.asarray(rng.normal(size=(1, 16, 16, 32)).astype(np.float32)),
           jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))]
    outs = fpn(ins)
    assert len(outs) == 4                       # p3, p4 (+ p6, p7)
    assert outs[2].shape == (1, 4, 4, 16)
    assert outs[3].shape == (1, 2, 2, 16)
