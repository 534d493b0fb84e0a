import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

PC_RANGE = (0., -8., -2., 16., 8., 2.)
VOXEL = (0.5, 0.5, 4.0)


def build_tiny_centerpoint():
    from paddle3d_tpu.models.backbones import SecondBackbone
    from paddle3d_tpu.models.detection import CenterHead, CenterPoint
    from paddle3d_tpu.models.middle_encoders import PointPillarsScatter
    from paddle3d_tpu.models.necks import SecondFPN
    from paddle3d_tpu.models.voxel_encoders import PillarFeatureNet
    from paddle3d_tpu.models.voxelizers import HardVoxelizer

    rngs = nnx.Rngs(0)
    tasks = [
        dict(num_class=1, class_names=["Car"]),
        dict(num_class=1, class_names=["Pedestrian"]),
    ]
    test_cfg = dict(
        post_center_limit_range=[-10., -10., -10., 30., 10., 10.],
        nms=dict(nms_pre_max_size=128, nms_post_max_size=16,
                 nms_iou_threshold=0.1),
        score_threshold=0.1,
        point_cloud_range=list(PC_RANGE),
        down_ratio=2,
        voxel_size=list(VOXEL))
    return CenterPoint(
        voxelizer=HardVoxelizer(VOXEL, PC_RANGE, 8, [100, 120]),
        voxel_encoder=PillarFeatureNet(
            in_channels=4, feat_channels=(16,), max_num_points_in_voxel=8,
            voxel_size=VOXEL, point_cloud_range=PC_RANGE, legacy=False,
            rngs=rngs),
        middle_encoder=PointPillarsScatter(16, VOXEL, PC_RANGE),
        backbone=SecondBackbone(16, (16, 32), (1, 1), (2, 2), rngs=rngs),
        neck=SecondFPN((16, 32), (16, 16), (1, 2), rngs=rngs),
        bbox_head=CenterHead(
            in_channels=32, tasks=tasks, weight=0.25,
            code_weights=[1.] * 8,
            common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                              rot=(2, 2)),
            share_conv_channel=16, rngs=rngs),
        test_cfg=test_cfg,
        target_assign_cfg=dict(down_ratio=2, max_objs=16))


def make_batch(rng, b=2):
    pts = rng.uniform([0, -8, -2, 0], [16, 8, 2, 1],
                      (b, 256, 4)).astype(np.float32)
    gt = np.zeros((b, 4, 7), np.float32)
    gt[..., 0] = rng.uniform(3, 13, (b, 4))
    gt[..., 1] = rng.uniform(-6, 6, (b, 4))
    gt[..., 2] = -1.7
    gt[..., 3:6] = [1.6, 3.9, 1.56]
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (b, 4))
    labels = np.zeros((b, 4), np.int32)
    labels[:, 1] = 1       # one pedestrian per scene
    labels[:, -1] = -1     # padding row
    return {"data": jnp.asarray(pts), "gt_boxes": jnp.asarray(gt),
            "gt_labels": jnp.asarray(labels)}


def test_target_generator(rng):
    from paddle3d_tpu.models.detection.centerpoint import \
        CenterPointTargetGenerator
    gen = CenterPointTargetGenerator(
        tasks=[dict(num_class=1, class_names=["Car"]),
               dict(num_class=1, class_names=["Pedestrian"])],
        down_ratio=2, point_cloud_range=PC_RANGE, voxel_size=VOXEL,
        max_objs=8)
    batch = make_batch(rng, b=1)
    targets = gen(batch["gt_boxes"], batch["gt_labels"])
    assert len(targets) == 2
    hm, box_t, idx, mask, label = targets[0]
    assert hm.shape == (1, 16, 16, 1)
    # task 0 (Car) has 2 valid objects (labels 0 at slots 0, 2)
    assert int(mask.sum()) == 2
    assert float(hm.max()) == 1.0  # gaussian peak at center
    # the peak sits exactly at center_idx
    peak_pos = int(jnp.argmax(hm[0, :, :, 0]))
    assert peak_pos in [int(i) for i in np.asarray(idx[0])[np.asarray(mask[0])]]
    # task 1 (Pedestrian) has 1 valid object
    assert int(targets[1][3].sum()) == 1


def test_train_and_infer(rng):
    import optax
    model = build_tiny_centerpoint()
    batch = make_batch(rng, b=1)
    optimizer = nnx.Optimizer(model, optax.adam(3e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            return m.train_forward(batch)["loss"]
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(10)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    @nnx.jit
    def infer(model, pts):
        return model.test_forward({"data": pts})

    out = infer(model, batch["data"])
    assert out["box3d_lidar"].shape == (1, 32, 7)  # 2 tasks x 16
    assert out["scores"].shape == (1, 32)
    samples = model.postprocess_to_samples(
        {k: np.asarray(v) for k, v in out.items()},
        [{"path": "x", "id": 0}])
    assert samples[0].modality == "lidar"


def test_merged_head_matches_towers(rng):
    """Eval-mode merged conv path (one dense + one grouped conv) must
    reproduce the per-tower SeparateHead outputs exactly."""
    model = build_tiny_centerpoint()
    head = model.bbox_head
    # randomize BN running stats so the folded affine is non-trivial
    for th in head.task_heads:
        for name in th.head_names:
            bn = th.towers[name][0].bn
            bn.mean.value = jnp.asarray(
                rng.normal(0, 0.3, bn.mean.value.shape), jnp.float32)
            bn.var.value = jnp.asarray(
                rng.uniform(0.5, 2.0, bn.var.value.shape), jnp.float32)
    model.eval()
    assert head._mergeable()
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 32)), jnp.float32)
    shared = head.shared_conv(x)
    ref = [th(shared) for th in head.task_heads]
    merged = head._merged_call(shared)
    assert len(merged) == len(ref)
    for mt, rt in zip(merged, ref):
        assert set(mt) == set(rt)
        for k in rt:
            np.testing.assert_allclose(np.asarray(mt[k]), np.asarray(rt[k]),
                                       rtol=2e-5, atol=2e-5)
