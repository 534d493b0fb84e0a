import jax.numpy as jnp
import numpy as np
from flax import nnx

from tests.models.test_bevdet import make_bev_batch


def build_tiny_rtebev(num_adj=1):
    from paddle3d_tpu.models.backbones import CustomResNet, ResNet
    from paddle3d_tpu.models.detection import RTEBev
    from paddle3d_tpu.models.heads.rtebev_head import RTEBevHead
    from paddle3d_tpu.models.necks import FPN, FPN_LSS
    from paddle3d_tpu.models.transformers.bevdet_transformer import \
        MSLSSViewTransformerBEVDepth

    rngs = nnx.Rngs(0)
    grid = dict(x=[-8., 8., 0.5], y=[-8., 8., 0.5], z=[-3., 3., 6.],
                depth=[1., 9., 1.])
    vt = MSLSSViewTransformerBEVDepth(
        grid, input_size=(64, 96), downsample=8, in_channels=16,
        out_channels=16, loss_depth_weight=1.0,
        depthnet_cfg=dict(use_sppf=True), rngs=rngs)
    head = RTEBevHead(
        num_classes=1, in_channels=16, embed_dims=32, num_query=24,
        num_queries_one2one=8, k_one2many=2, num_layers=2, num_heads=2,
        feedforward_channels=32,
        pc_range=[-8., -8., -3., 8., 8., 3.], code_size=8,
        code_weights=[1.0] * 8, rngs=rngs)
    backbone = ResNet(depth=18, base_channels=8, out_indices=(1, 2, 3),
                      rngs=rngs)
    neck = FPN(in_channels=[16, 32, 64], out_channels=16, num_outs=3,
               rngs=rngs)
    return RTEBev(
        img_backbone=backbone,
        img_neck=neck,
        img_view_transformer=vt,
        img_bev_encoder_backbone=CustomResNet(
            16 * (num_adj + 1), num_layer=(1, 1), num_channels=(16, 32),
            stride=(1, 2), rngs=rngs),
        img_bev_encoder_neck=FPN_LSS(16 + 32, 16, rngs=rngs),
        pts_bbox_head=head,
        num_adj=num_adj,
        use_depth=True,
        use_ms_depth=True,
        test_cfg=dict(score_threshold=0.0))


def make_rtebev_batch(rng, b=1, n=2, num_adj=1):
    batch = make_bev_batch(rng, b, n)
    # adjacent frames (stacked on a frame axis) + per-frame matrices
    batch["img_adj"] = jnp.asarray(
        rng.uniform(0, 1, (b, num_adj, n, 64, 96, 3)).astype(np.float32))
    eye = np.broadcast_to(np.eye(3, dtype=np.float32),
                          (b, num_adj, n, 3, 3)).copy()
    batch["rots_adj"] = jnp.asarray(eye)
    batch["trans_adj"] = jnp.asarray(
        np.zeros((b, num_adj, n, 3), np.float32))
    # sparse LiDAR depth map at input resolution (0 = no return)
    depth = np.zeros((b, n, 64, 96), np.float32)
    depth[:, :, ::7, ::11] = rng.uniform(1.5, 8.5,
                                         depth[:, :, ::7, ::11].shape)
    batch["gt_depth"] = jnp.asarray(depth)
    return batch


def test_rtebev_train_and_infer(rng):
    import optax
    model = build_tiny_rtebev()
    batch = make_rtebev_batch(rng)
    optimizer = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

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

    model.eval()
    out = model.test_forward(batch)
    # NMS-free decode caps at Q1*C = 8 candidates
    assert out["box3d_lidar"].shape == (1, 8, 7)
    assert out["scores"].shape == (1, 8)


def test_rtebev_hybrid_branch_losses(rng):
    """one2many supervision must produce its own loss terms and the
    one2many queries must not leak into prediction."""
    model = build_tiny_rtebev()
    model.train()
    batch = make_rtebev_batch(rng)
    losses = model.train_forward(batch)
    assert "loss_cls_one2many" in losses and "loss_bbox_one2many" in losses
    assert "loss_depth" in losses
    assert np.isfinite(float(losses["loss"]))

    # eval path runs only the one2one queries
    feats, _ = model.extract_feat(batch)
    all_cls, _ = model.bbox_head(feats, training=False)
    assert all_cls.shape[2] == model.bbox_head.num_queries_one2one


def test_rtebev_first_frame_fallback(rng):
    """Without img_adj the model must pad history with the key frame."""
    model = build_tiny_rtebev()
    model.eval()
    batch = make_rtebev_batch(rng)
    for k in ("img_adj", "rots_adj", "trans_adj"):
        del batch[k]
    out = model.test_forward(batch)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_rtebev_cached_history_bev(rng):
    """Deploy protocol: precomputed adjacent BEVs via `bev_adj` replace the
    adjacent-frame image encode (reference feeds feat_prev as an engine
    input, deploy/rtebev/python/infer_mf_paddletrt.py:216-264)."""
    model = build_tiny_rtebev()
    model.eval()
    batch = make_rtebev_batch(rng)
    for k in ("img_adj", "rots_adj", "trans_adj"):
        del batch[k]
    gx = int(model.img_view_transformer.grid_size[0])
    gy = int(model.img_view_transformer.grid_size[1])
    c = model.img_view_transformer.out_channels
    batch["bev_adj"] = jnp.asarray(
        rng.standard_normal((1, gy, gx, c)), jnp.float32)
    out = model.test_forward(batch)
    assert np.isfinite(np.asarray(out["scores"])).all()
    # the same history as a 5-D [B, F, gy, gx, C] stack is accepted too
    batch["bev_adj"] = batch["bev_adj"][:, None]
    out2 = model.test_forward(batch)
    np.testing.assert_allclose(np.asarray(out["scores"]),
                               np.asarray(out2["scores"]), rtol=1e-5)
