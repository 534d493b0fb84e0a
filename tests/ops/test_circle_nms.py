import numpy as np
import jax.numpy as jnp


def _ref_circle_nms(centers, scores, min_radius, post_max):
    """Sequential reference."""
    order = np.argsort(-scores)
    kept = []
    for i in order:
        if not np.isfinite(scores[i]):
            continue
        ok = True
        for j in kept:
            if np.sum((centers[i] - centers[j]) ** 2) < min_radius ** 2:
                ok = False
                break
        if ok:
            kept.append(i)
    out = np.full((post_max,), -1, np.int64)
    for r, i in enumerate(kept[:post_max]):
        out[r] = i
    return out


def test_circle_nms_matches_sequential(rng):
    from paddle3d_tpu.ops.circle_nms import circle_nms
    for trial in range(5):
        k = 64
        centers = rng.uniform(-10, 10, (k, 2)).astype(np.float32)
        scores = rng.uniform(0, 1, (k,)).astype(np.float32)
        scores[rng.choice(k, 10, replace=False)] = -np.inf
        keep, _ = circle_nms(jnp.asarray(centers), jnp.asarray(scores),
                             min_radius=2.0, post_max_size=16)
        expect = _ref_circle_nms(centers, scores, 2.0, 16)
        np.testing.assert_array_equal(np.asarray(keep), expect)


def test_centerhead_circle_nms_path(rng):
    """CenterHead predict with nms type circle runs end-to-end."""
    from flax import nnx
    from paddle3d_tpu.models.detection import CenterHead
    head = CenterHead(
        in_channels=16, tasks=[dict(num_class=1, class_names=["car"])],
        weight=0.25, code_weights=[1.] * 8,
        common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2)),
        share_conv_channel=16, rngs=nnx.Rngs(0))
    feats = jnp.asarray(rng.normal(size=(1, 16, 16, 16)).astype(np.float32))
    preds = head(feats)
    test_cfg = dict(
        nms=dict(type="circle", min_radius=1.0, nms_pre_max_size=64,
                 nms_post_max_size=8, nms_iou_threshold=0.2),
        score_threshold=0.0, point_cloud_range=[-8., -8., -3., 8., 8., 3.],
        down_ratio=1, voxel_size=[1.0, 1.0, 6.0],
        post_center_limit_range=[-50., -50., -10., 50., 50., 10.])
    out = head.predict(preds, test_cfg)
    assert out["box3d_lidar"].shape[1] == 8
    assert np.isfinite(np.asarray(out["box3d_lidar"])).all()
