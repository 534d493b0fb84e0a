import numpy as np
import jax.numpy as jnp

from paddle3d_tpu.ops import boxes_iou3d, boxes_iou_bev, nms_bev


def _aa_iou_bev(a, b):
    """Axis-aligned IoU reference for yaw==0 boxes [*,5]=(cx,cy,dx,dy,yaw)."""
    ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2
    ax2, ay2 = a[0] + a[2] / 2, a[1] + a[3] / 2
    bx1, by1 = b[0] - b[2] / 2, b[1] - b[3] / 2
    bx2, by2 = b[0] + b[2] / 2, b[1] + b[3] / 2
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union


def test_iou_bev_axis_aligned(rng):
    a = rng.uniform(0, 10, (12, 5)).astype(np.float32)
    b = rng.uniform(0, 10, (9, 5)).astype(np.float32)
    a[:, 2:4] = rng.uniform(1, 4, (12, 2))
    b[:, 2:4] = rng.uniform(1, 4, (9, 2))
    a[:, 4] = 0
    b[:, 4] = 0
    iou = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    for i in range(12):
        for j in range(9):
            np.testing.assert_allclose(
                iou[i, j], _aa_iou_bev(a[i], b[j]), atol=1e-5)


def test_iou_bev_rotation_invariance(rng):
    # IoU of a pair is invariant to rotating both boxes about the origin
    a = np.array([[1.0, 2.0, 3.0, 1.5, 0.3]], np.float32)
    b = np.array([[1.5, 2.2, 2.0, 2.0, -0.4]], np.float32)
    base = float(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b))[0, 0])
    for theta in [0.3, 1.1, 2.7]:
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, -s], [s, c]], np.float32)

        def rot_box(x):
            y = x.copy()
            y[:, :2] = x[:, :2] @ rot.T
            y[:, 4] += theta
            return y

        got = float(
            boxes_iou_bev(jnp.asarray(rot_box(a)), jnp.asarray(rot_box(b)))[0,
                                                                            0])
        np.testing.assert_allclose(got, base, atol=1e-4)


def test_iou_bev_identical_and_disjoint():
    a = np.array([[0., 0., 2., 4., 0.7]], np.float32)
    b = np.array([[0., 0., 2., 4., 0.7], [100., 100., 2., 2., 0.2]],
                 np.float32)
    iou = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(iou[0, 1], 0.0, atol=1e-6)


def test_iou3d_z_overlap():
    a = np.array([[0., 0., 0., 2., 2., 2., 0.]], np.float32)
    b = np.array([[0., 0., 1., 2., 2., 2., 0.]], np.float32)  # half z overlap
    iou = float(boxes_iou3d(jnp.asarray(a), jnp.asarray(b))[0, 0])
    # inter = 2*2*1 = 4, union = 8 + 8 - 4 = 12
    np.testing.assert_allclose(iou, 4 / 12, atol=1e-5)


def test_nms_bev_greedy():
    boxes = np.array([
        [0., 0., 4., 4., 0.],    # score .9  keep
        [0.5, 0., 4., 4., 0.],   # overlaps #0 heavily -> suppressed
        [20., 0., 4., 4., 0.],   # far away  keep
        [20.2, 0., 4., 4., 0.],  # overlaps #2 -> suppressed
        [40., 0., 4., 4., 0.],   # keep
    ], np.float32)
    scores = np.array([.9, .8, .85, .7, .6], np.float32)
    keep, count = nms_bev(
        jnp.asarray(boxes), jnp.asarray(scores), iou_threshold=0.5,
        pre_max_size=5, post_max_size=5)
    keep = np.asarray(keep)
    assert int(count) == 3
    assert set(keep[keep >= 0].tolist()) == {0, 2, 4}


def test_nms_bev_padding_rows():
    boxes = np.zeros((8, 5), np.float32)
    boxes[0] = [0., 0., 2., 2., 0.]
    scores = np.full((8,), -np.inf, np.float32)
    scores[0] = 0.5
    keep, count = nms_bev(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, pre_max_size=8,
        post_max_size=4)
    assert int(count) == 1
    assert int(np.asarray(keep)[0]) == 0


def test_suppress_blocked_matches_direct():
    """The kept-buffer blocked greedy path (K >= 512) must produce exactly
    the one-shot K^2 fixpoint's keep_idx for clustered candidates."""
    from paddle3d_tpu.ops.iou3d_nms import (
        _compact_keep, _fixpoint_alive, _pairwise_intersection_area_green,
        _suppress_blocked)
    rng = np.random.default_rng(7)
    for thr, n_clusters in [(0.2, 40), (0.7, 12), (0.1, 200)]:
        K = 1000
        centers = rng.uniform(-50, 50, (n_clusters, 2))
        which = rng.integers(0, n_clusters, K)
        xy = centers[which] + rng.normal(0, 1.0, (K, 2))
        wh = rng.uniform(1, 5, (K, 2))
        yaw = rng.uniform(-np.pi, np.pi, K)
        b5 = jnp.asarray(np.concatenate(
            [xy, wh, yaw[:, None]], 1).astype(np.float32))
        valid = jnp.asarray(rng.uniform(size=K) > 0.2)

        _, ki_blocked = _suppress_blocked(b5, valid, thr, 83)

        inter = _pairwise_intersection_area_green(b5, b5)
        area = b5[:, 2] * b5[:, 3]
        union = jnp.maximum(area[:, None] + area[None, :] - inter, 1e-6)
        idx = jnp.arange(K)
        sup = ((inter > thr * union) & (idx[:, None] < idx[None, :])
               & valid[:, None] & valid[None, :])
        ki_direct = _compact_keep(_fixpoint_alive(sup, valid), 83)
        np.testing.assert_array_equal(
            np.asarray(ki_blocked), np.asarray(ki_direct))
