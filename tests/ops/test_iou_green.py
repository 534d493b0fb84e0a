"""Green's-theorem segment-sum intersection (ops.iou3d_nms.
_pairwise_intersection_area_green) vs the slot-list clip, including the
coincident-edge-line configurations where naive boundary decomposition
double-counts (the ½-weight on-face rule)."""
import jax
import jax.numpy as jnp
import numpy as np

from paddle3d_tpu.ops.box_ops import boxes_to_corners_bev
from paddle3d_tpu.ops.iou3d_nms import (_pairwise_intersection_area,
                                        _pairwise_intersection_area_green)


def test_green_matches_clip_random(rng):
    n = 120
    b = np.stack([
        rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
        rng.uniform(0.5, 6, n), rng.uniform(0.5, 6, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)
    ca = boxes_to_corners_bev(jnp.asarray(b)).astype(jnp.float32)
    ref = np.asarray(_pairwise_intersection_area(ca, ca))
    out = np.asarray(jax.jit(_pairwise_intersection_area_green)(
        jnp.asarray(b), jnp.asarray(b)))
    off = np.abs(ref - out)
    np.fill_diagonal(off, 0)  # the clip's own diagonal is exact by luck
    assert off.max() < 2e-3
    # identical-box diagonal must be the box area (the clip gets this too;
    # the green path needs the ½-weight rule for it)
    np.testing.assert_allclose(np.diag(out), b[:, 2] * b[:, 3], atol=1e-3)


def test_green_coincident_line_cases():
    """Hand configurations with shared edge LINES, jitted (FMA paths).

    These are exactly the cases where a naive ∂A∩B + ∂B∩A decomposition
    double-counts or mis-cancels — and they are translation-amplified, so
    place them away from the origin."""
    cases = np.array([
        [20.0, 0., 4., 4., 0.],   # 0
        [20.2, 0., 4., 4., 0.],   # 1: overlaps 0, shares top/bottom lines
        [24.0, 0., 4., 4., 0.],   # 2: abuts 0 exactly (zero overlap)
        [20.0, 0., 2., 4., 0.],   # 3: inside 0, shares top/bottom lines
        [20.0, 0., 4., 4., 0.],   # 4: identical to 0
        [30.0, -20., 4., 2., 0.7],  # 5: rotated
        [30.0, -20., 4., 2., 0.7],  # 6: identical rotated, offset origin
    ], np.float32)
    g = np.asarray(jax.jit(_pairwise_intersection_area_green)(
        jnp.asarray(cases), jnp.asarray(cases)))
    expect = {
        (0, 1): 3.8 * 4, (1, 0): 3.8 * 4,
        (0, 2): 0.0, (2, 0): 0.0,
        (0, 3): 2 * 4, (3, 0): 2 * 4,
        (0, 4): 16.0, (4, 0): 16.0,
        (5, 6): 8.0, (6, 5): 8.0,
    }
    for (i, j), e in expect.items():
        np.testing.assert_allclose(g[i, j], e, atol=1e-3,
                                   err_msg="pair (%d, %d)" % (i, j))
