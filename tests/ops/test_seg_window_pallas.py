"""Pallas seg_window_max vs the XLA bounded window max (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _case(rng, b=2, n=1500, c=8, max_seg=40):
    keys = []
    for _ in range(b):
        ks, k = [], 0
        while len(ks) < n:
            ks.extend([k] * int(rng.integers(1, max_seg)))
            k += int(rng.integers(1, 9))
        keys.append(ks[:n])
    keys = jnp.asarray(np.array(keys, np.int32))
    vals = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    return vals, keys


def test_seg_window_max_matches_xla():
    from paddle3d_tpu.ops.pallas.seg_window import seg_window_max
    from paddle3d_tpu.ops.segmented import seg_window_max_bounded

    rng = np.random.default_rng(0)
    vals, keys = _case(rng)
    P = 20
    ref = jax.vmap(lambda v, k: seg_window_max_bounded(v, k, P))(vals, keys)
    out = seg_window_max(vals, keys, P, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_seg_window_max_with_masked_rows_and_ties():
    """Exact-zero ties (post-ReLU values) and -1e9 masked rows — the real
    pillar-pipeline distribution."""
    from paddle3d_tpu.ops.pallas.seg_window import seg_window_max
    from paddle3d_tpu.ops.segmented import seg_window_max_bounded

    rng = np.random.default_rng(1)
    vals, keys = _case(rng, n=1024, c=16)
    vals = jnp.maximum(vals, 0.)  # many exact-zero ties
    mask = jnp.asarray(rng.random((2, 1024, 1)) < 0.3)
    vals = jnp.where(mask, -1e9, vals)
    ref = jax.vmap(lambda v, k: seg_window_max_bounded(v, k, 16))(vals, keys)
    out = seg_window_max(vals, keys, 16, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_seg_window_max_grad():
    """VJP: gradient lands on exactly one argmax row per (row, channel),
    summing cotangents of every row it won."""
    from paddle3d_tpu.ops.pallas.seg_window import seg_window_max

    rng = np.random.default_rng(2)
    vals, keys = _case(rng, b=1, n=600, c=4, max_seg=12)
    P = 16

    def f(v):
        return jnp.sum(seg_window_max(v, keys, P, True) ** 2)

    g = jax.grad(f)(vals)
    # numeric check on a few coordinates
    eps = 1e-3
    v0 = np.asarray(vals)
    for (bi, ni, ci) in [(0, 5, 1), (0, 100, 2), (0, 599, 0)]:
        vp = v0.copy()
        vp[bi, ni, ci] += eps
        vm = v0.copy()
        vm[bi, ni, ci] -= eps
        num = (float(f(jnp.asarray(vp))) - float(f(jnp.asarray(vm)))) / (
            2 * eps)
        assert float(g[bi, ni, ci]) == pytest.approx(num, abs=2e-2)


def test_seg_window_max_bf16():
    from paddle3d_tpu.ops.pallas.seg_window import seg_window_max
    from paddle3d_tpu.ops.segmented import seg_window_max_bounded

    rng = np.random.default_rng(3)
    vals, keys = _case(rng, b=1, n=700, c=8)
    vb = vals.astype(jnp.bfloat16)
    ref = jax.vmap(lambda v, k: seg_window_max_bounded(v, k, 20))(vb, keys)
    out = seg_window_max(vb, keys, 20, True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0)
