"""Opt-in ON-CHIP (non-interpret) kernel regression tests.

CI runs the suite on the forced-CPU backend where every Pallas kernel is
exercised in interpret mode only — Mosaic compile-time behavior (VMEM
overflow, tiling regressions at production shapes) is invisible there. This
module compiles each production kernel at one production-like shape on the
real chip and checks parity against the XLA reference path:

    P3D_ON_CHIP=1 python -m pytest -m tpu tests/ops/test_onchip_tpu.py -q

Run it before every BENCH capture (VERDICT r3 item 8). Shapes are the
bench shapes scaled to keep the whole module under a few minutes of
compile+run on the v5e.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="needs the real TPU backend "
                              "(P3D_ON_CHIP=1 pytest -m tpu)"),
]


@pytest.fixture(scope="module", autouse=True)
def _compile_cache():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def test_sorted_scatter_production_shape():
    """Dense nuScenes shape (8x250k -> 512^2 x 64 bf16), cell-major v3."""
    from paddle3d_tpu.ops.pallas.sorted_scatter import (
        _sorted_segment_sum_xla, sorted_segment_sum_cm)
    rng = np.random.default_rng(0)
    b, n, c, cells = 2, 250000, 64, 512 * 512
    keys = np.sort(rng.integers(0, cells, size=(b, n)).astype(np.int32), -1)
    rows = rng.standard_normal((b, n, c)).astype(np.float32)
    rows_j = jnp.asarray(rows, jnp.bfloat16)
    keys_j = jnp.asarray(keys)
    out = sorted_segment_sum_cm(keys_j, jnp.swapaxes(rows_j, 1, 2), cells)
    ref = _sorted_segment_sum_xla(keys_j, rows_j, cells)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-1)


def test_sparse_conv_packed_production_shape():
    """centerpoint_voxels stem shape (V=40k, cin=16, 1440^2x41 grid):
    packed (cin<=64) vs unpacked on-chip bit parity."""
    from paddle3d_tpu.ops.pallas.sparse_conv import sparse_conv3d_win
    rng = np.random.default_rng(1)
    D, H, W = 41, 1440, 1440
    b, v, cin, cout = 2, 40000, 16, 16
    keys = np.stack([np.sort(rng.choice(
        D * H * W, size=v, replace=False).astype(np.int32))
        for _ in range(b)])
    feats = rng.standard_normal((b, v, cin)).astype(np.float32)
    w = (rng.standard_normal((27 * cin, cout)).astype(np.float32) * 0.05)
    a = [jnp.asarray(keys), jnp.asarray(keys),
         jnp.asarray(feats, jnp.bfloat16), jnp.asarray(w)]
    got = sparse_conv3d_win(*a, D, H, W, impl="packed")
    ref = sparse_conv3d_win(*a, D, H, W, impl="unpacked")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=0)


def test_ms_deform_attn_production_shape():
    """BEVFormer-tiny real MSDA shapes on the chip (VERDICT r4 item 5):
    temporal self attention Q=2500 over the 50x50 BEV level and spatial
    cross attention over the 15x25 image level, f32 like training. The
    tent-weight matmul path must agree with the gather/lerp path it
    replaced (force_gather=True) — this catches any chip-only precision
    regression in the einsum pair."""
    from paddle3d_tpu.ops.ms_deform_attn import ms_deform_attn
    rng = np.random.default_rng(4)
    for shapes, q in ((((50, 50),), 2500), (((15, 25),), 2500)):
        s = sum(h * w for h, w in shapes)
        m, d, p = 8, 32, 4
        value = jnp.asarray(
            rng.standard_normal((s, m, d)).astype(np.float32))
        locs = jnp.asarray(rng.uniform(
            0, 1, (q, m, len(shapes), p, 2)).astype(np.float32))
        w = rng.uniform(0, 1, (q, m, len(shapes), p)).astype(np.float32)
        w /= w.sum(axis=(2, 3), keepdims=True)
        w = jnp.asarray(w)
        got = ms_deform_attn(value, shapes, locs, w)
        ref = ms_deform_attn(value, shapes, locs, w, force_gather=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_ball_query_production_shape():
    """PV-RCNN keypoint shape (N=16k support, M=2048 centers)."""
    from paddle3d_tpu.ops.pallas.ball_query import ball_query_batched
    rng = np.random.default_rng(2)
    b, n, m = 2, 16384, 2048
    xyz = rng.uniform(-50, 50, size=(b, n, 3)).astype(np.float32)
    new_xyz = xyz[:, :m].copy()
    mask = np.ones((b, n), bool)
    mask[:, n - 500:] = False
    a = (jnp.asarray(xyz), jnp.asarray(new_xyz), jnp.asarray(mask))
    idx, cnt = ball_query_batched(4.0, 32, *a)
    ridx, rcnt = ball_query_batched(4.0, 32, *a, force_xla=True)
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(rcnt))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))


def test_fps_production_shape():
    """IA-SSD first SA stage shape (N=16k -> 4096 samples)."""
    from paddle3d_tpu.ops.pallas.fps import farthest_point_sample_batched
    rng = np.random.default_rng(3)
    b, n, npoint = 2, 16384, 4096
    xyz = rng.uniform(-50, 50, size=(b, n, 3)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[:, n - 300:] = False
    idx = farthest_point_sample_batched(
        jnp.asarray(xyz), jnp.asarray(mask), npoint)
    ref = farthest_point_sample_batched(
        jnp.asarray(xyz), jnp.asarray(mask), npoint, force_xla=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))
