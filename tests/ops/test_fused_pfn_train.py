"""Train-mode fused PFN (stats + batch-stat fold + custom VJP) parity
against the XLA segmented train path — forward canvas, BN running-stat
updates, and gradients wrt (W1, gamma, beta)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from tests.ops.test_fused_pfn import PC_RANGE, VOXEL, build, make_points
from paddle3d_tpu.ops.pillar_ops import (
    _fused_pillar_canvas_pallas_train, fused_pillar_canvas)


def build_train(feat_channels=(16,)):
    vox, pfn, mid = build(feat_channels)
    for layer in pfn.pfn_layers:
        layer.mlp.bn.use_running_average = False
    return vox, pfn, mid


@pytest.mark.parametrize("occ", [False, True])
def test_train_forward_matches_xla_path(occ):
    rng = np.random.default_rng(0)
    vox, pfn_a, mid = build_train()
    _, pfn_b, _ = build_train()
    pts = make_points(rng, 2, 1000)

    ref = fused_pillar_canvas(vox, pfn_a, mid, pts, training=True,
                              with_occupancy=occ)
    out = _fused_pillar_canvas_pallas_train(vox, pfn_b, mid, pts, occ,
                                            interpret=True)
    ref_c, out_c = (ref[0], out[0]) if occ else (ref, out)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c),
                               rtol=2e-3, atol=2e-3)
    if occ:
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                                   rtol=1e-5, atol=1e-5)
    # flax updated pfn_a's running stats; the kernel path must match
    bn_a = pfn_a.pfn_layers[0].mlp.bn
    bn_b = pfn_b.pfn_layers[0].mlp.bn
    np.testing.assert_allclose(np.asarray(bn_b.mean.value),
                               np.asarray(bn_a.mean.value),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bn_b.var.value),
                               np.asarray(bn_a.var.value),
                               rtol=1e-4, atol=1e-5)


def test_train_gradients_match_xla_path():
    rng = np.random.default_rng(1)
    vox, pfn_a, mid = build_train()
    _, pfn_b, _ = build_train()
    pts = make_points(rng, 2, 800)
    ny, nx = mid.ny, mid.nx
    w = jnp.asarray(rng.normal(0, 1, (2, ny, nx, 16)), jnp.float32)

    def loss_xla(pfn):
        canvas = fused_pillar_canvas(vox, pfn, mid, pts, training=True,
                                     with_occupancy=False)
        return jnp.sum(canvas * w)

    def loss_kernel(pfn):
        canvas = _fused_pillar_canvas_pallas_train(vox, pfn, mid, pts,
                                                   False, interpret=True)
        return jnp.sum(canvas * w)

    la, ga = nnx.value_and_grad(loss_xla)(pfn_a)
    lb, gb = nnx.value_and_grad(loss_kernel)(pfn_b)
    np.testing.assert_allclose(float(lb), float(la), rtol=2e-3)

    layer_a = ga.pfn_layers[0].mlp
    layer_b = gb.pfn_layers[0].mlp
    np.testing.assert_allclose(
        np.asarray(layer_b.linear.kernel.value),
        np.asarray(layer_a.linear.kernel.value), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(layer_b.bn.scale.value),
        np.asarray(layer_a.bn.scale.value), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(layer_b.bn.bias.value),
        np.asarray(layer_a.bn.bias.value), rtol=5e-3, atol=5e-3)
