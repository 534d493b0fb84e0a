import numpy as np
import jax.numpy as jnp
from flax import nnx


def test_sparsenet3d_shapes(rng):
    from paddle3d_tpu.models.middle_encoders import SparseNet3D
    from paddle3d_tpu.models.voxel_encoders import VoxelMean
    from paddle3d_tpu.ops import hard_voxelize_batch

    voxel_size = (0.5, 0.5, 0.25)
    pc_range = (0., -4., -2., 8., 4., 2.)  # grid x16 y16 z16 -> D=17
    pts = rng.uniform([0, -4, -2, 0], [8, 4, 2, 1],
                      (2, 300, 4)).astype(np.float32)
    voxels, coords, npts, mask = hard_voxelize_batch(
        jnp.asarray(pts), voxel_size, pc_range, 5, 128)
    feats = VoxelMean(4)(voxels, npts, coords)

    enc = SparseNet3D(
        in_channels=4, voxel_size=voxel_size, point_cloud_range=pc_range,
        stage_channels=(8, 16, 16, 16), rngs=nnx.Rngs(0))
    bev = enc(feats, coords, mask)
    d, h, w = enc.grid
    assert bev.shape == (2, h // 8, w // 8, (d // 8) * 16)
    assert np.isfinite(np.asarray(bev)).all()
    assert float(jnp.abs(bev).max()) > 0


def test_sparse_resnet3d_runs(rng):
    from paddle3d_tpu.models.middle_encoders import SparseResNet3D
    from paddle3d_tpu.models.voxel_encoders import VoxelMean
    from paddle3d_tpu.ops import hard_voxelize_batch

    voxel_size = (0.5, 0.5, 0.25)
    pc_range = (0., -4., -2., 8., 4., 2.)
    pts = rng.uniform([0, -4, -2, 0], [8, 4, 2, 1],
                      (1, 200, 4)).astype(np.float32)
    voxels, coords, npts, mask = hard_voxelize_batch(
        jnp.asarray(pts), voxel_size, pc_range, 5, 128)
    feats = VoxelMean(4)(voxels, npts, coords)
    enc = SparseResNet3D(
        in_channels=4, voxel_size=voxel_size, point_cloud_range=pc_range,
        rngs=nnx.Rngs(0))
    bev = enc(feats, coords, mask)
    assert bev.ndim == 4 and bev.shape[0] == 1
    assert np.isfinite(np.asarray(bev)).all()


def test_sparse_conv_gradients(rng):
    """Gradients flow through the gather-GEMM-scatter path."""
    import jax
    from paddle3d_tpu.models.layers.sparse_layers import (SparseConv3D,
                                                          SparseTensor)
    conv = SparseConv3D(3, 4, 3, rngs=nnx.Rngs(0))
    graphdef, params = nnx.split(conv, nnx.Param)

    coords = np.zeros((1, 8, 3), np.int32)
    coords[0, :4] = [[0, 0, 0], [0, 0, 1], [0, 1, 0], [1, 1, 1]]
    mask = np.zeros((1, 8), bool)
    mask[0, :4] = True
    feats = rng.normal(size=(1, 8, 3)).astype(np.float32)

    def loss_fn(p):
        m = nnx.merge(graphdef, p)
        st = SparseTensor(
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask),
            (4, 4, 4))
        out = m(st)
        return jnp.sum(out.features ** 2)

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["weight"].value).max()) > 0


def test_dense_bev_kernel_path_matches_scatter(rng):
    """The sorted-scatter _dense_bev (TPU path; sorted_segment_sum falls
    back to XLA segment-sum off-chip) must equal the at[].set reference."""
    import jax.numpy as jnp
    import numpy as np
    from paddle3d_tpu.models.layers.sparse_layers import SparseTensor
    from paddle3d_tpu.models.middle_encoders.sparse_resnet import _dense_bev

    d, h, w = 3, 10, 12
    b, v, c = 2, 40, 8
    coords = np.stack([rng.integers(0, d, (b, v)),
                       rng.integers(0, h, (b, v)),
                       rng.integers(0, w, (b, v))], -1).astype(np.int32)
    keys = coords[..., 0] * (h * w) + coords[..., 1] * w + coords[..., 2]
    mask = np.zeros((b, v), bool)
    out_c = np.zeros_like(coords)
    for i in range(b):
        uk, idx = np.unique(keys[i], return_index=True)
        n = len(uk)
        out_c[i, :n] = coords[i, idx[np.argsort(uk)]]
        mask[i, :n] = True
    feats = rng.normal(size=(b, v, c)).astype(np.float32)
    feats[~mask] = 0.0
    st = SparseTensor(jnp.asarray(feats), jnp.asarray(out_c),
                      jnp.asarray(mask), (d, h, w))
    ref = _dense_bev(st, use_kernel=False)
    got = _dense_bev(st, use_kernel=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
