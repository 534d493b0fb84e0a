import numpy as np
import jax.numpy as jnp

from paddle3d_tpu.ops.sparse import (build_coord_table, downsample_coords,
                                     lookup_coords, sparse_gather_neighbors,
                                     subm_conv3d_gather)

GRID = (8, 16, 16)  # (D, H, W)


def _dense_subm_conv(dense_feat, active, weights_k, k=3):
    """Dense reference: conv only evaluated at active sites."""
    d, h, w, c = dense_feat.shape
    cout = weights_k.shape[-1]
    out = np.zeros((d, h, w, cout), np.float32)
    pad = k // 2
    padded = np.pad(dense_feat,
                    ((pad, pad), (pad, pad), (pad, pad), (0, 0)))
    for (z, y, x) in active:
        patch = padded[z:z + k, y:y + k, x:x + k].reshape(-1)
        out[z, y, x] = patch @ weights_k.reshape(-1, cout)
    return out


def test_lookup(rng):
    coords = np.array([[0, 1, 2], [3, 4, 5], [7, 15, 15]], np.int32)
    coords = np.vstack([coords, np.zeros((5, 3), np.int32)])
    mask = np.array([1, 1, 1, 0, 0, 0, 0, 0], bool)
    sk, si = build_coord_table(jnp.asarray(coords), jnp.asarray(mask), GRID)
    q = np.array([[3, 4, 5], [0, 1, 2], [1, 1, 1], [-1, 0, 0]], np.int32)
    got = np.asarray(
        lookup_coords(sk, si, jnp.asarray(q), jnp.ones(4, bool), GRID))
    assert got[0] == 1 and got[1] == 0
    assert got[2] == -1 and got[3] == -1


def test_subm_conv_matches_dense(rng):
    cin, cout, k = 4, 6, 3
    n_active = 20
    # random distinct active coords
    lin = rng.choice(GRID[0] * GRID[1] * GRID[2], n_active, replace=False)
    coords = np.stack([lin // (16 * 16), (lin // 16) % 16, lin % 16],
                      axis=1).astype(np.int32)
    cap = 32
    coords_p = np.vstack([coords, np.zeros((cap - n_active, 3), np.int32)])
    mask = np.zeros(cap, bool)
    mask[:n_active] = True
    feats = np.zeros((cap, cin), np.float32)
    feats[:n_active] = rng.normal(size=(n_active, cin))
    weights = rng.normal(size=(k * k * k * cin, cout)).astype(np.float32)

    out = np.asarray(
        subm_conv3d_gather(
            jnp.asarray(feats), jnp.asarray(coords_p), jnp.asarray(mask),
            jnp.asarray(weights), GRID))

    dense = np.zeros(GRID + (cin,), np.float32)
    for i, (z, y, x) in enumerate(coords):
        dense[z, y, x] = feats[i]
    ref = _dense_subm_conv(dense, coords,
                           weights.reshape(k, k, k, cin, cout))
    for i, (z, y, x) in enumerate(coords):
        np.testing.assert_allclose(out[i], ref[z, y, x], rtol=1e-4,
                                   atol=1e-4)


def test_downsample_unique(rng):
    coords = np.array(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [2, 2, 2], [2, 3, 3], [4, 8, 8]],
        np.int32)
    cap = 8
    coords_p = np.vstack([coords, np.zeros((cap - len(coords), 3), np.int32)])
    mask = np.zeros(cap, bool)
    mask[:len(coords)] = True
    oc, om = downsample_coords(
        jnp.asarray(coords_p), jnp.asarray(mask), GRID, 2, 4)
    oc, om = np.asarray(oc), np.asarray(om)
    got = {tuple(c) for c, m in zip(oc, om) if m}
    assert got == {(0, 0, 0), (1, 1, 1), (2, 4, 4)}


def test_strided_gather(rng):
    # one active input at (2,2,2); output site (1,1,1) with stride 2 and
    # k=3 covers input coords (2±1, 2±1, 2±1) -> center offset finds it
    cap = 4
    coords = np.zeros((cap, 3), np.int32)
    coords[0] = [2, 2, 2]
    mask = np.array([1, 0, 0, 0], bool)
    feats = np.zeros((cap, 2), np.float32)
    feats[0] = [1., 2.]
    oc, om = downsample_coords(
        jnp.asarray(coords), jnp.asarray(mask), GRID, 2, 2)
    gathered = np.asarray(
        sparse_gather_neighbors(
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask), oc,
            om, 3, GRID, stride=2))
    # exactly one neighbor slot holds the feature
    nonzero = np.abs(gathered[0]).sum(axis=-1) > 0
    assert nonzero.sum() == 1
    np.testing.assert_allclose(gathered[0][nonzero][0], [1., 2.])
