"""Interpret-mode parity of the sorted-window sparse conv kernel
(ops/pallas/sparse_conv.py) against the gather reference
(ops/sparse.py subm_conv3d_gather / sparse_gather_neighbors)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddle3d_tpu.ops import sparse as S
from paddle3d_tpu.ops.pallas.sparse_conv import sparse_conv3d_win

GRID = (6, 24, 20)  # (D, H, W)


def make_set(rng, b=2, v=300, cin=6):
    d, h, w = GRID
    coords = np.stack([rng.integers(0, d, (b, v)),
                       rng.integers(0, h, (b, v)),
                       rng.integers(0, w, (b, v))], -1).astype(np.int32)
    # unique + sorted per row, mask the tail
    keys = coords[..., 0] * (h * w) + coords[..., 1] * w + coords[..., 2]
    sentinel = d * h * w + 7
    out_c = np.zeros_like(coords)
    out_k = np.full((b, v), sentinel, np.int32)
    mask = np.zeros((b, v), bool)
    for i in range(b):
        uk, idx = np.unique(keys[i], return_index=True)
        n = len(uk)
        out_k[i, :n] = uk
        out_c[i, :n] = coords[i, idx]
        mask[i, :n] = True
    feats = rng.normal(size=(b, v, cin)).astype(np.float32)
    feats[~mask] = 0.0
    return (jnp.asarray(out_k), jnp.asarray(out_c), jnp.asarray(mask),
            jnp.asarray(feats))


def test_subm_matches_gather_reference(rng):
    keys, coords, mask, feats = make_set(rng)
    cin, cout = feats.shape[-1], 5
    w = rng.normal(size=(27 * cin, cout)).astype(np.float32) * 0.1

    ref = jax.vmap(functools.partial(
        S.subm_conv3d_gather, grid=GRID, ))(
            feats, coords, mask, jnp.broadcast_to(w, (2,) + w.shape))
    got = sparse_conv3d_win(keys, keys, feats, jnp.asarray(w),
                            *GRID, kernel_size=3, interpret=True)
    got = got * mask[..., None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_strided_matches_gather_reference(rng):
    keys, coords, mask, feats = make_set(rng)
    cin, cout = feats.shape[-1], 4
    w = rng.normal(size=(27 * cin, cout)).astype(np.float32) * 0.1
    cap = 128
    d, h, w_ = GRID
    od, oh, ow = d // 2, h // 2, w_ // 2

    def one(f, c, m):
        oc, om = S.downsample_coords(c, m, GRID, 2, cap)
        g = S.sparse_gather_neighbors(f, c, m, oc, om, 3, GRID, stride=2)
        out = jnp.dot(g.reshape(cap, -1), w)
        return out * om[:, None], oc, om

    ref, ocs, oms = jax.vmap(one)(feats, coords, mask)

    # qbase: input-space key of out_coord * stride, sentinel for padding
    qb = (ocs[..., 0] * 2 * (h * w_) + ocs[..., 1] * 2 * w_ +
          ocs[..., 2] * 2).astype(jnp.int32)
    qb = jnp.where(oms, qb, d * h * w_ + 7)
    got = sparse_conv3d_win(qb, keys, feats, jnp.asarray(w),
                            *GRID, kernel_size=3, interpret=True)
    got = got * oms[..., None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("v", [64, 700])
def test_dense_region_chunk_loop(rng, v):
    """A dense cluster forces windows past WIN (chunk loop) without loss."""
    d, h, w_ = GRID
    b = 1
    # pack voxels densely into a few rows so one block's neighbor window
    # spans far more than WIN rows is impossible at this size — instead
    # verify exactness on clustered keys (consecutive cells)
    n = min(v, d * h * w_)
    keys = np.sort(rng.choice(d * h * w_, size=n, replace=False))
    sentinel = d * h * w_ + 7
    kk = np.full((b, v), sentinel, np.int32)
    kk[0, :n] = keys
    mask = np.zeros((b, v), bool)
    mask[0, :n] = True
    coords = np.stack([kk[0] // (h * w_), (kk[0] // w_) % h, kk[0] % w_],
                      -1)[None].astype(np.int32)
    coords[~mask.astype(bool)[..., None].repeat(3, -1).reshape(
        b, v, 3).any(-1) & ~mask[..., None].repeat(3, -1).any(-1)] = 0
    feats = rng.normal(size=(b, v, 4)).astype(np.float32)
    feats[~mask] = 0.0
    w = rng.normal(size=(27 * 4, 6)).astype(np.float32) * 0.1

    ref = jax.vmap(functools.partial(S.subm_conv3d_gather, grid=GRID))(
        jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask),
        jnp.broadcast_to(jnp.asarray(w), (b,) + w.shape))
    got = sparse_conv3d_win(jnp.asarray(kk), jnp.asarray(kk),
                            jnp.asarray(feats), jnp.asarray(w),
                            *GRID, kernel_size=3, interpret=True)
    got = got * jnp.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_k1_sorted_table_gather(rng):
    """kernel_size=1 over a dense table == row gather g[keys] (the scatter
    backward's formulation)."""
    b, cells, c, n = 2, 300, 5, 64
    g = rng.normal(size=(b, cells, c)).astype(np.float32)
    keys = np.sort(rng.integers(0, cells, (b, n)).astype(np.int32), axis=1)
    keys[:, -8:] = cells + 7  # sentinel-clipped invalid rows
    in_keys = np.broadcast_to(np.arange(cells, dtype=np.int32)[None],
                              (b, cells))
    eye = np.eye(c, dtype=np.float32)
    got = sparse_conv3d_win(jnp.asarray(keys), jnp.asarray(in_keys),
                            jnp.asarray(g), jnp.asarray(eye),
                            1, 1, cells, kernel_size=1, interpret=True)
    safe = np.minimum(keys, cells - 1)
    ref = np.take_along_axis(g, safe[..., None], axis=1)
    ref[keys >= cells] = 0.0
    got = np.array(got)
    got[keys >= cells] = 0.0
    # the kernel's one-hot matmul runs bf16 on the MXU, so gathered grads
    # carry bf16 rounding (~1e-2 relative) — fine for AMP training; the
    # XLA fallback backward stays exact
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("impl", ["packed", "unpacked"])
def test_fused_affine_epilogue(rng, impl):
    """scale/shift/relu epilogue == conv -> affine -> relu -> mask, and
    padded feature rows stay exactly zero (sentinel self-match invariant)."""
    keys, coords, mask, feats = make_set(rng)
    cin, cout = feats.shape[-1], 5
    w = rng.normal(size=(27 * cin, cout)).astype(np.float32) * 0.1
    scale = rng.normal(size=(cout,)).astype(np.float32)
    shift = rng.normal(size=(cout,)).astype(np.float32)

    plain = sparse_conv3d_win(keys, keys, feats, jnp.asarray(w),
                              *GRID, kernel_size=3, interpret=True,
                              impl=impl)
    ref = jnp.maximum(plain * scale + shift, 0.0) * mask[..., None]
    got = sparse_conv3d_win(keys, keys, feats, jnp.asarray(w),
                            *GRID, kernel_size=3, interpret=True,
                            impl=impl, scale=jnp.asarray(scale),
                            shift=jnp.asarray(shift), relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # masked rows must be EXACT zeros (not just close): downstream convs
    # gather padding rows through sentinel self-matches
    assert np.all(np.asarray(got)[~np.asarray(mask)] == 0.0)


@pytest.mark.parametrize("impl", ["packed", "unpacked"])
def test_fused_epilogue_strided_and_bf16_out(rng, impl):
    keys, coords, mask, feats = make_set(rng)
    cin, cout = feats.shape[-1], 4
    w = rng.normal(size=(27 * cin, cout)).astype(np.float32) * 0.1
    scale = rng.normal(size=(cout,)).astype(np.float32)
    shift = rng.normal(size=(cout,)).astype(np.float32)
    d, h, w_ = GRID
    cap = 128
    oc, om = jax.vmap(lambda c, m: S.downsample_coords(
        c, m, GRID, (2, 2, 2), cap))(coords, mask)
    qb = (oc[..., 0] * 2 * (h * w_) + oc[..., 1] * 2 * w_ + oc[..., 2] * 2)
    row = jnp.arange(cap, dtype=jnp.int32)
    qb = jnp.where(om, qb, d * h * w_ + 7 + row)

    plain = sparse_conv3d_win(qb, keys, feats, jnp.asarray(w),
                              *GRID, kernel_size=3, interpret=True,
                              impl=impl)
    ref = (jnp.maximum(plain * scale + shift, 0.0) *
           om[..., None]).astype(jnp.bfloat16)
    got = sparse_conv3d_win(qb, keys, feats, jnp.asarray(w),
                            *GRID, kernel_size=3, interpret=True,
                            impl=impl, scale=jnp.asarray(scale),
                            shift=jnp.asarray(shift), relu=True,
                            out_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=4e-2, atol=4e-2)
    assert np.all(np.asarray(got, np.float32)[~np.asarray(om)] == 0.0)
