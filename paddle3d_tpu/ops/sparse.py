"""Sparse 3D convolution as gather-GEMM-scatter.

The reference gets 3D sparse conv from the framework
(paddle.sparse.nn.SubmConv3D / Conv3D, used by
paddle3d/models/middle_encoders/sparse_resnet.py:22-23 and sparsenet.py:68).
JAX has no sparse-conv freebie, so this is the TPU-native design from
SURVEY.md §7 hard-part 1:

  * active voxels live in fixed-capacity arrays (coords [V,3] (z,y,x),
    features [V,C], mask [V]);
  * a sorted linear-key table gives O(log V) neighbor lookup via
    searchsorted (the GPU hash table's XLA-friendly analogue);
  * submanifold conv = gather neighbors [V, K, Cin] -> one MXU matmul
    [V, K*Cin] @ [K*Cin, Cout] -> same active set;
  * strided conv = derive the downsampled active set (sort-unique with a
    new capacity) then gather-GEMM onto it.

Everything is per-sample and vmap-able; capacities are static.
"""
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "build_coord_table", "lookup_coords", "subm_conv3d_gather",
    "downsample_coords", "sparse_gather_neighbors",
]


def _linear_key(coords: jnp.ndarray, grid: Sequence[int]) -> jnp.ndarray:
    """(z,y,x) int coords -> linear key; grid = (D, H, W)."""
    d, h, w = grid
    return (coords[:, 0] * (h * w) + coords[:, 1] * w +
            coords[:, 2]).astype(jnp.int32)


def build_coord_table(coords: jnp.ndarray, mask: jnp.ndarray,
                      grid: Sequence[int]):
    """-> (sorted_keys [V], sorted_idx [V]); invalid rows get a sentinel
    key that sorts last and can never be matched."""
    d, h, w = grid
    sentinel = d * h * w + 1
    keys = jnp.where(mask, _linear_key(coords, grid), sentinel)
    order = jnp.argsort(keys)
    return keys[order], order.astype(jnp.int32)


def lookup_coords(sorted_keys: jnp.ndarray, sorted_idx: jnp.ndarray,
                  query_coords: jnp.ndarray, query_valid: jnp.ndarray,
                  grid: Sequence[int]) -> jnp.ndarray:
    """Find the row index of each query (z,y,x) or -1."""
    d, h, w = grid
    in_grid = (jnp.all(query_coords >= 0, axis=-1)
               & (query_coords[:, 0] < d) & (query_coords[:, 1] < h)
               & (query_coords[:, 2] < w))
    qkeys = _linear_key(jnp.clip(query_coords, 0), grid)
    pos = jnp.searchsorted(sorted_keys, qkeys)
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    hit = (sorted_keys[pos] == qkeys) & in_grid & query_valid
    return jnp.where(hit, sorted_idx[pos], -1)


def _kernel_offsets(kernel_size: int) -> np.ndarray:
    k = kernel_size
    r = np.arange(k) - (k - 1) // 2
    zz, yy, xx = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([zz, yy, xx], axis=-1).reshape(-1, 3)  # [K^3, 3]


@functools.partial(jax.jit, static_argnames=("kernel_size", "grid",
                                              "stride"))
def sparse_gather_neighbors(features: jnp.ndarray, coords: jnp.ndarray,
                            mask: jnp.ndarray, out_coords: jnp.ndarray,
                            out_mask: jnp.ndarray, kernel_size: int,
                            grid: Tuple[int, int, int],
                            stride=1) -> jnp.ndarray:
    """Gather [Vout, K^3, C] neighbor features for each output site.

    Output site o with coord c reads input coords c*stride + offset
    (stride may be per-axis (sz, sy, sx)). Missing neighbors contribute
    zeros.
    """
    v_out = out_coords.shape[0]
    offsets = jnp.asarray(_kernel_offsets(kernel_size))  # [K,3]
    kk = offsets.shape[0]
    sorted_keys, sorted_idx = build_coord_table(coords, mask, grid)

    stride_v = jnp.asarray(stride if isinstance(stride, tuple) else
                           (stride,) * 3, jnp.int32)
    base = out_coords * stride_v
    query = base[:, None, :] + offsets[None, :, :]  # [Vout, K, 3]
    q = query.reshape(-1, 3)
    qv = jnp.repeat(out_mask, kk)
    nbr = lookup_coords(sorted_keys, sorted_idx, q, qv, grid)  # [Vout*K]
    nbr = nbr.reshape(v_out, kk)
    safe = jnp.where(nbr >= 0, nbr, 0)
    gathered = features[safe]  # [Vout, K, C]
    return jnp.where((nbr >= 0)[..., None], gathered, 0.)


def subm_conv3d_gather(features: jnp.ndarray, coords: jnp.ndarray,
                       mask: jnp.ndarray, weights: jnp.ndarray,
                       grid: Tuple[int, int, int]) -> jnp.ndarray:
    """Submanifold conv: output on the SAME active set.

    weights: [K^3 * Cin, Cout] (flattened kernel).
    """
    k3 = weights.shape[0] // features.shape[1]
    kernel_size = round(k3 ** (1 / 3))
    gathered = sparse_gather_neighbors(
        features, coords, mask, coords, mask, kernel_size, grid, stride=1)
    v = gathered.shape[0]
    flat = gathered.reshape(v, -1)
    out = jnp.dot(flat, weights, preferred_element_type=jnp.float32)
    return jnp.where(mask[:, None], out, 0.).astype(features.dtype)


@functools.partial(
    jax.jit, static_argnames=("grid", "stride", "out_capacity"))
def downsample_coords(coords: jnp.ndarray, mask: jnp.ndarray,
                      grid: Tuple[int, int, int], stride,
                      out_capacity: int):
    """Strided output active set: unique(coords // stride) with a fixed
    capacity (sort-based, deterministic — same machinery as the voxelizer).
    `stride` may be an int or a per-axis (sz, sy, sx) tuple.

    Returns (out_coords [out_capacity,3], out_mask).
    """
    d, h, w = grid
    sz, sy, sx = stride if isinstance(stride, tuple) else (stride,) * 3
    od, oh, ow = max(d // sz, 1), h // sy, w // sx
    down = coords // jnp.asarray((sz, sy, sx), coords.dtype)
    sentinel = od * oh * ow + 1
    keys = jnp.where(mask,
                     down[:, 0] * (oh * ow) + down[:, 1] * ow + down[:, 2],
                     sentinel)
    # payload-free: sort the KEY alone (cheaper than argsort + row gather)
    # and decode (z, y, x) arithmetically from the compacted keys
    skey = jax.lax.sort(keys)
    head = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]) & (skey != sentinel)
    uid = jnp.cumsum(head.astype(jnp.int32)) - 1
    slot = jnp.where(head & (uid < out_capacity), uid, out_capacity)
    out_key = jnp.full((out_capacity + 1,), sentinel, jnp.int32)
    out_key = out_key.at[slot].set(skey, mode="drop")[:-1]
    n_out = jnp.minimum(jnp.sum(head.astype(jnp.int32)), out_capacity)
    out_mask = jnp.arange(out_capacity) < n_out
    safe = jnp.where(out_mask, out_key, 0)
    oz = safe // (oh * ow)
    rem = safe - oz * (oh * ow)
    oy = rem // ow
    ox = rem - oy * ow
    out_coords = jnp.stack([oz, oy, ox], axis=-1).astype(jnp.int32)
    out_coords = jnp.where(out_mask[:, None], out_coords, 0)
    return out_coords, out_mask
