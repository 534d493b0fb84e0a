"""PointNet++ primitives as fixed-shape XLA programs.

TPU-native replacement for the reference CUDA op family
(reference: paddle3d/ops/pointnet2/ — farthest_point_sample sampling_gpu.cu:37,
gather_operation gather_points.cc:100, ball_query_batch/stack
ball_query_batch.cc:61, grouping_operation group_points_batch.cc:95).

Design notes:
  * everything is single-sample with a validity mask and `vmap`s over the
    batch — the reference's "stack" (ragged concatenated) layout exists only
    to avoid GPU padding waste and is subsumed by the masked batch layout;
  * FPS is inherently sequential -> lax.fori_loop over masked argmax
    (SURVEY.md §7 hard part 4); distances are O(N) per step, fully on VPU;
  * ball query keeps the first `nsample` in-radius neighbors via a rank
    cumsum, duplicating the first hit into empty slots (CUDA semantics).
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "farthest_point_sample", "gather_operation", "ball_query",
    "grouping_operation", "knn_query", "three_nn", "three_interpolate",
]

_BIG = 1e10


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(xyz: jnp.ndarray, mask: jnp.ndarray,
                          npoint: int) -> jnp.ndarray:
    """[N,3] points + [N] validity -> [npoint] int32 indices.

    Deterministic: starts from the first valid point; invalid points are
    never selected (their distance is pinned at -inf).
    """
    n = xyz.shape[0]
    d2 = jnp.full((n,), _BIG)
    d2 = jnp.where(mask, d2, -1.0)
    start = jnp.argmax(mask)  # first valid index

    def body(i, state):
        d2, idx = state
        last = idx[i - 1]
        delta = xyz - xyz[last]
        dist = jnp.sum(delta * delta, axis=-1)
        d2 = jnp.where(mask, jnp.minimum(d2, dist), -1.0)
        idx = idx.at[i].set(jnp.argmax(d2).astype(jnp.int32))
        return d2, idx

    idx0 = jnp.zeros((npoint,), jnp.int32).at[0].set(start.astype(jnp.int32))
    _, idx = jax.lax.fori_loop(1, npoint, body, (d2, idx0))
    return idx


def gather_operation(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[N, C] x [M] -> [M, C]."""
    return features[idx]


@functools.partial(jax.jit, static_argnames=("nsample",))
def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               new_xyz: jnp.ndarray, xyz_mask: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N,3] support + [M,3] centers -> (idx [M, nsample], count [M]).

    Keeps the first nsample in-radius points by index order; empty slots are
    filled with the first hit (matching the CUDA kernel), or 0 when no point
    is in range (count==0 flags it).
    """
    n = xyz.shape[0]
    d2 = jnp.sum((new_xyz[:, None, :] - xyz[None, :, :])**2, axis=-1)  # [M,N]
    in_ball = (d2 <= radius * radius) & xyz_mask[None, :]
    rank = jnp.cumsum(in_ball.astype(jnp.int32), axis=1) - 1  # [M,N]
    slot = jnp.where(in_ball & (rank < nsample), rank, nsample)
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], d2.shape)
    idx = jnp.zeros((d2.shape[0], nsample + 1), jnp.int32)
    idx = jax.vmap(lambda i_row, s_row: i_row_scatter(i_row, s_row, nsample))(
        src, slot)
    count = jnp.minimum(jnp.sum(in_ball, axis=1), nsample)
    # fill empty slots with the first hit
    first = idx[:, 0]
    ar = jnp.arange(nsample)[None, :]
    idx = jnp.where(ar < jnp.maximum(count, 1)[:, None], idx,
                    first[:, None])
    return idx, count


def i_row_scatter(src_row, slot_row, nsample):
    out = jnp.zeros((nsample + 1,), jnp.int32)
    out = out.at[slot_row].set(src_row, mode="drop")
    return out[:nsample]


def grouping_operation(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[N, C] x [M, K] -> [M, K, C]."""
    return features[idx]


@functools.partial(jax.jit, static_argnames=("k",))
def knn_query(k: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray,
              xyz_mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N,3] support + [M,3] centers -> (idx [M,k], dist2 [M,k])."""
    d2 = jnp.sum((new_xyz[:, None, :] - xyz[None, :, :])**2, axis=-1)
    d2 = jnp.where(xyz_mask[None, :], d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), -neg


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray,
             known_mask: jnp.ndarray):
    """3 nearest neighbors: [M,3], [N,3] -> (dist2 [M,3], idx [M,3])."""
    idx, d2 = knn_query(3, known, unknown, known_mask)
    return d2, idx


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """[N,C] x [M,3] x [M,3] -> [M,C] inverse-distance interpolation."""
    gathered = features[idx]  # [M,3,C]
    return jnp.sum(gathered * weight[..., None], axis=1)


def interpolation_weights(dist2: jnp.ndarray, eps: float = 1e-8):
    recip = 1.0 / jnp.maximum(dist2, eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
