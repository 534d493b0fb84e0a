"""Segmented scans over sort-grouped rows (log-depth, elementwise only).

The voxelizer sorts points by cell key, so per-voxel reductions become
segmented scans over contiguous runs — XLA-friendly `associative_scan`
passes instead of the reference's CUDA segment kernels
(reference: paddle3d/ops/voxel/voxelize_op.cu:106-182).

All helpers take `head` flags ([N] bool, True at the first row of each
segment) and operate on [N] or [N, K] value arrays.
"""
import jax
import jax.numpy as jnp

__all__ = [
    "seg_inclusive_sum", "seg_inclusive_max", "seg_broadcast_total",
    "seg_broadcast_max", "tail_flags",
]


def tail_flags(head: jnp.ndarray) -> jnp.ndarray:
    """head flags -> tail flags (True at the LAST row of each segment)."""
    return jnp.concatenate([head[1:], jnp.ones((1,), bool)])


def _scan(vals, flags, combine, reverse=False):
    expand = vals.ndim - 1
    f = flags.reshape(flags.shape + (1,) * expand)
    out, _ = jax.lax.associative_scan(
        combine, (vals, jnp.broadcast_to(f, vals.shape)), reverse=reverse)
    return out


def _sum_combine(a, b):
    av, af = a
    bv, bf = b
    return jnp.where(bf, bv, av + bv), af | bf


def _max_combine(a, b):
    av, af = a
    bv, bf = b
    return jnp.where(bf, bv, jnp.maximum(av, bv)), af | bf


def _copy_combine(a, b):
    av, af = a
    bv, bf = b
    return jnp.where(bf, bv, av), af | bf


def seg_inclusive_sum(vals: jnp.ndarray, head: jnp.ndarray) -> jnp.ndarray:
    """Per-row running sum that resets at each segment head."""
    return _scan(vals, head, _sum_combine)


def seg_inclusive_max(vals: jnp.ndarray, head: jnp.ndarray) -> jnp.ndarray:
    """Per-row running max that resets at each segment head."""
    return _scan(vals, head, _max_combine)


def _broadcast_from_tail(vals: jnp.ndarray, head: jnp.ndarray) -> jnp.ndarray:
    """Copy each segment's TAIL-row value backward over the whole segment."""
    return _scan(vals, tail_flags(head), _copy_combine, reverse=True)


def seg_broadcast_total(vals: jnp.ndarray, head: jnp.ndarray) -> jnp.ndarray:
    """Every row receives its segment's total sum."""
    return _broadcast_from_tail(seg_inclusive_sum(vals, head), head)


def seg_broadcast_max(vals: jnp.ndarray, head: jnp.ndarray) -> jnp.ndarray:
    """Every row receives its segment's max."""
    return _broadcast_from_tail(seg_inclusive_max(vals, head), head)
