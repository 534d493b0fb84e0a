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
    "seg_prefix_sum_bounded", "seg_prefix_max_bounded",
    "seg_broadcast_from_bounded", "seg_window_max_bounded", "blocked_cumsum",
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


# ---------------------------------------------------------------------------
# Bounded-distance segmented ops (the pillar pipeline's hot path).
#
# `lax.associative_scan` over a [250k, C] array costs ~50-90 ms on v5e (its
# odd/even recursion materializes strided slices at every level). But every
# pillar reduction only ever spans the first `max_points_in_voxel` (≤ 128)
# rows of a segment, so a key-guarded Hillis–Steele doubling with
# ceil(log2(P)) steps — each one contiguous pad+slice + select — computes
# the same result in O(N·log P) contiguous work. Correctness: after step k,
# row j holds the reduction over [j−2^k+1, j] ∩ segment; for any row at
# in-segment rank r < 2^K that is the exact segment prefix.
# ---------------------------------------------------------------------------


def _steps_for(max_len: int) -> int:
    k = 0
    while (1 << k) < max_len:
        k += 1
    return k


def _shift_down(x, d, fill):
    """x shifted so row j reads row j−d (top d rows = fill)."""
    pad = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


def _shift_up(x, d, fill):
    pad = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[d:], pad], axis=0)


def seg_prefix_sum_bounded(vals: jnp.ndarray, keys: jnp.ndarray,
                           max_len: int) -> jnp.ndarray:
    """Segment-inclusive prefix sum, exact for rows whose in-segment rank is
    < 2^ceil(log2(max_len)). keys: [N] sorted segment ids."""
    x = vals
    for k in range(_steps_for(max_len)):
        d = 1 << k
        same = _shift_down(keys, d, jnp.int32(-2)) == keys
        sh = _shift_down(x, d, 0)
        x = jnp.where(_bcast(same, x), x + sh, x)
    return x


def seg_prefix_max_bounded(vals: jnp.ndarray, keys: jnp.ndarray,
                           max_len: int) -> jnp.ndarray:
    """Segment-inclusive prefix max (same contract as the bounded sum)."""
    x = vals
    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(vals.dtype, jnp.floating)
                      else jnp.iinfo(vals.dtype).min, vals.dtype)
    for k in range(_steps_for(max_len)):
        d = 1 << k
        same = _shift_down(keys, d, jnp.int32(-2)) == keys
        sh = _shift_down(x, d, neg)
        x = jnp.where(_bcast(same, x), jnp.maximum(x, sh), x)
    return x


def seg_window_max_bounded(vals: jnp.ndarray, keys: jnp.ndarray,
                           max_len: int) -> jnp.ndarray:
    """EVERY row receives its whole segment's max in one bidirectional
    doubling pass (max is idempotent, so the centered window
    [j−2^k+1, j+2^k−1] ∩ segment converges to the full ≤max_len segment in
    ceil(log2 max_len) steps) — half the passes of prefix-max followed by a
    backward broadcast, which dominated the CenterPoint 250k-row trace."""
    x = vals
    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(vals.dtype, jnp.floating)
                      else jnp.iinfo(vals.dtype).min, vals.dtype)
    for k in range(_steps_for(max_len)):
        d = 1 << k
        same_dn = _shift_down(keys, d, jnp.int32(-2)) == keys
        same_up = _shift_up(keys, d, jnp.int32(-2)) == keys
        dn = jnp.where(_bcast(same_dn, x), _shift_down(x, d, neg), neg)
        up = jnp.where(_bcast(same_up, x), _shift_up(x, d, neg), neg)
        x = jnp.maximum(x, jnp.maximum(dn, up))
    return x


def seg_broadcast_from_bounded(vals: jnp.ndarray, at: jnp.ndarray,
                               keys: jnp.ndarray,
                               max_len: int) -> jnp.ndarray:
    """Copy each segment's value at its `at`-flagged row BACKWARD to every
    row within max_len rows of it (same segment). vals rows where ~at are
    ignored."""
    have = at
    x = jnp.where(_bcast(at, vals), vals, 0.)
    for k in range(_steps_for(max_len)):
        d = 1 << k
        same = _shift_up(keys, d, jnp.int32(-2)) == keys
        sh_have = _shift_up(have, d, False) & same
        sh_x = _shift_up(x, d, 0)
        take = sh_have & ~have
        x = jnp.where(_bcast(take, x), sh_x, x)
        have = have | take
    return x


def _bcast(flag, x):
    return flag.reshape(flag.shape + (1,) * (x.ndim - 1))


def blocked_cumsum(x: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """Global inclusive cumsum via a two-level contiguous-blocked scan
    (associative_scan's odd/even recursion is slow on long TPU arrays).
    Non-multiple lengths are zero-padded to the next block boundary so the
    blocked path engages on any real scan size (20k/250k points)."""
    n = x.shape[0]
    if n <= block:
        return jnp.cumsum(x, axis=0)
    pad = (-n) % block
    xp = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    nb = xp.shape[0] // block
    xb = xp.reshape((nb, block) + x.shape[1:])
    intra = jnp.cumsum(xb, axis=1)
    totals = intra[:, -1]
    carry = jnp.cumsum(totals, axis=0) - totals  # exclusive block prefix
    out = (intra + carry[:, None]).reshape(xp.shape)
    return out[:n] if pad else out
