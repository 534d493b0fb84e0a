"""Bounded segmented ops (key-guarded doubling) vs the associative_scan
reference implementations, and the blocked global cumsum."""
import jax.numpy as jnp
import numpy as np

from paddle3d_tpu.ops.segmented import (blocked_cumsum,
                                        seg_broadcast_from_bounded,
                                        seg_broadcast_max,
                                        seg_inclusive_max,
                                        seg_inclusive_sum,
                                        seg_prefix_max_bounded,
                                        seg_prefix_sum_bounded)


def _segments(rng, n, max_len):
    """Sorted keys with random run lengths ≤ max_len."""
    keys = []
    k = 0
    while len(keys) < n:
        keys.extend([k] * int(rng.integers(1, max_len + 1)))
        k += 1
    keys = np.array(keys[:n], np.int32)
    head = np.concatenate([[True], keys[1:] != keys[:-1]])
    return jnp.asarray(keys), jnp.asarray(head)


def test_bounded_prefix_ops_match_scan(rng):
    n, max_len = 1024, 13
    keys, head = _segments(rng, n, max_len)
    vals = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(seg_prefix_sum_bounded(vals, keys, max_len)),
        np.asarray(seg_inclusive_sum(vals, head)), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(seg_prefix_max_bounded(vals, keys, max_len)),
        np.asarray(seg_inclusive_max(vals, head)), rtol=1e-6, atol=1e-6)


def test_bounded_broadcast_from_tail(rng):
    n, max_len = 512, 9
    keys, head = _segments(rng, n, max_len)
    tail = jnp.concatenate([head[1:], jnp.ones((1,), bool)])
    vals = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    segmax = seg_prefix_max_bounded(vals, keys, max_len)
    out = seg_broadcast_from_bounded(segmax, tail, keys, max_len)
    ref = seg_broadcast_max(vals, head)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_bounded_clamps_beyond_cap(rng):
    # a 40-long run with cap 8: ranks past 2^ceil(log2(9)) must read >= cap
    keys = jnp.asarray(np.zeros(40, np.int32))
    ones = jnp.ones((40,), jnp.int32)
    r = seg_prefix_sum_bounded(ones, keys, 8 + 1)
    r = np.asarray(r) - 1
    assert (r[:8] == np.arange(8)).all()
    assert (r[8:] >= 8).all()


def test_blocked_cumsum_matches(rng):
    for n in (512 * 3, 1000, 64):  # blocked path + fallback paths
        x = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(blocked_cumsum(x)),
                                   np.cumsum(np.asarray(x)), rtol=1e-4,
                                   atol=1e-4)
    xi = jnp.asarray(rng.integers(0, 3, size=(2048,)).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(blocked_cumsum(xi)),
                                  np.cumsum(np.asarray(xi)))


def test_window_max_matches_broadcast(rng):
    from paddle3d_tpu.ops.segmented import seg_window_max_bounded
    n, max_len = 1024, 13
    keys, head = _segments(rng, n, max_len)
    vals = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    ref = seg_broadcast_max(vals, head)
    out = seg_window_max_bounded(vals, keys, max_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
