"""Circle NMS (reference: paddle3d/geometries/bbox.py:450 circle_nms —
CenterPoint's distance-based suppression: a detection is suppressed when a
higher-scoring kept detection's center lies within min_radius).

Fixed-shape TPU formulation: the same fixpoint iteration as the rotated
NMS (ops/iou3d_nms.py _greedy_suppress) but over a pairwise
squared-distance matrix instead of rotated IoU — converges in suppression
chain depth iterations of a lax.while_loop, all [K, K] ops on the VPU.
"""
import jax
import jax.numpy as jnp

__all__ = ["circle_nms"]


def circle_nms(centers: jnp.ndarray, scores: jnp.ndarray,
               min_radius: float, post_max_size: int):
    """centers [K, 2]; scores [K] (use -inf for invalid rows).

    Returns (keep [post_max_size] indices into the INPUT order, -1 padded;
    order [K] the score-sort permutation).
    """
    k = scores.shape[0]
    order = jnp.argsort(-scores)
    c = centers[order]
    s = scores[order]

    d2 = jnp.sum((c[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    thresh = float(min_radius) ** 2
    # overlap[i, j]: j (higher score, j < i) suppresses i
    tri = jnp.tril(jnp.ones((k, k), bool), k=-1)
    overlap = (d2 < thresh) & tri
    valid = jnp.isfinite(s)

    def body(alive):
        # alive_i = valid_i and no alive higher-score j suppresses i
        suppressed = jnp.any(overlap & alive[None, :], axis=1)
        return valid & ~suppressed

    def cond(carry):
        alive, prev = carry
        return jnp.any(alive != prev)

    def step(carry):
        alive, _ = carry
        return body(alive), alive

    init = valid
    alive, _ = jax.lax.while_loop(cond, step, (body(init), init))

    kept_rank = jnp.cumsum(alive) - 1
    out = jnp.full((post_max_size,), -1, jnp.int32)
    idx = jnp.where(alive, kept_rank, post_max_size)  # OOB rows are dropped
    out = out.at[idx].set(order.astype(jnp.int32), mode="drop")
    return out, order
