"""Ray samplers (reference: pprndr ray samplers + ray_marching CUDA ext).

Fixed-shape stratified and inverse-CDF importance sampling — the dynamic
occupancy-grid marching of the CUDA extension becomes capacity-padded
per-ray sample sets (every ray carries the same static sample count)."""
import jax
import jax.numpy as jnp

__all__ = ["sample_stratified", "sample_pdf"]


def sample_stratified(key, num_rays: int, num_samples: int, near: float,
                      far: float, lindisp: bool = False,
                      perturb: bool = True):
    """-> t values [R, S] (sorted along S)."""
    t = jnp.linspace(0., 1., num_samples)
    if lindisp:
        z = 1. / (1. / near * (1. - t) + 1. / far * t)
    else:
        z = near * (1. - t) + far * t
    z = jnp.broadcast_to(z, (num_rays, num_samples))
    if perturb:
        mids = 0.5 * (z[:, 1:] + z[:, :-1])
        upper = jnp.concatenate([mids, z[:, -1:]], axis=-1)
        lower = jnp.concatenate([z[:, :1], mids], axis=-1)
        u = jax.random.uniform(key, z.shape)
        z = lower + (upper - lower) * u
    return z


def sample_pdf(key, bins, weights, num_samples: int, perturb: bool = True):
    """Inverse-CDF importance sampling (reference: NeRF hierarchical
    sampling). bins [R, B+1] edges; weights [R, B] -> [R, S] sorted."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)

    r = bins.shape[0]
    if perturb:
        u = jax.random.uniform(key, (r, num_samples))
    else:
        u = jnp.broadcast_to(jnp.linspace(0., 1. - 1e-5, num_samples),
                             (r, num_samples))

    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
        cdf, u)
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bin_b = jnp.take_along_axis(bins, jnp.clip(below, 0,
                                               bins.shape[-1] - 1), axis=-1)
    bin_a = jnp.take_along_axis(bins, jnp.clip(above, 0,
                                               bins.shape[-1] - 1), axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-8, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    samples = bin_b + t * (bin_a - bin_b)
    return jnp.sort(samples, axis=-1)
