"""Volume rendering (reference: pprndr rendering + trunc_exp CUDA ext).

trunc_exp becomes a custom-JVP clip-gradient exp; the transmittance product
is an exclusive cumprod — one fused elementwise program per ray batch."""
import jax
import jax.numpy as jnp

__all__ = ["trunc_exp", "render_rays"]


@jax.custom_jvp
def trunc_exp(x):
    """exp with clamped input (reference: cpp_extensions/trunc_exp —
    forward exp(clip(x)), backward grad * exp(clip(x)))."""
    return jnp.exp(jnp.clip(x, -15., 15.))


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.exp(jnp.clip(x, -15., 15.))
    return y, y * dx


def render_rays(densities, colors, t_vals, rays_d=None,
                white_background: bool = False):
    """Composite per-sample (density, color) along each ray.

    densities [R, S]; colors [R, S, 3]; t_vals [R, S] sorted sample
    depths -> dict(rgb [R, 3], depth [R], acc [R], weights [R, S]).
    """
    deltas = jnp.diff(t_vals, axis=-1)
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[:, :1], 1e10)], axis=-1)
    if rays_d is not None:
        deltas = deltas * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    alpha = 1.0 - jnp.exp(-densities * deltas)  # [R, S]
    # exclusive transmittance product
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    weights = alpha * trans

    rgb = jnp.sum(weights[..., None] * colors, axis=-2)
    depth = jnp.sum(weights * t_vals, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    if white_background:
        rgb = rgb + (1.0 - acc[..., None])
    return {"rgb": rgb, "depth": depth, "acc": acc, "weights": weights}
