"""Cameras and ray generation (reference: pprndr/cameras +
cpp_extensions radial/tangential undistort)."""
import jax.numpy as jnp

__all__ = ["generate_rays", "radial_tangential_undistort"]


def generate_rays(pixels_xy, intrinsics, c2w):
    """pixels_xy [N, 2] (pixel centers), intrinsics [3, 3], c2w [4, 4]
    (OpenGL convention: camera looks down -z) -> (origins [N, 3],
    directions [N, 3] unit)."""
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x = (pixels_xy[:, 0] + 0.5 - cx) / fx
    y = (pixels_xy[:, 1] + 0.5 - cy) / fy
    dirs_cam = jnp.stack([x, -y, -jnp.ones_like(x)], axis=-1)
    dirs = dirs_cam @ c2w[:3, :3].T
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(c2w[:3, 3], dirs.shape)
    return origins, dirs


def radial_tangential_undistort(uv, dist_coeffs, iters: int = 5):
    """Iteratively invert the Brown–Conrady distortion (reference:
    cpp_extensions undistort kernels). uv [N, 2] normalized distorted
    coords; dist_coeffs (k1, k2, p1, p2) -> undistorted [N, 2]."""
    k1, k2, p1, p2 = [dist_coeffs[i] for i in range(4)]

    def distort(p):
        x, y = p[:, 0], p[:, 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + k2 * r2)
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return jnp.stack([xd, yd], axis=-1)

    p = uv
    for _ in range(iters):
        p = p - (distort(p) - uv)
    return p
