"""On-device (jax) box utilities.

Device-side counterparts of the host geometry kernels in
paddle3d_tpu/geometries/bbox.py (reference: paddle3d/geometries/bbox.py and
paddle3d/utils/box.py). All functions are jit-friendly: static shapes, no
data-dependent control flow.
"""
import jax
import jax.numpy as jnp

__all__ = [
    "limit_period", "boxes_to_corners_bev", "corners_bev_area",
    "second_box_encode", "second_box_decode", "rotation_3d_in_axis",
    "boxes_to_corners_3d", "center_to_corner_box2d",
]


def limit_period(val, offset: float = 0.5, period: float = jnp.pi):
    """Wrap angle into [-offset*period, (1-offset)*period)."""
    return val - jnp.floor(val / period + offset) * period


def boxes_to_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """[N, 5+] (cx, cy, dx, dy, ..., yaw) -> [N, 4, 2] CCW BEV corners.

    Accepts either [N,5] BEV boxes or [N,7] 3D boxes (x,y,z,dx,dy,dz,yaw);
    for 7-dof boxes the BEV footprint uses dims[3:5] and the last column as
    yaw.
    """
    if boxes.shape[-1] >= 7:
        cx, cy = boxes[:, 0], boxes[:, 1]
        dx, dy = boxes[:, 3], boxes[:, 4]
    else:
        cx, cy = boxes[:, 0], boxes[:, 1]
        dx, dy = boxes[:, 2], boxes[:, 3]
    yaw = boxes[:, -1]
    # CCW unit square centered at origin
    ux = jnp.array([-0.5, 0.5, 0.5, -0.5], boxes.dtype)
    uy = jnp.array([-0.5, -0.5, 0.5, 0.5], boxes.dtype)
    x = ux[None, :] * dx[:, None]
    y = uy[None, :] * dy[:, None]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rx = c[:, None] * x - s[:, None] * y + cx[:, None]
    ry = s[:, None] * x + c[:, None] * y + cy[:, None]
    return jnp.stack([rx, ry], axis=-1)


def corners_bev_area(corners: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of [..., V, 2] CCW polygons."""
    x, y = corners[..., 0], corners[..., 1]
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.abs(jnp.sum(x * yn - xn * y, axis=-1))


def rotation_3d_in_axis(points: jnp.ndarray, angles: jnp.ndarray,
                        axis: int = 2) -> jnp.ndarray:
    """Rotate [N, P, 3] points by per-row angles about a coordinate axis."""
    c, s = jnp.cos(angles), jnp.sin(angles)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    if axis in (2, -1):
        rot = jnp.stack([c, s, zero, -s, c, zero, zero, zero, one], -1)
    elif axis == 1:
        rot = jnp.stack([c, zero, -s, zero, one, zero, s, zero, c], -1)
    elif axis == 0:
        rot = jnp.stack([one, zero, zero, zero, c, s, zero, -s, c], -1)
    else:
        raise ValueError("bad axis")
    rot = rot.reshape(-1, 3, 3)
    return jnp.einsum("npj,njk->npk", points, rot)


def boxes_to_corners_3d(boxes: jnp.ndarray,
                        origin=(0.5, 0.5, 0.5)) -> jnp.ndarray:
    """[N,7] boxes -> [N,8,3] corners (same corner order as the host
    BBoxes3D.corners_3d)."""
    dims = boxes[:, 3:6]
    ux = jnp.array([0., 0., 0., 0., 1., 1., 1., 1.], boxes.dtype)
    uy = jnp.array([0., 0., 1., 1., 0., 0., 1., 1.], boxes.dtype)
    uz = jnp.array([0., 1., 1., 0., 0., 1., 1., 0.], boxes.dtype)
    unit = jnp.stack([ux, uy, uz], axis=-1)
    org = jnp.asarray(origin, boxes.dtype)
    corners = (unit[None] - org[None, None]) * dims[:, None, :]
    corners = rotation_3d_in_axis(corners, boxes[:, 6], axis=2)
    return corners + boxes[:, None, 0:3]


def center_to_corner_box2d(centers, dims, angles):
    """[N,2] centers, [N,2] dims, [N] angles -> [N,4,2] CCW corners."""
    boxes = jnp.concatenate([centers, dims, angles[:, None]], axis=-1)
    return boxes_to_corners_bev(boxes)


def second_box_encode(boxes: jnp.ndarray,
                      anchors: jnp.ndarray,
                      encode_angle_to_vector: bool = False,
                      smooth_dim: bool = False) -> jnp.ndarray:
    """SECOND residual encoding, jax version (see geometries/bbox.py)."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, wg, lg, hg, rg = jnp.split(boxes[..., :7], 7, axis=-1)
    diag = jnp.sqrt(la**2 + wa**2)
    xt = (xg - xa) / diag
    yt = (yg - ya) / diag
    zt = (zg - za) / ha
    if smooth_dim:
        wt, lt, ht = wg / wa - 1, lg / la - 1, hg / ha - 1
    else:
        wt = jnp.log(jnp.maximum(wg, 1e-6) / wa)
        lt = jnp.log(jnp.maximum(lg, 1e-6) / la)
        ht = jnp.log(jnp.maximum(hg, 1e-6) / ha)
    if encode_angle_to_vector:
        return jnp.concatenate([
            xt, yt, zt, wt, lt, ht,
            jnp.cos(rg) - jnp.cos(ra),
            jnp.sin(rg) - jnp.sin(ra)
        ], axis=-1)
    return jnp.concatenate([xt, yt, zt, wt, lt, ht, rg - ra], axis=-1)


def second_box_decode(encodings: jnp.ndarray,
                      anchors: jnp.ndarray,
                      encode_angle_to_vector: bool = False,
                      smooth_dim: bool = False) -> jnp.ndarray:
    """Inverse of second_box_encode, jax version."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    if encode_angle_to_vector:
        xt, yt, zt, wt, lt, ht, rtc, rts = jnp.split(encodings, 8, axis=-1)
    else:
        xt, yt, zt, wt, lt, ht, rt = jnp.split(encodings, 7, axis=-1)
    diag = jnp.sqrt(la**2 + wa**2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    if smooth_dim:
        wg, lg, hg = (wt + 1) * wa, (lt + 1) * la, (ht + 1) * ha
    else:
        wg, lg, hg = jnp.exp(wt) * wa, jnp.exp(lt) * la, jnp.exp(ht) * ha
    if encode_angle_to_vector:
        rg = jnp.arctan2(rts + jnp.sin(ra), rtc + jnp.cos(ra))
    else:
        rg = rt + ra
    return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg], axis=-1)
