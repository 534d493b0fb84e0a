"""On-device CenterPoint target generation.

TPU-native replacement for the host-side Gt2CenterPointTarget transform
(reference: paddle3d/transforms/target_generator.py:345): gaussian heatmaps,
center indices and regression targets are computed inside the jitted train
step from padded gt arrays — fixed shapes, vmapped over the batch, gaussian
splatting vectorized in object chunks with an elementwise-max accumulator
(instead of the reference's per-object numpy window writes).
"""
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CenterPointTargetGenerator"]

_CHUNK = 32


def gaussian_radius(height, width, min_overlap=0.5):
    """CornerNet radius rule, elementwise (reference: target_generator.py:378)."""
    a1 = 1.
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.))) / 2

    a2 = 4.
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.))) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.))) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class CenterPointTargetGenerator:
    def __init__(self,
                 tasks: Sequence[dict],
                 down_ratio: int,
                 point_cloud_range: Sequence[float],
                 voxel_size: Sequence[float],
                 gaussian_overlap: float = 0.1,
                 max_objs: int = 500,
                 min_radius: int = 2,
                 with_velocity: bool = False,
                 num_all_classes: int = None):
        self.tasks = tasks
        self.down_ratio = down_ratio
        self.gaussian_overlap = gaussian_overlap
        self.max_objs = max_objs
        self.min_radius = min_radius
        self.with_velocity = with_velocity
        self.vx, self.vy = float(voxel_size[0]), float(voxel_size[1])
        self.x_min, self.y_min = float(point_cloud_range[0]), float(
            point_cloud_range[1])
        gx = int(round((point_cloud_range[3] - point_cloud_range[0]) /
                       self.vx))
        gy = int(round((point_cloud_range[4] - point_cloud_range[1]) /
                       self.vy))
        self.fm_w = gx // down_ratio
        self.fm_h = gy // down_ratio

        # static per-task class maps: global label -> local channel (or -1)
        all_names = [n for t in tasks for n in t["class_names"]]
        if num_all_classes is None:
            num_all_classes = len(all_names)
        self.task_maps = []
        offset = 0
        for t in tasks:
            m = np.full(num_all_classes + 1, -1, np.int32)  # +1 pad slot
            for local, _ in enumerate(t["class_names"]):
                m[offset + local] = local
            self.task_maps.append(m)
            offset += len(t["class_names"])

    def __call__(self, gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray):
        """gt_boxes [B, G, 7(+2 vel cols 7:9)], bottom-z convention;
        gt_labels [B, G] with -1 padding.
        Returns per-task lists of (heatmap [B,H,W,C], target_bbox [B,M,D],
        center_idx [B,M], mask [B,M], label [B,M])."""
        outs = []
        for task_id, task in enumerate(self.tasks):
            num_cls = len(task["class_names"])
            cls_map = jnp.asarray(self.task_maps[task_id])
            fn = functools.partial(self._single, cls_map=cls_map,
                                   num_cls=num_cls)
            outs.append(jax.vmap(fn)(gt_boxes, gt_labels))
        return outs

    def _single(self, boxes, labels, *, cls_map, num_cls):
        g = boxes.shape[0]
        m = self.max_objs
        safe_labels = jnp.where(labels >= 0, labels, cls_map.shape[0] - 1)
        local_cls = cls_map[safe_labels]  # [G], -1 if not in task
        member = local_cls >= 0

        # compact member boxes into the first slots (stable)
        order = jnp.argsort(jnp.where(member, 0, 1), stable=True)
        take = order[:m] if g >= m else jnp.pad(order, (0, m - g))
        # members were sorted to the front, so slot i holds a member iff
        # i < member count
        slot_valid = jnp.arange(m) < jnp.sum(member.astype(jnp.int32))
        sb = boxes[take]  # [M, 7+]
        scls = local_cls[take]

        # feature-map geometry
        w_fm = sb[:, 3] / self.vx / self.down_ratio
        l_fm = sb[:, 4] / self.vy / self.down_ratio
        cx = (sb[:, 0] - self.x_min) / self.vx / self.down_ratio
        cy = (sb[:, 1] - self.y_min) / self.vy / self.down_ratio
        cx_int = jnp.floor(cx).astype(jnp.int32)
        cy_int = jnp.floor(cy).astype(jnp.int32)
        in_bounds = ((cx_int >= 0) & (cx_int < self.fm_w) & (cy_int >= 0)
                     & (cy_int < self.fm_h))
        valid = slot_valid & in_bounds & (w_fm > 0) & (l_fm > 0)

        radius = gaussian_radius(l_fm, w_fm, self.gaussian_overlap)
        radius = jnp.maximum(self.min_radius,
                             jnp.floor(radius).astype(jnp.int32))

        heatmap = self._splat(cx_int, cy_int, radius, scls, valid, num_cls)

        # regression targets
        z_center = sb[:, 2] + sb[:, 5] / 2  # bottom -> center z
        angle = sb[:, 6]  # gt layout: (x,y,zb,w,l,h,yaw[,vx,vy])
        parts = [
            (cx - cx_int)[:, None], (cy - cy_int)[:, None], z_center[:, None],
            jnp.log(jnp.maximum(sb[:, 3:6], 1e-4)),
        ]
        if self.with_velocity:
            parts.append(sb[:, 7:9])
        parts.extend([jnp.sin(angle)[:, None], jnp.cos(angle)[:, None]])
        target_bbox = jnp.concatenate(parts, axis=-1)
        target_bbox = jnp.where(valid[:, None], target_bbox, 0.)

        center_idx = jnp.where(valid, cy_int * self.fm_w + cx_int, 0)
        label = jnp.where(valid, scls, 0)
        return heatmap, target_bbox, center_idx, valid, label

    def _splat(self, cx_int, cy_int, radius, cls, valid, num_cls):
        """Max-accumulate per-object gaussians onto [H, W, C]."""
        h, w = self.fm_h, self.fm_w
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        m = cx_int.shape[0]
        pad = (-m) % _CHUNK
        def pad0(x):
            return jnp.pad(x, (0, pad))
        cx_int, cy_int = pad0(cx_int), pad0(cy_int)
        radius, cls = pad0(radius), pad0(cls)
        valid = jnp.pad(valid, (0, pad))
        n_chunks = (m + pad) // _CHUNK

        def body(hm, chunk):
            ccx, ccy, cr, ccls, cvalid = chunk
            dx = xs[None] - ccx[:, None, None].astype(jnp.float32)
            dy = ys[None] - ccy[:, None, None].astype(jnp.float32)
            sigma = (2 * cr.astype(jnp.float32) + 1) / 6.
            g = jnp.exp(-(dx**2 + dy**2) /
                        (2 * sigma[:, None, None]**2))  # [K, H, W]
            window = ((jnp.abs(dx) <= cr[:, None, None]) &
                      (jnp.abs(dy) <= cr[:, None, None]) &
                      cvalid[:, None, None])
            g = jnp.where(window, g, 0.)
            onehot = jax.nn.one_hot(ccls, num_cls, dtype=g.dtype)  # [K, C]
            per_cls = jnp.max(g[:, :, :, None] * onehot[:, None, None, :],
                              axis=0)  # [H, W, C]
            return jnp.maximum(hm, per_cls), None

        chunks = jax.tree.map(
            lambda x: x.reshape(n_chunks, _CHUNK, *x.shape[1:]),
            (cx_int, cy_int, radius, cls, valid))
        hm0 = jnp.zeros((h, w, num_cls), jnp.float32)
        hm, _ = jax.lax.scan(body, hm0, chunks)
        return hm
