"""SMOKE loss (reference: paddle3d/models/detection/smoke/smoke_loss.py:35).

Penalty-reduced focal on the class heatmap + disentangled L1 on 3D box
corners: each regression group (orientation / dimensions / location) is
decoded with the other two taken from ground truth, and corners compared in
camera space.
"""
import jax.numpy as jnp

from ....apis import manager
from .smoke_coder import SMOKECoder

__all__ = ["SMOKELossComputation"]


def penalty_reduced_focal(pred, target, alpha=2.0, beta=4.0):
    """CornerNet focal: positives where target == 1."""
    pos = (target == 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1 - target, beta)
    pos_loss = jnp.log(pred) * jnp.power(1 - pred, alpha) * pos
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, alpha) * neg_weights * (
        1 - pos)
    num_pos = jnp.sum(pos)
    total = -(jnp.sum(pos_loss) + jnp.sum(neg_loss))
    return jnp.where(num_pos == 0, total, total / jnp.maximum(num_pos, 1.0))


@manager.LOSSES.add_component
class SMOKELossComputation:
    def __init__(self, depth_ref, dim_ref, reg_loss: str = "DisL1",
                 loss_weight=(1., 10.), max_objs: int = 50):
        self.coder = SMOKECoder(depth_ref, dim_ref)
        self.reg_loss = reg_loss
        self.loss_weight = tuple(loss_weight)
        self.max_objs = max_objs

    def __call__(self, pred_heatmap, pred_regression, target: dict) -> dict:
        """pred_heatmap [B,H,W,C] (already sigmoid), pred_regression
        [B,H,W,R]; target arrays from Gt2SmokeTarget (batched)."""
        hm_loss = penalty_reduced_focal(pred_heatmap, target["hm"])

        b, h, w, r = pred_regression.shape
        m = target["proj_p"].shape[1]
        pts = target["proj_p"]  # [B, M, 2] (x, y)
        flat = pred_regression.reshape(b, h * w, r)
        lin = (pts[..., 1] * w + pts[..., 0]).astype(jnp.int32)
        pois = jnp.take_along_axis(flat, lin[..., None], axis=1)  # [B,M,R]
        pois = pois.reshape(b * m, r)

        cls_ids = target["cls_ids"].reshape(-1)
        gt_dims = target["dimensions"].reshape(-1, 3)  # (h, w, l)
        gt_locs = target["locations"].reshape(-1, 3)
        gt_rotys = target["rotys"].reshape(-1)
        mask = target["reg_mask"].reshape(-1).astype(pred_regression.dtype)

        depths = self.coder.decode_depth(pois[:, 0])
        # per-sample K_inv expanded to per-object
        k_inv = jnp.repeat(target["K_inv"], m, axis=0)  # [B*M, 3, 3]
        down = jnp.repeat(target["down_ratio"], m, axis=0)  # [B*M, 2]
        proj = (pts.reshape(-1, 2).astype(pois.dtype) + pois[:, 1:3]) * down
        homo = jnp.concatenate(
            [proj, jnp.ones((proj.shape[0], 1), proj.dtype)], axis=1)
        locs = jnp.einsum("nij,nj->ni", k_inv, homo * depths[:, None])
        dims = self.coder.decode_dimension(cls_ids, pois[:, 3:6])
        locs = locs.at[:, 1].add(dims[:, 0] / 2)  # center -> bottom
        rotys, _ = self.coder.decode_orientation(pois[:, 6:8], gt_locs)

        def corners(ry, dm, lc):
            return self.coder.encode_box3d(ry, dm, lc)

        gt_box = corners(gt_rotys, gt_dims, gt_locs)
        n_valid = jnp.maximum(jnp.sum(mask), 1.0)
        w_mask = mask[:, None, None]

        if self.reg_loss == "DisL1":
            box_ori = corners(rotys, gt_dims, gt_locs)
            box_dim = corners(gt_rotys, dims, gt_locs)
            box_loc = corners(gt_rotys, gt_dims, locs)
            reg = (jnp.sum(jnp.abs(box_ori - gt_box) * w_mask) +
                   jnp.sum(jnp.abs(box_dim - gt_box) * w_mask) +
                   jnp.sum(jnp.abs(box_loc - gt_box) * w_mask)) / n_valid
        else:
            box = corners(rotys, dims, locs)
            reg = jnp.sum(jnp.abs(box - gt_box) * w_mask) / n_valid

        total = self.loss_weight[0] * hm_loss + self.loss_weight[1] * reg / 3.
        return {"loss": total, "hm_loss": hm_loss, "reg_loss": reg}
