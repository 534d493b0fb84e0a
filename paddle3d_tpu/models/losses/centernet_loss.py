"""CenterNet-style losses for CenterHead
(reference: paddle3d/models/losses/focal_loss.py:66 FastFocalLoss,
reg_loss.py:24 RegLoss).
"""
import jax.numpy as jnp

from ...apis import manager

__all__ = ["FastFocalLoss", "RegLoss", "L1Loss", "gather_feat"]


def gather_feat(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """feat [B, H*W, C], ind [B, M] -> [B, M, C]."""
    return jnp.take_along_axis(feat, ind[..., None], axis=1)


@manager.LOSSES.add_component
class FastFocalLoss:
    """Penalty-reduced pixelwise focal loss (CornerNet form)."""

    def __call__(self, out, target, ind, mask, cat):
        """out/target: [B, H, W, C] (NHWC); ind/mask/cat: [B, M]."""
        b, h, w, c = out.shape
        mask = mask.astype(out.dtype)
        gt_weight = jnp.power(1 - target, 4)
        neg_loss = jnp.sum(jnp.log(1 - out) * jnp.power(out, 2) * gt_weight)

        flat = out.reshape(b, h * w, c)
        pos_pix = gather_feat(flat, ind)  # [B, M, C]
        pos_pred = jnp.take_along_axis(pos_pix, cat[..., None],
                                       axis=2)[..., 0]  # [B, M]
        num_pos = jnp.sum(mask)
        pos_loss = jnp.sum(
            jnp.log(pos_pred) * jnp.power(1 - pos_pred, 2) * mask)
        return jnp.where(num_pos == 0, -neg_loss,
                         -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.))


@manager.LOSSES.add_component
class RegLoss:
    """Masked L1 at object center indices, per-channel
    (reference: reg_loss.py:24)."""

    def __call__(self, output, mask, ind, target):
        """output [B, H, W, C]; mask/ind [B, M]; target [B, M, C] ->
        per-channel loss [C]."""
        b, h, w, c = output.shape
        pred = gather_feat(output.reshape(b, h * w, c), ind)  # [B, M, C]
        fmask = mask.astype(output.dtype)[..., None]
        loss = jnp.abs(pred * fmask - target * fmask)
        loss = loss / (jnp.sum(fmask) + 1e-4)
        return jnp.sum(loss, axis=(0, 1))  # [C]


@manager.LOSSES.add_component
class L1Loss:
    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None):
        loss = jnp.abs(pred - target)
        if weight is not None:
            loss = loss * weight
        if self.reduction == "mean":
            loss = jnp.mean(loss)
        elif self.reduction == "sum":
            loss = jnp.sum(loss)
        return self.loss_weight * loss
