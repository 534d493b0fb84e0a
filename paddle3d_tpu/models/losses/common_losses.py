"""mmdet-style loss components (reference: paddle3d/models/losses/
focal_loss.py:266,395, cross_entropy_loss.py:57, smooth_l1_loss.py:60,
weight_loss.py:53,146, sigmoid_ce_loss.py:29).

All follow the reference's call contract: (pred, target, weight=None,
avg_factor=None, reduction_override=None) with reduction ∈
{"none", "mean", "sum"} and a loss_weight scale.
"""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ...apis import manager

__all__ = [
    "WeightedFocalLoss", "GaussianFocalLoss", "CrossEntropyLoss",
    "SmoothL1Loss", "WeightedSmoothL1Loss", "WeightedL1Loss", "SigmoidCeLoss",
]


def _reduce(loss, weight, reduction, avg_factor):
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    # mean
    if avg_factor is not None:
        return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-12)
    if weight is not None:
        return jnp.sum(loss) / jnp.maximum(jnp.sum(weight), 1e-12)
    return jnp.mean(loss)


class _Reducible:
    reduction = "mean"
    loss_weight = 1.0

    def _finish(self, loss, weight, avg_factor, reduction_override):
        reduction = reduction_override or self.reduction
        return self.loss_weight * _reduce(loss, weight, reduction, avg_factor)


@manager.LOSSES.add_component
class WeightedFocalLoss(_Reducible):
    """Sigmoid focal loss (reference focal_loss.py:266). target: int class
    ids with num_classes meaning background, or one-hot [..., C]."""

    def __init__(self, use_sigmoid: bool = True, gamma: float = 2.0,
                 alpha: float = 0.25, reduction: str = "mean",
                 loss_weight: float = 1.0):
        assert use_sigmoid
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        c = pred.shape[-1]
        if target.ndim == pred.ndim - 1:
            onehot = jax.nn.one_hot(target, c, dtype=pred.dtype)
        else:
            onehot = target.astype(pred.dtype)
        p = jax.nn.sigmoid(pred)
        pt = jnp.where(onehot > 0, p, 1.0 - p)
        alpha_t = jnp.where(onehot > 0, self.alpha, 1.0 - self.alpha)
        ce = -jnp.log(jnp.clip(pt, 1e-12))
        loss = alpha_t * ((1.0 - pt) ** self.gamma) * ce
        loss = jnp.sum(loss, axis=-1)
        return self._finish(loss, weight, avg_factor, reduction_override)


@manager.LOSSES.add_component
class GaussianFocalLoss(_Reducible):
    """CornerNet-style focal loss over gaussian heatmaps
    (reference focal_loss.py:395)."""

    def __init__(self, alpha: float = 2.0, gamma: float = 4.0,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        eps = 1e-12
        pos = (target == 1.0).astype(pred.dtype)
        neg_w = (1.0 - target) ** self.gamma
        loss = -(pos * jnp.log(pred + eps) * (1 - pred) ** self.alpha +
                 (1 - pos) * neg_w * jnp.log(1 - pred + eps) *
                 pred ** self.alpha)
        return self._finish(loss, weight, avg_factor, reduction_override)


@manager.LOSSES.add_component
class CrossEntropyLoss(_Reducible):
    """Softmax CE over logits (reference cross_entropy_loss.py:57)."""

    def __init__(self, use_sigmoid: bool = False, reduction: str = "mean",
                 class_weight: Optional[Sequence[float]] = None,
                 loss_weight: float = 1.0):
        assert not use_sigmoid
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        logp = jax.nn.log_softmax(pred, axis=-1)
        nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                                   axis=-1)[..., 0]
        if self.class_weight is not None:
            cw = jnp.asarray(self.class_weight, pred.dtype)
            nll = nll * cw[target]
        return self._finish(nll, weight, avg_factor, reduction_override)


@manager.LOSSES.add_component
class SmoothL1Loss(_Reducible):
    """(reference smooth_l1_loss.py:60)."""

    def __init__(self, beta: float = 1.0, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        d = jnp.abs(pred - target)
        loss = jnp.where(d < self.beta, 0.5 * d * d / self.beta,
                         d - 0.5 * self.beta)
        return self._finish(loss, weight, avg_factor, reduction_override)


@manager.LOSSES.add_component
class WeightedSmoothL1Loss:
    """Code-weighted smooth-L1 over box residuals
    (reference weight_loss.py:53; beta < 1e-5 degrades to L1).
    Returns the per-element loss (callers weight/sum, as in the reference)."""

    def __init__(self, beta: float = 1.0 / 9.0,
                 code_weights: Optional[Sequence[float]] = None):
        self.beta = beta
        self.code_weights = (jnp.asarray(code_weights)
                             if code_weights is not None else None)

    def __call__(self, pred, target, weights=None):
        d = pred - target
        if self.code_weights is not None:
            d = d * self.code_weights.astype(d.dtype)
        n = jnp.abs(d)
        if self.beta < 1e-5:
            loss = n
        else:
            loss = jnp.where(n < self.beta, 0.5 * n * n / self.beta,
                             n - 0.5 * self.beta)
        if weights is not None:
            loss = loss * weights[..., None]
        return loss


@manager.LOSSES.add_component
class WeightedL1Loss(WeightedSmoothL1Loss):
    """(reference weight_loss.py:146)."""

    def __init__(self, code_weights: Optional[Sequence[float]] = None):
        super().__init__(beta=0.0, code_weights=code_weights)


@manager.LOSSES.add_component
class SigmoidCeLoss:
    """BCE with a per-row positive-class reweighting
    (reference sigmoid_ce_loss.py:29 — PETRv2 BEV segmentation loss)."""

    def __init__(self, loss_weight: float = 1.0):
        self.loss_weight = loss_weight

    def __call__(self, inputs, targets):
        t = targets.astype(inputs.dtype)
        pos_weight = (jnp.sum(t == 0, axis=1) /
                      jnp.clip(jnp.sum(t == 1, axis=1), 1.0))
        w = t * pos_weight[:, None] + (1.0 - t)
        logp = jax.nn.log_sigmoid(inputs)
        lognp = jax.nn.log_sigmoid(-inputs)
        bce = -(t * logp + (1.0 - t) * lognp) * w
        return self.loss_weight * jnp.mean(bce)
