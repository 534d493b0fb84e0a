"""Weighted classification/regression losses
(reference: paddle3d/models/detection/pointpillars/pointpillars_loss.py:168,229,283
and paddle3d/models/losses/focal_loss.py).

Stateless jax callables; registered in LOSSES so YAML configs can build them.
"""
import jax
import jax.numpy as jnp

from ...apis import manager

__all__ = [
    "SigmoidFocalClassificationLoss", "WeightedSmoothL1RegressionLoss",
    "WeightedSoftmaxClassificationLoss", "sigmoid_focal_loss",
    "smooth_l1_loss",
]


def sigmoid_focal_loss(logits, targets, gamma: float = 2.0,
                       alpha: float = 0.25):
    """Elementwise sigmoid focal CE; targets are {0,1} same shape as logits."""
    targets = targets.astype(logits.dtype)
    ce = jnp.clip(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    prob = jax.nn.sigmoid(logits)
    p_t = targets * prob + (1 - targets) * (1 - prob)
    mod = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    alpha_w = (targets * alpha + (1 - targets) *
               (1 - alpha)) if alpha is not None else 1.0
    return mod * alpha_w * ce


def smooth_l1_loss(pred, target, sigma: float = 3.0):
    """Elementwise smooth L1 with transition at 1/sigma^2."""
    diff = pred - target
    abs_diff = jnp.abs(diff)
    lt = (abs_diff <= 1.0 / sigma**2).astype(pred.dtype)
    return lt * 0.5 * (abs_diff * sigma)**2 + (1 - lt) * (
        abs_diff - 0.5 / sigma**2)


@manager.LOSSES.add_component
class SigmoidFocalClassificationLoss:
    def __init__(self, gamma: float = 2.0, alpha: float = 0.25):
        self.gamma = gamma
        self.alpha = alpha

    def __call__(self, prediction, target, weights):
        """prediction/target [B,A,C], weights [B,A] -> [B,A,C]."""
        loss = sigmoid_focal_loss(prediction, target, self.gamma, self.alpha)
        return loss * weights[..., None]


@manager.LOSSES.add_component
class WeightedSmoothL1RegressionLoss:
    def __init__(self, sigma: float = 3.0, code_weights=None,
                 codewise: bool = True):
        self.sigma = sigma
        self.code_weights = code_weights
        self.codewise = codewise

    def __call__(self, prediction, target, weights=None):
        diff_scale = (jnp.asarray(self.code_weights, prediction.dtype)
                      if self.code_weights is not None else None)
        pred, tgt = prediction, target
        if diff_scale is not None:
            pred = pred * diff_scale
            tgt = tgt * diff_scale
        loss = smooth_l1_loss(pred, tgt, self.sigma)
        if self.codewise:
            if weights is not None:
                loss = loss * weights[..., None]
            return loss
        loss = jnp.sum(loss, axis=-1)
        if weights is not None:
            loss = loss * weights
        return loss


@manager.LOSSES.add_component
class WeightedSoftmaxClassificationLoss:
    def __init__(self, logit_scale: float = 1.0):
        self.logit_scale = logit_scale

    def __call__(self, prediction, target, weights=None):
        """prediction [B,A,C] logits, target [B,A] int labels, weights [B,A]."""
        logits = prediction / self.logit_scale
        logp = jax.nn.log_softmax(logits, axis=-1)
        # one-hot select, not take_along_axis: XLA lowers the per-row
        # gather at ~16 GB/s on TPU (10 ms of the PointPillars train
        # forward for C=2); the masked sum is a pure vector op
        oh = jax.nn.one_hot(target.astype(jnp.int32), logp.shape[-1],
                            dtype=logp.dtype)
        nll = -jnp.sum(logp * oh, axis=-1)
        if weights is not None:
            nll = nll * weights
        return nll
