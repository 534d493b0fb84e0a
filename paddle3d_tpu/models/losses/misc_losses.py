"""General-purpose loss library (reference: paddle3d/models/losses/
focal_loss.py, iou_loss.py, disentangled_box3d_loss.py,
cross_entropy_loss.py — same semantics, pure jnp, fixed shapes with
explicit weight masks instead of boolean indexing).
"""
import jax
import jax.numpy as jnp

from ...apis import manager

__all__ = [
    "FocalLoss", "WeightedCrossEntropyLoss", "IoULoss", "GIoULoss",
    "DisentangledBox3DLoss", "binary_focal_loss", "giou_2d",
]


def binary_focal_loss(logits, targets, gamma: float = 2.0,
                      alpha: float = 0.25):
    """Sigmoid focal loss, elementwise (reference: focal_loss.py)."""
    p = jax.nn.sigmoid(logits)
    ce = (jnp.clip(logits, 0) - logits * targets +
          jnp.log1p(jnp.exp(-jnp.abs(logits))))
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


@manager.LOSSES.add_component
class FocalLoss:
    """Multi-class sigmoid focal loss over one-hot targets."""

    def __init__(self, gamma: float = 2.0, alpha: float = 0.25,
                 loss_weight: float = 1.0):
        self.gamma = gamma
        self.alpha = alpha
        self.loss_weight = loss_weight

    def __call__(self, logits, labels, weights=None, avg_factor=None):
        """logits [..., C]; labels [...] int (-1 = ignore)."""
        num_classes = logits.shape[-1]
        valid = labels >= 0
        onehot = jax.nn.one_hot(jnp.clip(labels, 0), num_classes,
                                dtype=logits.dtype)
        onehot = onehot * valid[..., None].astype(logits.dtype)
        loss = binary_focal_loss(logits, onehot, self.gamma, self.alpha)
        loss = jnp.sum(loss, axis=-1) * valid.astype(logits.dtype)
        if weights is not None:
            loss = loss * weights
        denom = avg_factor if avg_factor is not None else jnp.maximum(
            jnp.sum(valid), 1)
        return self.loss_weight * jnp.sum(loss) / denom


@manager.LOSSES.add_component
class WeightedCrossEntropyLoss:
    """Per-element softmax CE with optional class weights
    (reference: cross_entropy_loss.py)."""

    def __init__(self, class_weights=None, loss_weight: float = 1.0):
        self.class_weights = class_weights
        self.loss_weight = loss_weight

    def __call__(self, logits, labels, weights=None):
        num_classes = logits.shape[-1]
        valid = labels >= 0
        onehot = jax.nn.one_hot(jnp.clip(labels, 0), num_classes,
                                dtype=logits.dtype)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.sum(onehot * logp, axis=-1)
        if self.class_weights is not None:
            cw = jnp.asarray(self.class_weights, logits.dtype)
            ce = ce * cw[jnp.clip(labels, 0)]
        ce = ce * valid.astype(logits.dtype)
        if weights is not None:
            ce = ce * weights
        return self.loss_weight * jnp.sum(ce) / jnp.maximum(
            jnp.sum(valid), 1)


def _box2d_area(b):
    return jnp.maximum(b[..., 2] - b[..., 0], 0) * \
        jnp.maximum(b[..., 3] - b[..., 1], 0)


def giou_2d(pred, target):
    """GIoU for [x1,y1,x2,y2] boxes (reference: iou_loss.py)."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    inter = jnp.prod(jnp.maximum(rb - lt, 0), axis=-1)
    union = _box2d_area(pred) + _box2d_area(target) - inter
    iou = inter / jnp.maximum(union, 1e-7)
    lt_c = jnp.minimum(pred[..., :2], target[..., :2])
    rb_c = jnp.maximum(pred[..., 2:], target[..., 2:])
    hull = jnp.prod(jnp.maximum(rb_c - lt_c, 0), axis=-1)
    return iou - (hull - union) / jnp.maximum(hull, 1e-7)


@manager.LOSSES.add_component
class IoULoss:
    def __init__(self, loss_weight: float = 1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weights=None):
        lt = jnp.maximum(pred[..., :2], target[..., :2])
        rb = jnp.minimum(pred[..., 2:], target[..., 2:])
        inter = jnp.prod(jnp.maximum(rb - lt, 0), axis=-1)
        union = _box2d_area(pred) + _box2d_area(target) - inter
        iou = inter / jnp.maximum(union, 1e-7)
        loss = -jnp.log(jnp.maximum(iou, 1e-7))
        if weights is not None:
            loss = loss * weights
            return self.loss_weight * jnp.sum(loss) / jnp.maximum(
                jnp.sum(weights), 1e-7)
        return self.loss_weight * jnp.mean(loss)


@manager.LOSSES.add_component
class GIoULoss:
    def __init__(self, loss_weight: float = 1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weights=None):
        loss = 1.0 - giou_2d(pred, target)
        if weights is not None:
            loss = loss * weights
            return self.loss_weight * jnp.sum(loss) / jnp.maximum(
                jnp.sum(weights), 1e-7)
        return self.loss_weight * jnp.mean(loss)


@manager.LOSSES.add_component
class DisentangledBox3DLoss:
    """DD3D's disentangled 3D box loss (reference:
    disentangled_box3d_loss.py): for each group of predicted box parameters
    (orientation / projected center / depth / dims), build a box from the
    predicted group + gt for all other groups and L1 against the gt
    corners. Boxes here are (x, y, z, w, l, h, yaw) in camera space; corner
    extraction is the standard 8-corner expansion."""

    def __init__(self, loss_weight: float = 1.0, smooth_l1_beta: float = 0.05):
        self.loss_weight = loss_weight
        self.beta = smooth_l1_beta

    @staticmethod
    def _corners(boxes):
        x, y, z, w, l, h, yaw = [boxes[..., i] for i in range(7)]
        dx = jnp.stack([l, l, -l, -l, l, l, -l, -l], -1) / 2
        dy = jnp.stack([h, h, h, h, -h, -h, -h, -h], -1) / 2
        dz = jnp.stack([w, -w, -w, w, w, -w, -w, w], -1) / 2
        c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
        rx = c * dx + s * dz
        rz = -s * dx + c * dz
        return jnp.stack([x[..., None] + rx, y[..., None] + dy,
                          z[..., None] + rz], axis=-1)  # [..., 8, 3]

    def __call__(self, pred, target, weights=None):
        groups = [slice(0, 2), slice(2, 3), slice(3, 6), slice(6, 7)]
        total = 0.
        for g in groups:
            mixed = target.at[..., g].set(pred[..., g])
            diff = jnp.abs(self._corners(mixed) - self._corners(target))
            l1 = jnp.where(diff < self.beta, 0.5 * diff * diff / self.beta,
                           diff - 0.5 * self.beta)
            per_box = jnp.mean(l1, axis=(-1, -2))
            if weights is not None:
                per_box = per_box * weights
                total = total + jnp.sum(per_box) / jnp.maximum(
                    jnp.sum(weights), 1e-7)
            else:
                total = total + jnp.mean(per_box)
        return self.loss_weight * total
