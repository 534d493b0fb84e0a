"""Query denoising (DN) training for DETR-style 3D heads.

TPU-native re-design of the reference's CAPETemporalDNHead machinery
(reference: paddle3d/models/heads/dense_heads/cape_dn_head.py:47 —
`prepare_for_dn`: noisy GT queries in G groups with positive/negative
halves, label flipping, and the DN attention mask; `dn_loss_single`: known
assignment losses). All shapes are static: every sample contributes
`groups * max_gt * 2` DN queries, invalid gt slots masked.

Layout of the concatenated query axis: [matching (num_query) | DN groups].
Mask semantics follow flax attention (True = allowed):
  * matching queries may not attend to any DN query;
  * a DN query attends to the matching part and its own group only.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["DenoisingConfig", "build_dn_queries", "dn_attn_mask", "dn_loss"]


class DenoisingConfig(NamedTuple):
    groups: int = 3                 # reference `scalar` group count
    box_noise_scale: float = 0.4    # center jitter (fraction of box dims)
    label_noise_ratio: float = 0.2  # P(flip a positive query's label)
    negative: bool = True           # second half per group = negatives


def dn_attn_mask(num_query: int, groups: int, group_size: int) -> jnp.ndarray:
    """-> [Qt, Qt] bool, True = may attend (flax convention).

    (reference: cape_dn_head.py attn_mask construction — there True=blocked;
    inverted here for nnx.MultiHeadAttention.)
    """
    qt = num_query + groups * group_size
    idx = jnp.arange(qt)
    # group id: -1 for matching queries
    gid = jnp.where(idx < num_query, -1,
                    (idx - num_query) // max(group_size, 1))
    row = gid[:, None]
    col = gid[None, :]
    allowed = jnp.where(
        row < 0,
        col < 0,                       # matching sees matching only
        (col < 0) | (col == row))      # DN sees matching + own group
    return allowed


def build_dn_queries(key, gt_boxes, gt_labels, num_classes: int,
                     pc_range, cfg: DenoisingConfig):
    """gt_boxes [B, G, >=7] (center-z), gt_labels [B, G] (-1 pad) ->
    dict with:
      ref      [B, Qdn, 3]  noisy reference points in [0, 1]
      labels   [B, Qdn]     target labels (num_classes = background)
      pos      [B, Qdn]     positive-query mask (reconstruct the gt box)
      valid    [B, Qdn]     real (non-pad) query mask
      gt_idx   [B, Qdn]     source gt slot per query
    Qdn = groups * G * (2 if cfg.negative else 1).
    """
    b, g = gt_labels.shape
    reps = cfg.groups * (2 if cfg.negative else 1)
    pc = jnp.asarray(pc_range, jnp.float32)
    extent = pc[3:] - pc[:3]

    k_center, k_label, k_flip = jax.random.split(key, 3)
    centers = gt_boxes[..., :3]
    dims = gt_boxes[..., 3:6]
    gt_valid = gt_labels >= 0

    # [B, reps, G, 3] center noise; positives jitter within
    # box_noise_scale * dim / 2, negatives push out to (1, 2] * dim / 2
    # (reference cape_dn_head known_bbox_expand split)
    u = jax.random.uniform(k_center, (b, reps, g, 3), minval=-1.,
                           maxval=1.)
    rep_id = jnp.arange(reps)
    is_neg = (rep_id % 2 == 1) if cfg.negative else jnp.zeros(
        (reps,), bool)
    mag = jnp.where(is_neg[None, :, None, None],
                    (1.0 + jnp.abs(u)),        # (1, 2] x half-dim
                    cfg.box_noise_scale * u)   # small jitter
    sign = jnp.where(is_neg[None, :, None, None], jnp.sign(u) + (u == 0),
                     1.0)
    noise = mag * sign * (dims[:, None] / 2.)
    noisy = centers[:, None] + noise
    ref = (noisy - pc[:3]) / extent
    ref = jnp.clip(ref, 1e-3, 1 - 1e-3)

    # label noise on positives only
    flip = jax.random.uniform(k_flip, (b, reps, g)) < cfg.label_noise_ratio
    rand_lab = jax.random.randint(k_label, (b, reps, g), 0, num_classes)
    lab = jnp.broadcast_to(gt_labels[:, None], (b, reps, g))
    lab = jnp.where(flip & ~is_neg[None, :, None], rand_lab, lab)
    lab = jnp.where(is_neg[None, :, None], num_classes, lab)
    lab = jnp.where(gt_valid[:, None], lab, num_classes)

    pos = (~is_neg[None, :, None]) & gt_valid[:, None]
    valid = jnp.broadcast_to(gt_valid[:, None], (b, reps, g))
    gt_idx = jnp.broadcast_to(jnp.arange(g)[None, None], (b, reps, g))

    qdn = reps * g
    return {
        "ref": ref.reshape(b, qdn, 3),
        "labels": lab.reshape(b, qdn).astype(jnp.int32),
        "pos": pos.reshape(b, qdn),
        "valid": valid.reshape(b, qdn),
        "gt_idx": gt_idx.reshape(b, qdn).astype(jnp.int32),
        "group_size": g * (2 if cfg.negative else 1),
        "groups": cfg.groups,
    }


def dn_loss(dn_cls, dn_bbox_enc, dn_meta, gt_enc, code_weights,
            num_classes: int):
    """Known-assignment DN losses (reference: cape_dn_head.py
    dn_loss_single): focal cls on every valid DN query (positives -> their
    gt label possibly flipped target = TRUE label; negatives/pads ->
    background) and L1 box on positives only.

    dn_cls [L, B, Qdn, ncls]; dn_bbox_enc [L, B, Qdn, code];
    gt_enc [B, G, code] encoded gt targets.
    """
    cw = jnp.asarray(code_weights)
    labels = dn_meta["labels"]
    pos = dn_meta["pos"]
    valid = dn_meta["valid"]
    gt_idx = dn_meta["gt_idx"]
    tgt = jnp.take_along_axis(gt_enc, gt_idx[..., None], axis=1)

    onehot = jax.nn.one_hot(labels, num_classes + 1)[..., :num_classes]
    n_pos = jnp.maximum(jnp.sum(pos), 1)
    total_cls = 0.
    total_reg = 0.
    for lvl in range(dn_cls.shape[0]):
        ce = _sigmoid_focal(dn_cls[lvl], onehot)
        total_cls = total_cls + jnp.sum(
            jnp.where(valid[..., None], ce, 0.)) / n_pos
        l1 = jnp.abs(dn_bbox_enc[lvl] - tgt) * cw
        total_reg = total_reg + jnp.sum(
            jnp.where(pos[..., None], l1, 0.)) / n_pos
    return total_cls, total_reg


def _sigmoid_focal(logits, targets, alpha=0.25, gamma=2.0):
    p = jax.nn.sigmoid(logits)
    ce = jnp.clip(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce
