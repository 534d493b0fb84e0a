"""PETRv2 BEV segmentation head (reference:
paddle3d/models/heads/dense_heads/petr_head_seg.py and the
petrv2_BEVseg configs — seg queries anchored at fixed BEV patch centers
cross-attend to 3D-position-embedded camera tokens; each query decodes one
patch of the BEV semantic map).

TPU-native notes: the patch grid is static, the whole head is one jittable
decode (no dynamic mask assembly), and the map is reassembled with static
reshapes/transposes.
"""
import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from .petr_head import PETRHead, pos2posemb3d

__all__ = ["PETRSegHead"]


@manager.HEADS.add_component
class PETRSegHead(PETRHead):
    """`bev_size` BEV cells split into (bev/patch)^2 queries, one per patch.

    gt batch key: `gt_semantic_map` [B, bev_h, bev_w, num_classes] in {0,1}.
    """

    def __init__(self,
                 num_classes: int = 3,
                 bev_size=(256, 256),
                 patch_size: int = 16,
                 seg_weight: float = 1.0,
                 **kwargs):
        bev_h, bev_w = bev_size
        assert bev_h % patch_size == 0 and bev_w % patch_size == 0
        ph, pw = bev_h // patch_size, bev_w // patch_size
        super().__init__(num_classes=num_classes, num_query=ph * pw,
                         **kwargs)
        self.bev_h, self.bev_w = int(bev_h), int(bev_w)
        self.patch_size = int(patch_size)
        self.seg_weight = float(seg_weight)
        rngs = nnx.Rngs(0)
        self.seg_branch = nnx.Sequential(
            nnx.Linear(self.embed_dims, self.embed_dims, rngs=rngs),
            nnx.relu,
            nnx.Linear(self.embed_dims,
                       patch_size * patch_size * num_classes, rngs=rngs))

    def _patch_centers(self):
        """Fixed reference points at patch centers in [0,1]^3 (z = 0.5)."""
        ph = self.bev_h // self.patch_size
        pw = self.bev_w // self.patch_size
        ys = (jnp.arange(ph, dtype=jnp.float32) + 0.5) / ph
        xs = (jnp.arange(pw, dtype=jnp.float32) + 0.5) / pw
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        return jnp.stack(
            [gx.reshape(-1), gy.reshape(-1),
             jnp.full((ph * pw,), 0.5)], axis=-1)  # [Q, 3]

    def __call__(self, feats, img2lidars):
        """feats [B, N, h, w, Cin] -> seg logits [B, bev_h, bev_w, ncls]."""
        b, n, h, w, _ = feats.shape
        x = self.input_proj(feats)
        pe = self._position_embedding(x, img2lidars)
        tokens = x.reshape(b, n * h * w, self.embed_dims)
        key_pos = pe.reshape(b, n * h * w, self.embed_dims)

        ref = self._patch_centers()
        q_pos = self.query_embedding(
            pos2posemb3d(ref, self.embed_dims // 2))  # [Q, C]
        q_pos = jnp.broadcast_to(q_pos[None], (b,) + q_pos.shape)
        query = jnp.zeros((b, self.num_query, self.embed_dims))
        inter = self.decoder(query, key=tokens, value=tokens,
                             query_pos=q_pos, key_pos=key_pos)  # [L,B,Q,C]
        logits = self.seg_branch(inter[-1])  # [B, Q, p*p*ncls]

        p = self.patch_size
        ph, pw = self.bev_h // p, self.bev_w // p
        ncls = self.num_classes
        logits = logits.reshape(b, ph, pw, p, p, ncls)
        logits = logits.transpose(0, 1, 3, 2, 4, 5)
        return logits.reshape(b, self.bev_h, self.bev_w, ncls)

    def loss(self, seg_logits, gt_semantic_map) -> dict:
        """Class-balanced BCE + dice (reference petr_head_seg loss mix)."""
        gt = gt_semantic_map.astype(seg_logits.dtype)
        bce = (jnp.clip(seg_logits, 0) - seg_logits * gt +
               jnp.log1p(jnp.exp(-jnp.abs(seg_logits))))
        pos = gt > 0.5
        n_pos = jnp.maximum(jnp.sum(pos), 1)
        n_neg = jnp.maximum(jnp.sum(~pos), 1)
        bce_loss = (jnp.sum(jnp.where(pos, bce, 0.)) / n_pos +
                    jnp.sum(jnp.where(~pos, bce, 0.)) / n_neg)
        prob = jax.nn.sigmoid(seg_logits)
        inter = jnp.sum(prob * gt, axis=(1, 2))
        denom = jnp.sum(prob, axis=(1, 2)) + jnp.sum(gt, axis=(1, 2))
        dice = 1.0 - jnp.mean((2 * inter + 1.0) / (denom + 1.0))
        total = self.seg_weight * (bce_loss + dice)
        return {"loss_seg_bce": self.seg_weight * bce_loss,
                "loss_seg_dice": self.seg_weight * dice,
                "loss_seg": total}

    def predict(self, seg_logits) -> dict:
        return {"seg_probs": jax.nn.sigmoid(seg_logits)}
