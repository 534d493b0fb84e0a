"""CAPE head (reference: paddle3d/models/detection/cape/cape_dn_head.py and
models/layers/cape_transformer.py:757).

Camera-view Position Embedding: instead of PETR's single global 3D PE,
queries attend to each camera separately with position embeddings computed
in that camera's LOCAL frame (key PE from the camera frustum without ego
pose; query PE from reference points transformed into the camera frame),
and the per-camera results are fused by visibility-weighted averaging.
Built as a PETRHead subclass — decoder/branches/loss/predict are shared.
"""
import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from .petr_head import PETRHead, inverse_sigmoid, pos2posemb3d

__all__ = ["CAPEHead"]


@manager.HEADS.add_component
class CAPEHead(PETRHead):
    """`lidar2cams` [B, N, 4, 4] transforms lidar -> per-camera frame."""

    # duck-type flag: the PETR model forwards batch["lidar2cams"] when set
    wants_lidar2cams = True

    def __call__(self, feats, img2lidars, lidar2cams=None, dn_ref=None,
                 attn_mask=None):
        b, n, h, w, _ = feats.shape
        x = self.input_proj(feats)
        pe = self._position_embedding(x, img2lidars)
        tokens = x.reshape(b, n, h * w, self.embed_dims)
        key_pos = pe.reshape(b, n, h * w, self.embed_dims)

        ref = self.query_reference_points(b, dn_ref)  # [B, Qt, 3]
        pc = jnp.asarray(self.pc_range)
        ref_world = ref * (pc[3:] - pc[:3]) + pc[:3]  # [B, Qt, 3]

        if lidar2cams is None:
            # fall back to PETR global decode (DN rides through _decode)
            return super()._decode(
                tokens.reshape(b, n * h * w, self.embed_dims),
                key_pos.reshape(b, n * h * w, self.embed_dims),
                dn_ref=dn_ref, attn_mask=attn_mask)

        # per-camera query PE from camera-frame reference points
        homo = jnp.concatenate(
            [ref_world, jnp.ones(ref_world.shape[:2] + (1,))], axis=-1)
        cam_pts = jnp.einsum("bnij,bqj->bnqi", lidar2cams, homo)[..., :3]
        lo = jnp.asarray(self.position_range[:3])
        hi = jnp.asarray(self.position_range[3:])
        cam_ref = jnp.clip((cam_pts - lo) / (hi - lo), 0., 1.)
        q_pos = self.query_embedding(
            pos2posemb3d(cam_ref, self.embed_dims // 2))  # [B,N,Qt,C]
        visible = cam_pts[..., 2] > 0.1  # in front of the camera

        query = jnp.zeros((b, ref.shape[1], self.embed_dims))
        inters = []
        for cam in range(n):
            out = self.decoder(
                query, key=tokens[:, cam], value=tokens[:, cam],
                query_pos=q_pos[:, cam], key_pos=key_pos[:, cam],
                attn_masks=attn_mask)
            inters.append(out)  # [L, B, Qt, C]
        stacked = jnp.stack(inters)  # [N, L, B, Qt, C]
        # visibility-weighted fusion over cameras
        wv = visible.astype(stacked.dtype).transpose(1, 0, 2)  # [N, B, Qt]
        denom = jnp.maximum(jnp.sum(wv, axis=0), 1.)[None]  # [1, B, Qt]
        inter = jnp.einsum("nlbqc,nbq->lbqc", stacked, wv) / denom[..., None]

        all_cls, all_bbox = [], []
        pcr = self.pc_range
        ref_inv = inverse_sigmoid(ref)  # [B, Qt, 3]
        for lvl in range(inter.shape[0]):
            f = inter[lvl]
            cls = self.cls_branch(f)
            reg = self.reg_branch(f)
            cx = jax.nn.sigmoid(reg[..., 0:1] + ref_inv[..., 0:1])
            cy = jax.nn.sigmoid(reg[..., 1:2] + ref_inv[..., 1:2])
            cz = jax.nn.sigmoid(reg[..., 4:5] + ref_inv[..., 2:3])
            cx = cx * (pcr[3] - pcr[0]) + pcr[0]
            cy = cy * (pcr[4] - pcr[1]) + pcr[1]
            cz = cz * (pcr[5] - pcr[2]) + pcr[2]
            bbox = jnp.concatenate(
                [cx, cy, cz, reg[..., 2:4], reg[..., 5:6], reg[..., 6:]],
                axis=-1)
            all_cls.append(cls)
            all_bbox.append(bbox)
        return jnp.stack(all_cls), jnp.stack(all_bbox)
