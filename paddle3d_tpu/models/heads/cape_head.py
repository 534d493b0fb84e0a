"""CAPE / CAPE-T head (reference:
paddle3d/models/heads/dense_heads/cape_dn_head.py:47 CAPETemporalDNHead and
models/layers/cape_transformer.py:289 CAPETransformer, :700
CrossViewAttention, :136 MLP_Fusion, :109 Ego_emb).

Camera-view Position Embedding: instead of PETR's single global 3D PE,
per-layer cross attention runs per camera with position embeddings computed
in that camera's LOCAL frame — key PE from the camera frustum without ego
pose (img->cam lift), query PE from reference points transformed into the
camera frame — and per-camera results are fused by visibility weights.

CAPE-T (`with_time=True`, cape_transformer.py:662-686): the view axis
carries two frames (current ++ previous, PETRv2 layout). Two query streams
decode in parallel — each stream cross-attends only its own frame's cameras
— and after every decoder layer the streams exchange information through a
gated MLP fusion whose gate is conditioned on the ego-motion rotation
(cur-lidar -> prev-lidar, Ego_emb). Velocity predictions are normalized by
the frame time gap (cape_dn_head.py:503 `tmp[..., 8:] /= mean_time_stamp`).

TPU-native: the two streams fold into one doubled batch for every attention
call; all shapes static; the ego matrix is computed from the provided
lidar2cams instead of host-side meta plumbing.
"""
import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from .petr_head import PETRHead, inverse_sigmoid, pos2posemb3d

__all__ = ["CAPEHead"]


class _EgoEmb(nnx.Module):
    """9-dim ego rotation -> sigmoid channel gate
    (reference: cape_transformer.py:109 Ego_emb)."""

    def __init__(self, dim, rngs=None):
        self.fc = nnx.Linear(9, dim, rngs=rngs)
        self.norm = nnx.LayerNorm(dim, rngs=rngs)

    def __call__(self, ego_rot):
        """ego_rot [B, 3, 3] -> [B, 1, dim]."""
        b = ego_rot.shape[0]
        return jax.nn.sigmoid(self.norm(self.fc(
            ego_rot.reshape(b, 1, 9))))


class _MLPFusion(nnx.Module):
    """Gated fusion of the current/previous query streams
    (reference: cape_transformer.py:136 MLP_Fusion)."""

    def __init__(self, dim, rngs=None):
        self.proj_k_a = nnx.Linear(dim, dim, rngs=rngs)
        self.proj_k_b = nnx.Linear(dim, dim, rngs=rngs)
        self.proj_v_a = nnx.Linear(dim, dim, rngs=rngs)
        self.proj_v_b = nnx.Linear(dim, dim, rngs=rngs)
        self.fc = nnx.Linear(dim * 2, dim, rngs=rngs)
        self.norm = nnx.LayerNorm(dim, rngs=rngs)
        self.ego = _EgoEmb(dim, rngs=rngs)

    def __call__(self, cur, prev, ego_rot):
        """cur/prev [B, Q, C]; ego_rot [B, 3, 3] -> fused (cur, prev)."""
        k_a = self.proj_k_a(cur)
        k_b = self.proj_k_b(prev) * self.ego(ego_rot)
        w = jax.nn.sigmoid(self.norm(self.fc(
            jnp.concatenate([k_a, k_b], axis=-1))))
        return w * self.proj_v_a(cur), (1 - w) * self.proj_v_b(prev)


@manager.HEADS.add_component
class CAPEHead(PETRHead):
    """`lidar2cams` [B, N, 4, 4] transforms lidar -> per-camera frame.
    With `with_time`, N = 2 * num_cameras (current frame first)."""

    # duck-type flag: the PETR model forwards batch["lidar2cams"] when set
    wants_lidar2cams = True

    def __init__(self, *args, with_time: bool = False,
                 with_prev_aux_loss: bool = False,
                 prev_aux_loss_weight: float = 0.1,
                 default_time_lag: float = 0.5,
                 rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        super().__init__(*args, rngs=rngs, **kwargs)
        self.with_time = with_time
        self.with_prev_aux_loss = with_prev_aux_loss
        self.prev_aux_loss_weight = float(prev_aux_loss_weight)
        self.default_time_lag = float(default_time_lag)
        if with_time:
            self.mlp_fusion = nnx.List([
                _MLPFusion(self.embed_dims, rngs=rngs)
                for _ in range(self.num_layers)
            ])
        # prev-stream outputs ride between __call__ and loss as module data
        # (declared nnx.data so traced arrays may be stored under nnx.jit)
        self._prev_outputs = nnx.data(None)

    # -------------------------------------------------------------- helpers
    def _camera_frame_inputs(self, feats, img2lidars, lidar2cams, dn_ref):
        """Per-camera tokens + LOCAL-frame key/query PE + visibility."""
        b, n, h, w, _ = feats.shape
        x = self.input_proj(feats)
        # key PE: frustum lifted into the CAMERA frame (img->cam =
        # lidar2cam @ img2lidar), no ego pose — the CAPE core idea
        img2cams = jnp.einsum("bnij,bnjk->bnik", lidar2cams, img2lidars)
        key_pos = self._position_embedding(x, img2cams)
        tokens = x.reshape(b, n, h * w, self.embed_dims)
        key_pos = key_pos.reshape(b, n, h * w, self.embed_dims)

        ref = self.query_reference_points(b, dn_ref)  # [B, Qt, 3]
        pc = jnp.asarray(self.pc_range)
        ref_world = ref * (pc[3:] - pc[:3]) + pc[:3]
        homo = jnp.concatenate(
            [ref_world, jnp.ones(ref_world.shape[:2] + (1,))], axis=-1)
        cam_pts = jnp.einsum("bnij,bqj->bnqi", lidar2cams, homo)[..., :3]
        lo = jnp.asarray(self.position_range[:3])
        hi = jnp.asarray(self.position_range[3:])
        cam_ref = jnp.clip((cam_pts - lo) / (hi - lo), 0., 1.)
        q_pos_cam = self.query_embedding(
            pos2posemb3d(cam_ref, self.embed_dims // 2))  # [B,N,Qt,C]
        visible = (cam_pts[..., 2] > 0.1).astype(jnp.float32)  # [B,N,Qt]
        # global lidar-frame query PE for self attention
        # (cape_transformer.py:661 lidar_obj_pe)
        q_pos_global = self.query_embedding(
            pos2posemb3d(ref, self.embed_dims // 2))
        return tokens, key_pos, q_pos_cam, visible, q_pos_global, ref

    def _decode_layers(self, tokens, key_pos, q_pos_cam, visible,
                       q_pos_global, attn_mask, fusion_ego=None):
        """Per-layer: masked self-attn -> per-camera local cross-attn with
        visibility fusion -> FFN. When `fusion_ego` [B',3,3] is given, the
        batch is [cur ++ prev] streams and MLP fusion mixes them after
        every layer. Returns [L, B, Qt, C] (post-normed)."""
        b, n = tokens.shape[:2]
        query = jnp.zeros(q_pos_global.shape)
        denom = jnp.maximum(jnp.sum(visible, axis=1), 1.)  # [B, Qt]
        inter = []
        for li, layer in enumerate(self.decoder.layers):
            q = query + layer.attns[0](query, query, query,
                                       query_pos=q_pos_global,
                                       key_pos=q_pos_global,
                                       attn_mask=attn_mask)
            q = layer.norms[0](q)
            # per-camera cross attention in the camera-local frame
            cross = 0.
            for cam in range(n):
                out = layer.attns[1](q, tokens[:, cam], tokens[:, cam],
                                     query_pos=q_pos_cam[:, cam],
                                     key_pos=key_pos[:, cam])
                cross = cross + out * visible[:, cam, :, None]
            q = layer.norms[1](q + cross / denom[..., None])
            query = layer.norms[2](layer.ffn(q))
            if fusion_ego is not None:
                half = query.shape[0] // 2
                cur, prev = self.mlp_fusion[li](query[:half], query[half:],
                                                fusion_ego)
                query = jnp.concatenate([cur, prev], axis=0)
            out = query
            if self.decoder.post_norm is not None:
                out = self.decoder.post_norm(out)
            inter.append(out)
        return jnp.stack(inter)

    def _branches(self, inter, ref, time_lag=None):
        """Decoder states -> per-layer (cls, decoded bbox)."""
        pcr = self.pc_range
        ref_inv = inverse_sigmoid(ref)
        all_cls, all_bbox = [], []
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
            vel = reg[..., 8:]
            if self.with_time and vel.shape[-1]:
                lag = (time_lag if time_lag is not None
                       else self.default_time_lag)
                vel = vel / jnp.maximum(jnp.asarray(lag, jnp.float32), 1e-2)
            bbox = jnp.concatenate(
                [cx, cy, cz, reg[..., 2:4], reg[..., 5:6], reg[..., 6:8],
                 vel], axis=-1)
            all_cls.append(cls)
            all_bbox.append(bbox)
        return jnp.stack(all_cls), jnp.stack(all_bbox)

    # --------------------------------------------------------------- forward
    def __call__(self, feats, img2lidars, lidar2cams=None, dn_ref=None,
                 attn_mask=None, time_lag=None):
        b, n_all, h, w, _ = feats.shape
        if lidar2cams is None:
            # fall back to PETR global decode (DN rides through _decode)
            x = self.input_proj(feats)
            pe = self._position_embedding(x, img2lidars)
            return super()._decode(
                x.reshape(b, n_all * h * w, self.embed_dims),
                pe.reshape(b, n_all * h * w, self.embed_dims),
                dn_ref=dn_ref, attn_mask=attn_mask)

        if not self.with_time:
            (tokens, key_pos, q_pos_cam, visible, q_pos_global,
             ref) = self._camera_frame_inputs(feats, img2lidars, lidar2cams,
                                              dn_ref)
            inter = self._decode_layers(tokens, key_pos, q_pos_cam, visible,
                                        q_pos_global, attn_mask)
            return self._branches(inter, ref)

        # ---- temporal: split the doubled view axis into two streams
        n = n_all // 2
        (tokens, key_pos, q_pos_cam, visible, q_pos_global,
         ref) = self._camera_frame_inputs(feats, img2lidars, lidar2cams,
                                          dn_ref)

        def split_cat(x):  # [B, 2N, ...] -> [2B, N, ...] (cur ++ prev)
            return jnp.concatenate([x[:, :n], x[:, n:]], axis=0)

        tokens2 = split_cat(tokens)
        key_pos2 = split_cat(key_pos)
        q_pos_cam2 = split_cat(q_pos_cam)
        visible2 = split_cat(visible)
        q_pos_g2 = jnp.concatenate([q_pos_global, q_pos_global], axis=0)
        # ego motion cur-lidar -> prev-lidar from the shared camera rig
        # (cape_transformer.py:121 get_curlidar2prevlidar)
        ego = jnp.einsum("bij,bjk->bik",
                         jnp.linalg.inv(lidar2cams[:, 0]),
                         lidar2cams[:, n])[:, :3, :3]

        inter2 = self._decode_layers(tokens2, key_pos2, q_pos_cam2,
                                     visible2, q_pos_g2, attn_mask,
                                     fusion_ego=ego)
        inter_cur, inter_prev = inter2[:, :b], inter2[:, b:]
        all_cls, all_bbox = self._branches(inter_cur, ref, time_lag)
        if self.with_prev_aux_loss:
            prev_cls, prev_bbox = self._branches(inter_prev, ref, time_lag)
            self._prev_outputs = (prev_cls, prev_bbox)
        return all_cls, all_bbox

    # ------------------------------------------------------------------ loss
    def loss(self, all_cls, all_bbox, gt_boxes, gt_labels,
             dn_meta=None) -> dict:
        out = super().loss(all_cls, all_bbox, gt_boxes, gt_labels,
                           dn_meta=dn_meta)
        prev = getattr(self, "_prev_outputs", None)
        if self.with_prev_aux_loss and prev is not None:
            # auxiliary supervision of the previous-frame stream against the
            # same (time-normalized) targets. The reference declares this
            # flag but stubs loss_single_with_prev_loss (cape_dn_head.py:625)
            # — here it is a working, weighted Hungarian loss.
            prev_cls, prev_bbox = prev
            q = self.num_query
            paux = super().loss(prev_cls[:, :, :q], prev_bbox[:, :, :q],
                                gt_boxes, gt_labels)
            w = self.prev_aux_loss_weight
            out["loss_cls_prev"] = w * paux["loss_cls"]
            out["loss_bbox_prev"] = w * paux["loss_bbox"]
            out["loss"] = (out["loss"] + out["loss_cls_prev"] +
                           out["loss_bbox_prev"])
            self._prev_outputs = None
        return out
