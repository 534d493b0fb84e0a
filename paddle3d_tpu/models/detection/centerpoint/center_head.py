"""CenterPoint head
(reference: paddle3d/models/detection/centerpoint/center_head.py:80,156).

SeparateHead = per-output conv towers; CenterHead adds the shared conv,
the loss (FastFocal + masked L1), and `predict` — the TPU-native equivalent
of the fused `centerpoint_postprocess` CUDA op
(reference: paddle3d/ops/centerpoint_postprocess/postprocess.cu:32): per-task
top-k decode + rotated NMS as one fixed-shape vmapped program.
"""
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ....apis import manager
from ....ops.iou3d_nms import suppress
from ...layers.layer_libs import uniform_bias_init, uniform_init
from ...losses.centernet_loss import FastFocalLoss, RegLoss

__all__ = ["SeparateHead", "CenterHead"]


class ConvBNReLU1(nnx.Module):
    """3x3 conv + BN(eps 1e-5) + ReLU (the reference head ConvModule)."""

    def __init__(self, cin, cout, kernel_size, *, rngs):
        self.conv = nnx.Conv(
            cin, cout, kernel_size=(kernel_size, kernel_size), padding="SAME",
            use_bias=False, kernel_init=uniform_init(), rngs=rngs)
        self.bn = nnx.BatchNorm(cout, epsilon=1e-5, momentum=0.9,
                                use_running_average=False, rngs=rngs)

    def __call__(self, x):
        return nnx.relu(self.bn(self.conv(x)))


class SeparateHead(nnx.Module):
    """One conv tower per output name (reference: center_head.py:80)."""

    def __init__(self, in_channels: int, heads: Dict[str, Sequence[int]],
                 head_conv: int = 64, final_kernel: int = 3,
                 init_bias: float = -2.19, *, rngs: nnx.Rngs):
        self.head_names = list(heads.keys())
        self.towers = nnx.Dict()
        for name, (classes, num_conv) in heads.items():
            layers = []
            c_in = in_channels
            for _ in range(num_conv - 1):
                layers.append(ConvBNReLU1(c_in, head_conv, final_kernel,
                                          rngs=rngs))
                c_in = head_conv
            bias_init = (nnx.initializers.constant(init_bias) if name == "hm"
                         else uniform_bias_init(c_in))
            layers.append(
                nnx.Conv(c_in, classes,
                         kernel_size=(final_kernel, final_kernel),
                         padding="SAME", kernel_init=uniform_init(),
                         bias_init=bias_init, rngs=rngs))
            self.towers[name] = nnx.List(layers)

    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        out = {}
        for name in self.head_names:
            y = x
            for layer in self.towers[name]:
                y = layer(y)
            out[name] = y
        return out


@manager.HEADS.add_component
@manager.MODELS.add_component
class CenterHead(nnx.Module):
    def __init__(self,
                 in_channels: int = 128,
                 tasks: List[dict] = (),
                 weight: float = 0.25,
                 code_weights: Sequence[float] = (),
                 common_heads: Dict[str, Sequence[int]] = None,
                 init_bias: float = -2.19,
                 share_conv_channel: int = 64,
                 num_hm_conv: int = 2,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        common_heads = dict(common_heads or {})
        self.tasks_cfg = list(tasks)
        self.num_classes = [len(t["class_names"]) for t in tasks]
        self.class_names = [t["class_names"] for t in tasks]
        self.weight = weight
        self.code_weights = list(code_weights)
        self.with_velocity = "vel" in common_heads
        self.box_n_dim = 9 if self.with_velocity else 7

        self.crit = FastFocalLoss()
        self.crit_reg = RegLoss()

        self.shared_conv = ConvBNReLU1(in_channels, share_conv_channel, 3,
                                       rngs=rngs)
        task_heads = []
        for num_cls in self.num_classes:
            heads = dict(common_heads)
            heads["hm"] = (num_cls, num_hm_conv)
            task_heads.append(
                SeparateHead(share_conv_channel, heads, final_kernel=3,
                             init_bias=init_bias, rngs=rngs))
        self.task_heads = nnx.List(task_heads)

    def __call__(self, x) -> List[Dict[str, jnp.ndarray]]:
        x = self.shared_conv(x)
        if self._mergeable() and self.shared_conv.bn.use_running_average:
            return self._merged_call(x)
        return [head(x) for head in self.task_heads]

    def _mergeable(self) -> bool:
        """All towers are depth-2 (ConvBNReLU + final conv) with one shared
        input — the 36 small N=64 convs then merge into ONE dense conv
        (64→T·64, full MXU lanes) plus one grouped final conv. Eval-mode
        only: BN folds to a per-channel affine from running stats."""
        for head in self.task_heads:
            for name in head.head_names:
                if len(head.towers[name]) != 2:
                    return False
        return True

    def _merged_call(self, x) -> List[Dict[str, jnp.ndarray]]:
        towers = []          # (task_idx, name, ConvBNReLU1, final Conv)
        for ti, head in enumerate(self.task_heads):
            for name in head.head_names:
                t = head.towers[name]
                towers.append((ti, name, t[0], t[1]))
        ng = len(towers)
        hc = towers[0][2].conv.kernel.value.shape[-1]

        # merged first conv: [kh, kw, cin, ng*hc]; BN folded to affine
        k1 = jnp.concatenate(
            [t[2].conv.kernel.value for t in towers], axis=-1)
        scales, biases = [], []
        for t in towers:
            bn = t[2].bn
            s = (bn.scale.value.astype(jnp.float32) /
                 jnp.sqrt(bn.var.value.astype(jnp.float32) + bn.epsilon))
            scales.append(s)
            biases.append(bn.bias.value.astype(jnp.float32) -
                          bn.mean.value.astype(jnp.float32) * s)
        scale = jnp.concatenate(scales).astype(x.dtype)
        bias = jnp.concatenate(biases).astype(x.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k1.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, k1.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn)
        y = nnx.relu(y * scale + bias)

        # final per-tower convs as ONE dense block-diagonal conv. Counter-
        # intuitive but measured on v5e (8x128x128, 36 towers of 64->3):
        # feature_group_count 14.6 ms, batch_group_count 12.8 ms (+4.8 ms
        # group->batch transpose), dense block-diag 5.3 ms — XLA runs the
        # densified conv at ~56% MFU while both grouped lowerings crawl.
        outs = [int(t[3].kernel.value.shape[-1]) for t in towers]
        po = max(outs)
        kh, kw = towers[0][3].kernel.value.shape[:2]
        k2 = jnp.zeros((kh, kw, ng * hc, ng * po), y.dtype)
        for gi, t in enumerate(towers):
            k2 = k2.at[:, :, gi * hc:(gi + 1) * hc,
                       gi * po:gi * po + outs[gi]].set(
                           t[3].kernel.value.astype(y.dtype))
        b2 = jnp.concatenate([
            jnp.pad(t[3].bias.value, (0, po - o))
            for t, o in zip(towers, outs)])
        dn2 = jax.lax.conv_dimension_numbers(
            y.shape, k2.shape, ("NHWC", "HWIO", "NHWC"))
        z = jax.lax.conv_general_dilated(
            y, k2, (1, 1), "SAME", dimension_numbers=dn2) + b2.astype(y.dtype)

        preds = [dict() for _ in self.task_heads]
        for gi, ((ti, name, _, _), o) in enumerate(zip(towers, outs)):
            preds[ti][name] = jax.lax.slice_in_dim(
                z, gi * po, gi * po + o, axis=3)
        return preds

    # -------------------------------------------------------------- training
    def loss(self, preds: List[dict], targets: List[tuple]) -> dict:
        """targets: per-task (heatmap, target_bbox, center_idx, mask, label)
        from CenterPointTargetGenerator (all NHWC / batched)."""
        total, hm_losses, loc_losses = 0., [], []
        for task_preds, (hm_t, box_t, idx_t, mask_t, label_t) in zip(
                preds, targets):
            hm = jnp.clip(jax.nn.sigmoid(task_preds["hm"]), 1e-4, 1 - 1e-4)
            hm_loss = self.crit(hm, hm_t, idx_t, mask_t, label_t)

            parts = [task_preds["reg"], task_preds["height"],
                     task_preds["dim"]]
            if self.with_velocity:
                parts.append(task_preds["vel"])
            parts.append(task_preds["rot"])
            pred_box = jnp.concatenate(parts, axis=-1)  # [B,H,W,D]
            box_loss = self.crit_reg(pred_box, mask_t, idx_t, box_t)
            loc_loss = jnp.sum(
                box_loss * jnp.asarray(self.code_weights, box_loss.dtype))
            total = total + hm_loss + self.weight * loc_loss
            hm_losses.append(hm_loss)
            loc_losses.append(loc_loss)
        out = {"loss": total}
        for i, (h, l) in enumerate(zip(hm_losses, loc_losses)):
            out["hm_loss_{}".format(i)] = h
            out["loc_loss_{}".format(i)] = l
        return out

    # ------------------------------------------------------------- inference
    def predict(self, preds: List[dict], test_cfg: dict) -> dict:
        """Fused decode + rotated NMS over ALL tasks in one program.

        The reference post-processes each task's head separately
        (centerpoint_postprocess CUDA op per task); here the tasks are
        stacked (heatmaps right-padded to the max class count with -inf
        logits) and decode + NMS run as ONE [T, B]-vmapped program, so the
        6 per-task greedy-suppression fixpoint loops merge into a single
        batched loop whose iteration count is the max across tasks rather
        than the sum of per-task maxes (measured ~7 ms/iter of suppression
        masks on the nuScenes trace before batching).

        Returns fixed-shape box3d_lidar [B, K, 7|9] (bottom-z), scores
        [B, K], label_preds [B, K] (-1 padded),
        K = num_tasks * nms_post_max_size.
        """
        vx, vy = test_cfg["voxel_size"][0], test_cfg["voxel_size"][1]
        pc_range = test_cfg["point_cloud_range"]
        down_ratio = test_cfg["down_ratio"]
        score_thr = test_cfg["score_threshold"]
        nms_cfg = test_cfg["nms"]
        post_limit = test_cfg.get("post_center_limit_range")

        cmax = max(self.num_classes)
        b, h, w, _ = preds[0]["hm"].shape
        hm = jax.nn.sigmoid(jnp.stack([
            jnp.pad(p["hm"], ((0, 0), (0, 0), (0, 0), (0, cmax - nc)),
                    constant_values=-1e4)
            for p, nc in zip(preds, self.num_classes)]))   # [T,B,H,W,Cmax]
        # ONE packed regression map per task: a single [pos] row gather in
        # the decode instead of five narrow ones (reg 2 | height 1 | dim 3 |
        # rot 2 | vel 2)
        packed = jnp.stack([
            jnp.concatenate([p["reg"], p["height"], p["dim"], p["rot"]]
                            + ([p["vel"]] if "vel" in p else []), axis=-1)
            for p in preds])                               # [T,B,H,W,8|10]
        offs, ncls = [], []
        acc = 0
        for nc in self.num_classes:
            offs.append(acc)
            ncls.append(nc)
            acc += nc
        cls_offsets = jnp.asarray(offs, jnp.int32)
        num_cls_arr = jnp.asarray(ncls, jnp.int32)

        def decode_one(hm1, packed1, cls_off, nc):
            scores_flat = hm1.transpose(2, 0, 1).reshape(-1)  # [Cmax*H*W]
            k = min(nms_cfg["nms_pre_max_size"], scores_flat.shape[0])
            if jax.default_backend() == "tpu" and k < scores_flat.shape[0]:
                # TPU PartialReduce top-k: ~2x cheaper than the full-sort
                # lax.top_k at [Cmax*H*W] heatmap sizes. Recall 0.97 on the
                # k-th tail only ever drops near-threshold candidates that
                # the score filter / NMS would discard; CPU (and the numpy
                # parity oracles) keep the exact path.
                top_scores, top_idx = jax.lax.approx_max_k(
                    scores_flat, k, recall_target=0.97,
                    aggregate_to_topk=True)
            else:
                top_scores, top_idx = jax.lax.top_k(scores_flat, k)
            cls_id = top_idx // (h * w)
            pos = top_idx % (h * w)
            ys = (pos // w).astype(jnp.float32)
            xs = (pos % w).astype(jnp.float32)

            sel = packed1.reshape(h * w, -1)[pos]          # [k, 8|10]
            reg = sel[:, 0:2]
            hei = sel[:, 2:3]
            dim = jnp.exp(sel[:, 3:6])
            rot = sel[:, 6:8]
            angle = jnp.arctan2(rot[:, 0], rot[:, 1])
            x = (xs + reg[:, 0]) * down_ratio * vx + pc_range[0]
            y = (ys + reg[:, 1]) * down_ratio * vy + pc_range[1]
            z = hei[:, 0]

            cols = [x[:, None], y[:, None], z[:, None], dim]
            if self.with_velocity:
                cols.append(sel[:, 8:10])
            cols.append(angle[:, None])
            boxes = jnp.concatenate(cols, axis=-1)

            # guard the channel padding: a padded channel's score is ~0 but
            # a zero score_threshold would otherwise let it through
            valid = (top_scores >= score_thr) & (cls_id < nc)
            if post_limit is not None:
                lim = jnp.asarray(post_limit)
                inside = (jnp.all(boxes[:, :3] >= lim[:3], axis=1)
                          & jnp.all(boxes[:, :3] <= lim[3:], axis=1))
                valid = valid & inside
            nms_scores = jnp.where(valid, top_scores, -jnp.inf)
            if nms_cfg.get("type") == "circle":
                # CenterPoint's circle NMS (reference bbox.py:450)
                from ....ops.circle_nms import circle_nms
                keep, _ = circle_nms(
                    boxes[:, :2], nms_scores,
                    min_radius=nms_cfg.get("min_radius", 4.0),
                    post_max_size=nms_cfg["nms_post_max_size"])
            else:
                bev = jnp.stack(
                    [boxes[:, 0], boxes[:, 1], boxes[:, 3], boxes[:, 4],
                     boxes[:, -1]], axis=-1)
                # candidates are already score-DESCENDING (top_k order) —
                # call suppress directly, skipping nms_bev's re-top_k +
                # row gather (~4 ms/iter across the 48 task-batch instances)
                _, keep = suppress(
                    bev, jnp.isfinite(nms_scores),
                    nms_cfg["nms_iou_threshold"],
                    post_max_size=nms_cfg["nms_post_max_size"])
            kept = keep >= 0
            safe = jnp.where(kept, keep, 0)
            out_boxes = jnp.where(kept[:, None], boxes[safe], 0.)
            # center z -> bottom z for the uniform output convention
            out_boxes = out_boxes.at[:, 2].add(
                jnp.where(kept, -out_boxes[:, 5] / 2, 0.))
            out_scores = jnp.where(kept, top_scores[safe], -1.)
            out_labels = jnp.where(
                kept, cls_id[safe].astype(jnp.int32) + cls_off, -1)
            return out_boxes, out_scores, out_labels

        per_batch = jax.vmap(decode_one, in_axes=(0, 0, None, None))
        boxes, scores, labels = jax.vmap(per_batch)(
            hm, packed, cls_offsets, num_cls_arr)           # [T,B,K,...]

        def tb_to_bk(x):
            moved = jnp.moveaxis(x, 0, 1)                   # [B,T,K,...]
            return moved.reshape((moved.shape[0], -1) + moved.shape[3:])

        return {
            "box3d_lidar": tb_to_bk(boxes),
            "scores": tb_to_bk(scores),
            "label_preds": tb_to_bk(labels),
        }
