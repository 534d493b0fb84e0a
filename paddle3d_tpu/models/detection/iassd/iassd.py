"""IA-SSD point-based single-stage detector
(reference: paddle3d/models/detection/iassd/iassd.py:37,
iassd_backbone.py:29, iassd_head.py:33).

Instance-aware downsampling: early SA layers use farthest-point sampling,
later ones keep the top-k most confident foreground points (ctr_aware); a
vote layer shifts the survivors toward instance centroids, and a point head
regresses center-offset/size/angle per candidate. All stages are the masked
fixed-capacity batch layout from models/common/pointnet2_modules.
"""
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....apis import manager
from ....geometries import BBoxes3D, CoordMode
from ....ops.iou3d_nms import nms_bev
from ....sample import Sample
from ...base.base_model import BaseLidarModel
from ...common.pointnet2_modules import PointMLP, SAModuleMSG, VoteLayer
from ...losses.weighted_loss import sigmoid_focal_loss, smooth_l1_loss

__all__ = ["IASSD"]


@manager.MODELS.add_component
class IASSD(BaseLidarModel):
    def __init__(self,
                 num_classes: int = 3,
                 input_channel: int = 4,
                 npoint_list: Sequence[int] = (4096, 1024, 512, 256),
                 sample_method_list: Sequence[str] = ("d-fps", "d-fps",
                                                      "ctr_aware",
                                                      "ctr_aware"),
                 radius_list=((0.2, 0.8), (0.8, 1.6), (1.6, 4.8),
                              (4.8, 6.4)),
                 nsample_list=((16, 32), (16, 32), (16, 32), (16, 32)),
                 mlps=(((16, 16, 32), (32, 32, 64)),
                       ((64, 64, 128), (64, 96, 128)),
                       ((128, 128, 256), (128, 256, 256)),
                       ((256, 256, 512), (256, 512, 512))),
                 aggregation_mlps=((64,), (128,), (256,), (512,)),
                 confidence_mlps=((), (), (128,), (256,)),
                 vote_mlps: Sequence[int] = (128,),
                 max_translate_range: Sequence[float] = (3.0, 3.0, 2.0),
                 cls_fc: Sequence[int] = (256, 256),
                 reg_fc: Sequence[int] = (256, 256),
                 nms_cfg: dict = None,
                 point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40,
                                                       1),
                 pretrained: str = None,
                 backbone: dict = None,
                 head: dict = None,
                 rngs: nnx.Rngs = None):
        # reference-YAML portability: the IASSD_Backbone/IASSD_Head specs
        # (configs/iassd/iassd_kitti.yaml) unpack onto this flat surface.
        # The reference's 6-slot layer list folds: SA layers with radii ->
        # the first grouping stages; the radius-less ctr_aware slot -> the
        # 4th (sampling) stage, taking the final SA slot's grouping params;
        # Vote_Layer mlps -> vote_mlps; target/loss sub-configs are folded
        # into the model's built-in loss.
        if isinstance(backbone, dict):
            bt = backbone
            types = list(bt["layer_types"])
            radii = list(bt["radius_list"])
            sa = [i for i, t in enumerate(types)
                  if t == "SA_Layer" and radii[i]]
            sample_only = [i for i, t in enumerate(types)
                           if t == "SA_Layer" and not radii[i]]
            vote_i = types.index("Vote_Layer")
            first, last = sa[:-1], sa[-1]
            fourth = sample_only[0] if sample_only else last

            def pick(key, idxs):
                vals = list(bt[key])
                return [vals[i] for i in idxs]

            npoint_list = pick("npoint_list", first) + \
                [bt["npoint_list"][fourth]]
            sample_method_list = [
                (s or "d-fps").lower()
                for s in pick("sample_method_list", first) +
                [bt["sample_method_list"][fourth] or "ctr_aware"]]
            radius_list = pick("radius_list", first + [last])
            nsample_list = pick("nsample_list", first + [last])
            mlps = pick("mlps", first + [last])
            aggregation_mlps = pick("aggregation_mlps", first + [last])
            confidence_mlps = pick("confidence_mlps", first) + [[]]
            vm = bt["mlps"][vote_i]
            vote_mlps = list(vm) if vm else vote_mlps
            max_translate_range = bt.get("max_translate_range",
                                         max_translate_range)
            input_channel = bt.get("input_channel", input_channel)
            num_classes = bt.get("num_classes", num_classes)
        if isinstance(head, dict):
            cls_fc = head.get("cls_fc", cls_fc)
            reg_fc = head.get("reg_fc", reg_fc)
            num_classes = head.get("num_classes", num_classes)
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.num_classes = num_classes
        self.point_cloud_range = list(map(float, point_cloud_range))
        self.nms_cfg = dict(nms_cfg or dict(
            score_threshold=0.1, iou_threshold=0.01, pre_max_size=512,
            post_max_size=128))

        self.sa_modules = nnx.List([])
        cin = input_channel - 3
        for k in range(len(npoint_list)):
            mod = SAModuleMSG(
                npoint=npoint_list[k],
                radii=radius_list[k],
                nsamples=nsample_list[k],
                mlps=[list(m) for m in mlps[k]],
                in_channels=cin,
                sample_type=sample_method_list[k],
                aggregation_mlp=list(aggregation_mlps[k]) or None,
                confidence_mlp=list(confidence_mlps[k]) or None,
                num_classes=num_classes,
                rngs=rngs)
            self.sa_modules.append(mod)
            cin = mod.out_channels
        self.vote = VoteLayer(vote_mlps, cin, max_translate_range, rngs=rngs)
        # center-feature aggregation around votes
        self.ctr_agg = SAModuleMSG(
            npoint=npoint_list[-1], radii=(4.8, 6.4), nsamples=(16, 32),
            mlps=[[256, 256, 512], [256, 512, 1024]],
            in_channels=vote_mlps[-1], sample_type="identity", rngs=rngs)
        self.cls_head = nnx.Sequential(
            PointMLP([self.ctr_agg.out_channels] + list(cls_fc), rngs=rngs),
            nnx.Linear(cls_fc[-1], num_classes,
                       bias_init=nnx.initializers.constant(-2.19),
                       rngs=rngs))
        # box: (dx, dy, dz, w, l, h, sin, cos)
        self.reg_head = nnx.Sequential(
            PointMLP([self.ctr_agg.out_channels] + list(reg_fc), rngs=rngs),
            nnx.Linear(reg_fc[-1], 8, rngs=rngs))

    # -------------------------------------------------------------- backbone
    def _backbone(self, points):
        xyz = points[..., :3]
        feats = points[..., 3:]
        mask = jnp.all(jnp.isfinite(points), axis=-1)
        xyz = jnp.where(mask[..., None], xyz, 0.)
        feats = jnp.where(mask[..., None], feats, 0.)
        scores = None
        sa_confs = []
        for mod in self.sa_modules:
            xyz, feats, mask, conf = mod(xyz, feats, mask, scores)
            if conf is not None:
                scores = conf
                sa_confs.append((conf, xyz, mask))
        votes, vfeats, offsets = self.vote(xyz, feats, mask)
        # aggregate features around the votes from the last SA set
        self.ctr_agg.sample_type = "identity"
        nx, nf, nm, _ = self._aggregate(votes, xyz, vfeats, mask)
        return votes, nf, mask, sa_confs, scores

    def _aggregate(self, centers, xyz, feats, mask):
        """Group the support set around given centers (no resampling)."""
        mod = self.ctr_agg
        outs = []
        from ....ops.pallas.ball_query import ball_query_batched
        take = jax.vmap(lambda x, i: x[i])
        for radius, nsample, mlp in zip(mod.radii, mod.nsamples,
                                        mod.scale_mlps):
            gidx, counts = ball_query_batched(radius, nsample, xyz,
                                              centers, mask)
            grouped = jnp.concatenate(
                [take(xyz, gidx) - centers[:, :, None, :],
                 take(feats, gidx)], axis=-1)
            out = mlp(grouped)
            kmask = (jnp.arange(out.shape[2])[None, None, :] <
                     jnp.maximum(counts, 1)[..., None])
            out = jnp.where(kmask[..., None], out, -1e9)
            out = jnp.max(out, axis=2)
            out = jnp.where((counts > 0)[..., None], out, 0.)
            outs.append(out)
        nf = jnp.concatenate(outs, axis=-1)
        if mod.aggregation is not None:
            nf = mod.aggregation(nf)
        return centers, nf, mask, None

    # ----------------------------------------------------------------- train
    def train_forward(self, batch) -> dict:
        points = batch["data"]
        gt_boxes = batch["gt_boxes"]  # [B, G, 7] bottom-z
        gt_labels = batch["gt_labels"]
        centers, feats, mask, sa_confs, _ = self._backbone(points)
        cls_logits = self.cls_head(feats)  # [B, M, C]
        reg = self.reg_head(feats)         # [B, M, 8]

        gt_center = gt_boxes.at[..., 2].add(gt_boxes[..., 5] / 2)

        def assign_one(ctr, gt_b, gt_l):
            """Point-in-gt-BEV assignment (dist to nearest valid gt)."""
            d = jnp.linalg.norm(
                ctr[:, None, :2] - gt_b[None, :, :2], axis=-1)
            d = jnp.where((gt_l >= 0)[None, :], d, 1e9)
            gi = jnp.argmin(d, axis=1)
            gd = jnp.min(d, axis=1)
            # inside circumscribed radius of the gt footprint
            radius = 0.5 * jnp.sqrt(
                gt_b[gi, 3] ** 2 + gt_b[gi, 4] ** 2)
            fg = gd < radius
            return gi, fg

        gi, fg = jax.vmap(assign_one)(centers, gt_center, gt_labels)
        fg = fg & mask
        safe = jnp.clip(gi, 0)
        tgt_cls = jnp.where(fg, jnp.take_along_axis(gt_labels, safe, axis=1),
                            self.num_classes)
        onehot = jax.nn.one_hot(tgt_cls, self.num_classes + 1)[
            ..., :self.num_classes]
        num_fg = jnp.maximum(jnp.sum(fg), 1)
        cls_loss = jnp.sum(
            sigmoid_focal_loss(cls_logits, onehot) *
            mask[..., None]) / num_fg

        tgt_box = jnp.take_along_axis(
            gt_center, safe[..., None], axis=1)  # [B, M, 7+]
        delta = tgt_box[..., :3] - centers
        tgt = jnp.concatenate([
            delta, tgt_box[..., 3:6],
            jnp.sin(tgt_box[..., 6:7]), jnp.cos(tgt_box[..., 6:7])
        ], axis=-1)
        reg_loss = jnp.sum(
            jnp.where(fg[..., None], smooth_l1_loss(reg, tgt), 0.)) / num_fg

        # SA confidence (instance-aware sampling supervision)
        sa_loss = 0.
        for conf, cxyz, cmask in sa_confs:
            cgi, cfg = jax.vmap(assign_one)(cxyz, gt_center, gt_labels)
            cfg = cfg & cmask
            csafe = jnp.clip(cgi, 0)
            ctgt = jnp.where(
                cfg, jnp.take_along_axis(gt_labels, csafe, axis=1),
                self.num_classes)
            conehot = jax.nn.one_hot(ctgt, self.num_classes + 1)[
                ..., :self.num_classes]
            sa_loss = sa_loss + jnp.sum(
                sigmoid_focal_loss(conf, conehot) * cmask[..., None]
            ) / jnp.maximum(jnp.sum(cfg), 1)

        total = cls_loss + reg_loss + sa_loss
        return {"loss": total, "loss_cls": cls_loss, "loss_box": reg_loss,
                "loss_sa": sa_loss}

    # ------------------------------------------------------------------ test
    def test_forward(self, batch) -> dict:
        points = batch["data"]
        centers, feats, mask, _, _ = self._backbone(points)
        cls_logits = self.cls_head(feats)
        reg = self.reg_head(feats)
        cfg = self.nms_cfg

        def single(ctr, cls_l, reg_l, m):
            scores = jax.nn.sigmoid(cls_l)
            score = jnp.max(scores, axis=-1)
            label = jnp.argmax(scores, axis=-1)
            center = ctr + reg_l[:, :3]
            dims = reg_l[:, 3:6]
            yaw = jnp.arctan2(reg_l[:, 6], reg_l[:, 7])
            boxes = jnp.concatenate(
                [center.at[:, 2].add(-dims[:, 2] / 2), dims, yaw[:, None]],
                axis=-1)
            valid = m & (score >= cfg["score_threshold"])
            nms_scores = jnp.where(valid, score, -jnp.inf)
            bev = jnp.stack([boxes[:, 0], boxes[:, 1], boxes[:, 3],
                             boxes[:, 4], boxes[:, 6]], axis=-1)
            keep, _ = nms_bev(bev, nms_scores, cfg["iou_threshold"],
                              pre_max_size=min(cfg["pre_max_size"],
                                               boxes.shape[0]),
                              post_max_size=cfg["post_max_size"])
            kept = keep >= 0
            safe = jnp.where(kept, keep, 0)
            return (jnp.where(kept[:, None], boxes[safe], 0.),
                    jnp.where(kept, score[safe], -1.),
                    jnp.where(kept, label[safe], -1))

        boxes, scores, labels = jax.vmap(single)(centers, cls_logits, reg,
                                                 mask)
        return {"box3d_lidar": boxes, "scores": scores,
                "label_preds": labels}

    @staticmethod
    def postprocess_to_samples(outputs: dict, metas: list) -> list:
        from ..pointpillars.pointpillars import PointPillars
        return PointPillars.postprocess_to_samples(outputs, metas)
