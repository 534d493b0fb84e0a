"""SMOKE monocular 3D detector
(reference: paddle3d/models/detection/smoke/smoke.py:32 + processor.py:29).

DLA backbone -> SMOKEPredictor -> (train) disentangled-L1 loss /
(test) heatmap-NMS topk decode — all fixed shapes, camera-frame outputs.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ....apis import manager
from ....sample import Sample
from ...base.base_model import BaseMonoModel
from ...layers.layer_libs import heatmap_nms
from .smoke_coder import SMOKECoder

__all__ = ["SMOKE"]


@manager.MODELS.add_component
class SMOKE(BaseMonoModel):
    def __init__(self,
                 backbone,
                 head,
                 loss=None,
                 depth_ref=(28.01, 16.32),
                 dim_ref=((3.88, 1.63, 1.53), (0.84, 1.76, 0.66),
                          (1.76, 1.73, 0.6)),
                 max_detection: int = 50,
                 det_threshold: float = 0.25,
                 pretrained: str = None):
        self.backbone = backbone
        self.head = head
        if loss is None:
            # the reference configs pass no loss block (its SMOKE builds the
            # loss internally, smoke.py:46) — mirror that default
            from .smoke_loss import SMOKELossComputation
            loss = SMOKELossComputation(depth_ref, dim_ref,
                                        max_objs=max_detection)
        self.loss_fn = loss
        self.coder = SMOKECoder(depth_ref, dim_ref)
        self.max_detection = max_detection
        self.det_threshold = det_threshold
        self.pretrained = pretrained

    def train_forward(self, batch) -> dict:
        images = batch["data"] / 255.0
        feats = self.backbone(images)
        hm, reg = self.head(feats)
        return self.loss_fn(hm, reg, batch["target"])

    def test_forward(self, batch) -> dict:
        """-> box3d_cam [B,K,7] (x,y_bottom,z,h,w,l,ry), scores [B,K] (-1
        pad), label_preds [B,K], bbox_2d [B,K,4] (feature-map scale x
        down_ratio = original pixels)."""
        images = batch["data"] / 255.0
        target = batch["target"]
        feats = self.backbone(images)
        hm, reg = self.head(feats)
        hm = heatmap_nms(hm)
        b, h, w, c = hm.shape
        k = self.max_detection

        def single(hm1, reg1, k_inv, down_ratio):
            scores_flat = hm1.transpose(2, 0, 1).reshape(-1)
            top_scores, top_idx = jax.lax.top_k(scores_flat, k)
            cls_id = (top_idx // (h * w)).astype(jnp.int32)
            pos = top_idx % (h * w)
            ys = (pos // w).astype(jnp.float32)
            xs = (pos % w).astype(jnp.float32)
            pois = reg1.reshape(h * w, -1)[pos]

            depths = self.coder.decode_depth(pois[:, 0])
            proj = (jnp.stack([xs, ys], axis=1) + pois[:, 1:3]) * down_ratio
            homo = jnp.concatenate(
                [proj, jnp.ones((k, 1), proj.dtype)], axis=1)
            locs = (k_inv @ (homo * depths[:, None]).T).T
            dims = self.coder.decode_dimension(cls_id, pois[:, 3:6])
            locs = locs.at[:, 1].add(dims[:, 0] / 2)
            rotys, alphas = self.coder.decode_orientation(pois[:, 6:8], locs)

            boxes = jnp.concatenate(
                [locs, dims, rotys[:, None]], axis=1)  # x,y,z,h,w,l,ry
            valid = top_scores >= self.det_threshold
            out_scores = jnp.where(valid, top_scores, -1.)
            out_labels = jnp.where(valid, cls_id, -1)
            # 2D box from projected corners
            if pois.shape[1] >= 10:
                half = pois[:, 8:10] / 2 * down_ratio
                center = proj
                bbox2d = jnp.concatenate(
                    [center - half, center + half], axis=1)
            else:
                bbox2d = jnp.zeros((k, 4), boxes.dtype)
            return boxes, out_scores, out_labels, bbox2d, alphas

        boxes, scores, labels, bbox2d, alphas = jax.vmap(single)(
            hm, reg, target["K_inv"], target["down_ratio"])
        return {
            "box3d_cam": boxes,
            "scores": scores,
            "label_preds": labels,
            "bbox_2d": bbox2d,
            "alphas": alphas,
        }

    @staticmethod
    def postprocess_to_samples(outputs: dict, metas: list) -> list:
        boxes = np.asarray(outputs["box3d_cam"])
        scores = np.asarray(outputs["scores"])
        labels = np.asarray(outputs["label_preds"])
        bbox2d = np.asarray(outputs["bbox_2d"])
        alphas = np.asarray(outputs["alphas"])
        results = []
        for i, meta in enumerate(metas):
            valid = scores[i] >= 0
            s = Sample(path=meta.get("path"), modality="image")
            s.bboxes_3d = boxes[i][valid]      # camera frame (x,y,z,h,w,l,ry)
            s.bboxes_2d = bbox2d[i][valid]
            s.labels = labels[i][valid]
            s.confidences = scores[i][valid]
            s.alpha = alphas[i][valid]
            s.frame = "camera"
            s.meta.update(
                {k: v for k, v in meta.items() if k not in ("path",)})
            results.append(s)
        return results
