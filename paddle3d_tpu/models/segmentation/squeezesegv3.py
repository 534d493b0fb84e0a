"""SqueezeSegV3 range-image segmentation
(reference: paddle3d/models/segmentation/squeezesegv3.py:33 + the SAC
backbone, models/backbones/sac.py — spatially-adaptive convolution:
attention weights predicted from the raw range image modulate features at
each scale).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...apis import manager
from ...sample import Sample
from ..base.base_model import Base3DModel
from ..layers.layer_libs import ConvBNReLU, uniform_bias_init, uniform_init

__all__ = ["SqueezeSegV3", "SACRangeNet"]


class SACBlock(nnx.Module):
    """Spatially-adaptive conv: a 3x3 attention map predicted from the
    range channels gates the unfolded features (SAC-ISK variant)."""

    def __init__(self, in_channels, out_channels, *, rngs):
        self.attn = nnx.Conv(5, 9 * in_channels, kernel_size=(7, 7),
                             padding="SAME", kernel_init=uniform_init(),
                             rngs=rngs)
        self.position_mlp = nnx.Sequential(
            nnx.Conv(9 * in_channels, out_channels, kernel_size=(1, 1),
                     kernel_init=uniform_init(), rngs=rngs),
            nnx.BatchNorm(out_channels, use_running_average=False,
                          rngs=rngs), nnx.relu,
            nnx.Conv(out_channels, out_channels, kernel_size=(3, 3),
                     padding="SAME", kernel_init=uniform_init(), rngs=rngs),
            nnx.BatchNorm(out_channels, use_running_average=False,
                          rngs=rngs), nnx.relu)

    def __call__(self, range_img, feats):
        b, h, w, c = feats.shape
        attn = jax.nn.sigmoid(self.attn(range_img))  # [B,H,W,9C]
        # unfold 3x3 neighborhood of feats
        patches = jax.lax.conv_general_dilated_patches(
            feats.transpose(0, 3, 1, 2), (3, 3), (1, 1),
            [(1, 1), (1, 1)])  # [B, C*9, H, W]
        patches = patches.transpose(0, 2, 3, 1)  # [B,H,W,C*9]
        gated = patches * attn
        return self.position_mlp(gated)


@manager.BACKBONES.add_component
class SACRangeNet(nnx.Module):
    """(reference: sac.py:28) — SAC blocks with stride-2 downsampling and
    multi-scale outputs."""

    def __init__(self, in_channels: int = 5,
                 encoder_channels: Sequence[int] = (32, 64, 128, 256),
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.stem = ConvBNReLU(in_channels, encoder_channels[0], 3,
                               rngs=rngs)
        blocks, downs = [], []
        for i in range(len(encoder_channels)):
            cin = encoder_channels[max(i - 1, 0)] if i else \
                encoder_channels[0]
            blocks.append(SACBlock(encoder_channels[max(i - 1, 0)] if i else
                                   encoder_channels[0],
                                   encoder_channels[i], rngs=rngs))
            downs.append(None)
        self.blocks = nnx.List(blocks)
        self.out_channels = list(encoder_channels)

    def __call__(self, x):
        """x [B,H,W,5] range image -> list of per-scale features (all at
        full resolution; W is downsampled between blocks and upsampled
        back, as in the reference's height-preserving scheme)."""
        range_img = x
        f = self.stem(x)
        outs = []
        for i, blk in enumerate(self.blocks):
            f = blk(range_img, f)
            outs.append(f)
            if i < len(self.blocks) - 1:
                b, h, w, c = f.shape
                f = nnx.max_pool(f, window_shape=(1, 2), strides=(1, 2))
                range_img = jax.image.resize(
                    range_img, (b, h, w // 2, range_img.shape[-1]),
                    method="nearest")
        # upsample everything back to the input resolution
        b, h, w0, _ = outs[0].shape
        outs = [
            jax.image.resize(o, (b, h, w0, o.shape[-1]), method="bilinear")
            for o in outs
        ]
        return outs


@manager.LOSSES.add_component
@manager.MODELS.add_component
class SSGLossComputation:
    """Inverse-frequency class weighting for the range-image CE loss
    (reference: paddle3d/models/segmentation/squeezesegv3/
    squeezesegv3_loss.py:27 — weight = 1/(mapped content freq + epsilon_w),
    zeroed at ignore_index). Exists as a registered component so the
    reference SqueezeSegV3 YAMLs build verbatim; the actual per-scale CE
    is computed inside SqueezeSegV3.train_forward with these weights."""

    def __init__(self, num_classes: int, epsilon_w: float = 1e-3,
                 ignore_index: int = 0):
        from ...datasets.semantic_kitti.semantic_kitti import (
            CONTENT, SemanticKITTIDataset)
        lut = SemanticKITTIDataset.build_remap_lut()
        content = np.zeros(num_classes, np.float32)
        for raw, freq in CONTENT.items():
            content[lut[raw]] += freq
        self.weights = 1. / (content + epsilon_w)
        if 0 <= ignore_index < num_classes:
            self.weights[ignore_index] = 0.
        self.ignore_index = ignore_index
        self.num_classes = num_classes


@manager.MODELS.add_component
class SqueezeSegV3(Base3DModel):
    def __init__(self, backbone, num_classes: int = 20,
                 class_weights: Sequence[float] = None,
                 loss: SSGLossComputation = None,
                 pretrained: str = None, rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.backbone = backbone
        self.num_classes = num_classes
        if loss is not None and class_weights is None:
            class_weights = loss.weights
        self.class_weights = (np.asarray(class_weights, np.float32)
                              if class_weights is not None else None)
        cin = sum(backbone.out_channels)
        self.head = nnx.Sequential(
            nnx.Conv(cin, 64, kernel_size=(3, 3), padding="SAME",
                     kernel_init=uniform_init(), rngs=rngs), nnx.relu,
            nnx.Conv(64, num_classes, kernel_size=(1, 1),
                     kernel_init=uniform_init(), rngs=rngs))
        # per-scale supervision heads (the reference's multi-layer loss)
        self.aux_heads = nnx.List([
            nnx.Conv(c, num_classes, kernel_size=(1, 1),
                     kernel_init=uniform_init(), rngs=rngs)
            for c in backbone.out_channels
        ])

    def _logits(self, img):
        feats = self.backbone(img)
        fused = jnp.concatenate(feats, axis=-1)
        return self.head(fused), feats

    def train_forward(self, batch) -> dict:
        img = batch["data"]           # [B, H, W, 5]
        labels = batch["proj_labels"]  # [B, H, W]
        mask = batch["proj_mask"]      # [B, H, W]
        logits, feats = self._logits(img)

        def ce(lg, lb, m):
            logp = jax.nn.log_softmax(lg, axis=-1)
            nll = -jnp.take_along_axis(
                logp, lb[..., None].astype(jnp.int32), axis=-1)[..., 0]
            if self.class_weights is not None:
                w = jnp.asarray(self.class_weights)[lb]
                nll = nll * w
            return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.)

        fmask = mask.astype(logits.dtype)
        loss = ce(logits, labels, fmask)
        aux = 0.
        for head, f in zip(self.aux_heads, feats):
            aux = aux + ce(head(f), labels, fmask)
        total = loss + 0.5 * aux
        return {"loss": total, "loss_main": loss, "loss_aux": aux}

    def test_forward(self, batch) -> dict:
        logits, _ = self._logits(batch["data"])
        return {"pred_labels": jnp.argmax(logits, axis=-1),
                "logits": logits}

    @staticmethod
    def postprocess_to_samples(outputs: dict, metas: list) -> list:
        preds = np.asarray(outputs["pred_labels"])
        results = []
        for i, meta in enumerate(metas):
            s = Sample(path=meta.get("path"), modality="lidar")
            s.labels = preds[i]
            s.meta.update({k: v for k, v in meta.items() if k != "path"})
            results.append(s)
        return results
