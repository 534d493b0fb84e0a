"""Semantic class heads for the CADDN camera branch (reference:
paddle3d/models/heads/class_heads/deeplabv3_head.py DeepLabV3Head and
ocrnet_head.py OCRNetHead — the reference's CADDN image branch is a
segmentation network whose pre-logit features feed the frustum encoder).

NHWC nnx implementations. Both heads expose `features(feat_list)` (the
pre-classifier representation the FFE consumes) and `__call__` returning
the semantic logits.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager

__all__ = ["DeepLabV3Head", "OCRNetHead"]


class _ConvBNReLU(nnx.Module):
    def __init__(self, cin, cout, k=3, dilation=1, *, rngs):
        pad = dilation * (k - 1) // 2
        self.conv = nnx.Conv(cin, cout, kernel_size=(k, k),
                             padding=[(pad, pad), (pad, pad)],
                             kernel_dilation=(dilation, dilation),
                             use_bias=False, rngs=rngs)
        self.bn = nnx.BatchNorm(cout, use_running_average=False, rngs=rngs)

    def __call__(self, x):
        return nnx.relu(self.bn(self.conv(x)))


class ASPPModule(nnx.Module):
    """Atrous spatial pyramid pooling (reference: paddleseg ASPPModule used
    by deeplabv3_head.py)."""

    def __init__(self, ratios: Sequence[int], cin: int, cout: int, *,
                 rngs):
        self.branches = nnx.List([
            _ConvBNReLU(cin, cout, k=1 if r == 1 else 3, dilation=r,
                        rngs=rngs) for r in ratios
        ])
        self.img_pool_conv = _ConvBNReLU(cin, cout, k=1, rngs=rngs)
        self.project = _ConvBNReLU(cout * (len(ratios) + 1), cout, k=1,
                                   rngs=rngs)

    def __call__(self, x):
        outs = [b(x) for b in self.branches]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = self.img_pool_conv(pooled)
        pooled = jnp.broadcast_to(pooled, outs[0].shape)
        return self.project(jnp.concatenate(outs + [pooled], axis=-1))


@manager.HEADS.add_component
class DeepLabV3Head(nnx.Module):
    """(reference: class_heads/deeplabv3_head.py:25)."""

    def __init__(self, num_classes: int, backbone_channels: int,
                 backbone_indices: Sequence[int] = (0,),
                 aspp_ratios: Sequence[int] = (1, 6, 12, 18),
                 aspp_out_channels: int = 256, rngs: nnx.Rngs = None,
                 **unused):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.backbone_indices = tuple(backbone_indices)
        self.aspp = ASPPModule(aspp_ratios, backbone_channels,
                               aspp_out_channels, rngs=rngs)
        self.conv_bn_relu = _ConvBNReLU(aspp_out_channels,
                                        aspp_out_channels, k=3, rngs=rngs)
        self.cls = nnx.Conv(aspp_out_channels, num_classes,
                            kernel_size=(1, 1), rngs=rngs)
        self.out_channels = aspp_out_channels

    def features(self, feat_list):
        x = feat_list[self.backbone_indices[0]] \
            if isinstance(feat_list, (list, tuple)) else feat_list
        return self.conv_bn_relu(self.aspp(x))

    def __call__(self, feat_list):
        return self.cls(self.features(feat_list))


class SpatialGatherBlock(nnx.Module):
    """Pixel-region aggregation (reference: ocrnet_head.py
    SpatialGatherBlock)."""

    def __call__(self, pixels, regions):
        # pixels [B,H,W,C]; regions [B,H,W,K] -> region feats [B,K,C]
        b, h, w, c = pixels.shape
        k = regions.shape[-1]
        p = pixels.reshape(b, h * w, c)
        r = jax.nn.softmax(regions.reshape(b, h * w, k), axis=1)
        return jnp.einsum("bnk,bnc->bkc", r, p)


class SpatialOCRModule(nnx.Module):
    """Object-contextual representation (reference: ocrnet_head.py
    SpatialOCRModule / ObjectAttentionBlock)."""

    def __init__(self, cin, key_channels, cout, *, rngs):
        self.f_pixel = nnx.Linear(cin, key_channels, rngs=rngs)
        self.f_object = nnx.Linear(cin, key_channels, rngs=rngs)
        self.f_down = nnx.Linear(cin, key_channels, rngs=rngs)
        self.f_up = nnx.Linear(key_channels, cin, rngs=rngs)
        self.project = _ConvBNReLU(2 * cin, cout, k=1, rngs=rngs)
        self.key_channels = key_channels

    def __call__(self, pixels, regions):
        # pixels [B,H,W,C]; regions [B,K,C]
        b, h, w, c = pixels.shape
        q = self.f_pixel(pixels.reshape(b, h * w, c))
        k = self.f_object(regions)
        v = self.f_down(regions)
        sim = jnp.einsum("bnc,bkc->bnk", q, k) / (self.key_channels ** 0.5)
        ctx = jnp.einsum("bnk,bkc->bnc", jax.nn.softmax(sim, axis=-1), v)
        ctx = self.f_up(ctx).reshape(b, h, w, c)
        return self.project(jnp.concatenate([pixels, ctx], axis=-1))


@manager.HEADS.add_component
class OCRNetHead(nnx.Module):
    """(reference: class_heads/ocrnet_head.py:30)."""

    def __init__(self, num_classes: int, in_channels,
                 backbone_indices: Sequence[int] = (0,),
                 ocr_mid_channels: int = 512, ocr_key_channels: int = 256,
                 rngs: nnx.Rngs = None, **unused):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        if not isinstance(in_channels, (list, tuple)):
            in_channels = [in_channels]
        self.backbone_indices = tuple(backbone_indices)
        self.indices = (-2, -1) if len(in_channels) > 1 else (-1, -1)
        self.conv3x3_ocr = _ConvBNReLU(in_channels[self.indices[1]],
                                       ocr_mid_channels, k=3, rngs=rngs)
        self.aux_head = nnx.Sequential(
            _ConvBNReLU(in_channels[self.indices[0]],
                        in_channels[self.indices[0]], k=1, rngs=rngs),
            nnx.Conv(in_channels[self.indices[0]], num_classes,
                     kernel_size=(1, 1), rngs=rngs))
        self.spatial_gather = SpatialGatherBlock()
        self.spatial_ocr = SpatialOCRModule(ocr_mid_channels,
                                            ocr_key_channels,
                                            ocr_mid_channels, rngs=rngs)
        self.cls_head = nnx.Conv(ocr_mid_channels, num_classes,
                                 kernel_size=(1, 1), rngs=rngs)
        self.out_channels = ocr_mid_channels

    def features(self, feat_list):
        if not isinstance(feat_list, (list, tuple)):
            feat_list = [feat_list]
        feats = [feat_list[i] for i in self.backbone_indices] \
            if len(feat_list) > max(self.backbone_indices) else list(
                feat_list)
        shallow = feats[self.indices[0]]
        deep = feats[self.indices[1]]
        soft_regions = self.aux_head(shallow)
        pixels = self.conv3x3_ocr(deep)
        regions = self.spatial_gather(pixels, soft_regions)
        return self.spatial_ocr(pixels, regions)

    def __call__(self, feat_list):
        return self.cls_head(self.features(feat_list))