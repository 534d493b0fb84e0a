"""SMOKE predictor head
(reference: paddle3d/models/detection/smoke/smoke_predictor.py:28).

Class heatmap head + regression head over the DLA feature map. Regression
channels: (depth 1, keypoint offset 2, dims 3, orientation 2[, bbox2d 2]).
dims get sigmoid-0.5, orientation is L2-normalized — both applied here as in
the reference.
"""
from typing import Sequence

import jax.numpy as jnp
from flax import nnx

from ....apis import manager
from ...layers.layer_libs import uniform_bias_init, uniform_init

__all__ = ["SMOKEPredictor"]


@manager.MODELS.add_component
@manager.HEADS.add_component
class SMOKEPredictor(nnx.Module):
    def __init__(self,
                 num_classes: int = 3,
                 reg_channels: Sequence[int] = (1, 2, 3, 2),
                 num_channels: int = 256,
                 norm_type: str = "gn",
                 in_channels: int = 64,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.num_classes = num_classes
        self.reg_channels = tuple(reg_channels)
        self.reg_heads = sum(reg_channels)
        # channel slices: depth | offset | dims | ori | (bbox2d)
        ends = []
        acc = 0
        for c in reg_channels:
            acc += c
            ends.append(acc)
        self.dim_slice = (ends[1], ends[2])
        self.ori_slice = (ends[2], ends[3])

        def norm(c):
            if norm_type == "gn":
                return nnx.GroupNorm(c, num_groups=min(32, c), rngs=rngs)
            return nnx.BatchNorm(c, use_running_average=False, rngs=rngs)

        def conv(cin, cout, k, bias_init=None):
            pad = (k - 1) // 2
            return nnx.Conv(
                cin, cout, kernel_size=(k, k),
                padding=[(pad, pad), (pad, pad)], kernel_init=uniform_init(),
                bias_init=bias_init or nnx.initializers.zeros_init(),
                rngs=rngs)

        self.cls_conv1 = conv(in_channels, num_channels, 3)
        self.cls_norm = norm(num_channels)
        self.cls_conv2 = conv(num_channels, num_classes, 1,
                              bias_init=nnx.initializers.constant(-2.19))
        self.reg_conv1 = conv(in_channels, num_channels, 3)
        self.reg_norm = norm(num_channels)
        self.reg_conv2 = conv(num_channels, self.reg_heads, 1)

    def __call__(self, features):
        """[B,H,W,C] -> (heatmap [B,H,W,num_classes] in (0,1),
        regression [B,H,W,reg_heads])."""
        hm = self.cls_conv2(nnx.relu(self.cls_norm(self.cls_conv1(features))))
        hm = jnp.clip(nnx.sigmoid(hm), 1e-4, 1 - 1e-4)

        reg = self.reg_conv2(nnx.relu(self.reg_norm(self.reg_conv1(features))))
        d0, d1 = self.dim_slice
        o0, o1 = self.ori_slice
        dims = nnx.sigmoid(reg[..., d0:d1]) - 0.5
        ori = reg[..., o0:o1]
        ori = ori / jnp.maximum(
            jnp.linalg.norm(ori, axis=-1, keepdims=True), 1e-6)
        reg = jnp.concatenate(
            [reg[..., :d0], dims, ori, reg[..., o1:]], axis=-1)
        return hm, reg
