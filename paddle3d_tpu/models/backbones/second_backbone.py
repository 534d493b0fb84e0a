"""SECOND backbone (reference: paddle3d/models/backbones/second_backbone.py:72).

Plain strided conv stages in NHWC; XLA fuses the conv+BN+ReLU chains onto the
MXU, so there is nothing exotic here by design.
"""
from typing import Sequence

from flax import nnx

from ...apis import manager
from ..layers.layer_libs import ConvBNReLU

__all__ = ["SecondBackbone", "BaseBEVBackbone"]


@manager.BACKBONES.add_component
class SecondBackbone(nnx.Module):
    def __init__(self,
                 in_channels: int = 128,
                 out_channels: Sequence[int] = (128, 128, 256),
                 layer_nums: Sequence[int] = (3, 5, 5),
                 downsample_strides: Sequence[int] = (2, 2, 2),
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        assert len(out_channels) == len(layer_nums) == len(downsample_strides)
        self.downsample_strides = list(downsample_strides)
        in_filters = [in_channels, *out_channels[:-1]]
        blocks = []
        for i, layer_num in enumerate(layer_nums):
            block = [
                ConvBNReLU(in_filters[i], out_channels[i], 3,
                           stride=downsample_strides[i], rngs=rngs)
            ]
            for _ in range(layer_num):
                block.append(ConvBNReLU(out_channels[i], out_channels[i], 3,
                                        rngs=rngs))
            blocks.append(nnx.List(block))
        self.blocks = nnx.List(blocks)

    def __call__(self, x):
        outs = []
        for block in self.blocks:
            for layer in block:
                x = layer(x)
            outs.append(x)
        return tuple(outs)


@manager.BACKBONES.add_component
class BaseBEVBackbone(nnx.Module):
    """SECOND-style dense BEV backbone that returns a SINGLE fused map
    (reference: paddle3d/models/backbones/base_bev_backbone.py — strided
    conv blocks whose outputs are deconv-upsampled to a common stride and
    concatenated). Used by CADDN and the two-stage detectors' BEV path."""

    def __init__(self,
                 in_channels: int = 64,
                 layer_nums: Sequence[int] = (5, 5),
                 layer_strides: Sequence[int] = (1, 2),
                 num_filters: Sequence[int] = (128, 256),
                 upsample_strides: Sequence[int] = (1, 2),
                 num_upsample_filters: Sequence[int] = (256, 256),
                 rngs: nnx.Rngs = None):
        from ..necks.second_fpn import SecondFPN
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.blocks = SecondBackbone(in_channels, num_filters, layer_nums,
                                     layer_strides, rngs=rngs)
        self.fuse = SecondFPN(num_filters, num_upsample_filters,
                              upsample_strides, rngs=rngs)
        self.out_channels = sum(num_upsample_filters)

    def __call__(self, x):
        return self.fuse(self.blocks(x))
