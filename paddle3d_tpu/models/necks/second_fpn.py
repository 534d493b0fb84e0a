"""SECOND FPN neck (reference: paddle3d/models/necks/second_fpn.py:99).

Deconv branches upsample each backbone stage to a common resolution and
concatenate along channels (NHWC).
"""
from typing import Sequence

import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ..layers.layer_libs import ConvBNReLU, DeconvBNReLU

__all__ = ["SecondFPN"]


@manager.NECKS.add_component
class SecondFPN(nnx.Module):
    def __init__(self,
                 in_channels: Sequence[int] = (128, 128, 256),
                 out_channels: Sequence[int] = (256, 256, 256),
                 upsample_strides: Sequence[int] = (1, 2, 4),
                 use_conv_for_no_stride: bool = False,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        assert len(out_channels) == len(upsample_strides) == len(in_channels)
        self.upsample_strides = list(upsample_strides)
        deblocks = []
        for i, out_channel in enumerate(out_channels):
            stride = upsample_strides[i]
            if stride > 1 or (stride == 1 and not use_conv_for_no_stride):
                deblocks.append(
                    DeconvBNReLU(in_channels[i], out_channel,
                                 kernel_size=stride, stride=stride, rngs=rngs))
            else:
                stride = round(1 / stride)
                deblocks.append(
                    ConvBNReLU(in_channels[i], out_channel,
                               kernel_size=stride, stride=stride, rngs=rngs))

        self.deblocks = nnx.List(deblocks)

    def __call__(self, xs):
        ups = [deblock(x) for x, deblock in zip(xs, self.deblocks)]
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0]
