"""ResNet backbone (reference: paddle3d/models/backbones/resnet.py:214 and
mm_resnet.py:434 — mmcv-style variant used by the camera models).

NHWC nnx implementation with out_indices multi-scale outputs, frozen stages
and BN-freeze flags (the knobs the reference configs use). Deformable conv
stages (DCN) are not implemented yet.
"""
from typing import Sequence

import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ..layers.layer_libs import uniform_init

__all__ = ["ResNet", "BasicBlock", "Bottleneck"]


def _conv(cin, cout, k, stride=1, dilation=1, *, rngs):
    pad = dilation * (k - 1) // 2
    return nnx.Conv(cin, cout, kernel_size=(k, k), strides=(stride, stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(dilation, dilation), use_bias=False,
                    kernel_init=uniform_init(), rngs=rngs)


def _bn(c, *, rngs):
    return nnx.BatchNorm(c, epsilon=1e-5, momentum=0.9,
                         use_running_average=False, rngs=rngs)


class BasicBlock(nnx.Module):
    expansion = 1

    def __init__(self, cin, cout, stride=1, dilation=1, downsample=False,
                 *, rngs):
        self.conv1 = _conv(cin, cout, 3, stride, dilation, rngs=rngs)
        self.bn1 = _bn(cout, rngs=rngs)
        self.conv2 = _conv(cout, cout, 3, 1, dilation, rngs=rngs)
        self.bn2 = _bn(cout, rngs=rngs)
        if downsample:
            self.down_conv = _conv(cin, cout, 1, stride, rngs=rngs)
            self.down_bn = _bn(cout, rngs=rngs)
        else:
            self.down_conv = None

    def __call__(self, x):
        identity = x
        out = nnx.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.down_conv is not None:
            identity = self.down_bn(self.down_conv(x))
        return nnx.relu(out + identity)


class Bottleneck(nnx.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, dilation=1, downsample=False,
                 *, rngs):
        cout = planes * self.expansion
        self.conv1 = _conv(cin, planes, 1, rngs=rngs)
        self.bn1 = _bn(planes, rngs=rngs)
        self.conv2 = _conv(planes, planes, 3, stride, dilation, rngs=rngs)
        self.bn2 = _bn(planes, rngs=rngs)
        self.conv3 = _conv(planes, cout, 1, rngs=rngs)
        self.bn3 = _bn(cout, rngs=rngs)
        if downsample:
            self.down_conv = _conv(cin, cout, 1, stride, rngs=rngs)
            self.down_bn = _bn(cout, rngs=rngs)
        else:
            self.down_conv = None

    def __call__(self, x):
        identity = x
        out = nnx.relu(self.bn1(self.conv1(x)))
        out = nnx.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.down_conv is not None:
            identity = self.down_bn(self.down_conv(x))
        return nnx.relu(out + identity)


_ARCH = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@manager.BACKBONES.add_component
class ResNet(nnx.Module):
    def __init__(self,
                 depth: int = 50,
                 in_channels: int = 3,
                 base_channels: int = 64,
                 out_indices: Sequence[int] = (0, 1, 2, 3),
                 strides: Sequence[int] = (1, 2, 2, 2),
                 dilations: Sequence[int] = (1, 1, 1, 1),
                 frozen_stages: int = -1,
                 norm_eval: bool = False,
                 layers: int = None,
                 return_idx: Sequence[int] = None,
                 rngs: nnx.Rngs = None):
        # reference config synonyms: paddleseg ResNet says `layers`,
        # paddledet says `return_idx` (config.py cross-suite escapes)
        if layers is not None:
            depth = layers
        if return_idx is not None:
            out_indices = return_idx
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        block, layer_nums = _ARCH[depth]
        self.depth = depth
        self.out_indices = tuple(out_indices)
        self.frozen_stages = frozen_stages
        self.norm_eval = norm_eval

        self.stem_conv = nnx.Conv(
            in_channels, base_channels, kernel_size=(7, 7), strides=(2, 2),
            padding=[(3, 3), (3, 3)], use_bias=False,
            kernel_init=uniform_init(), rngs=rngs)
        self.stem_bn = _bn(base_channels, rngs=rngs)

        stages = []
        cin = base_channels
        self.out_channels = []
        for i, n in enumerate(layer_nums):
            planes = base_channels * (2 ** i)
            blocks = []
            for j in range(n):
                stride = strides[i] if j == 0 else 1
                need_down = (j == 0 and
                             (stride != 1 or cin != planes * block.expansion))
                blocks.append(
                    block(cin, planes, stride, dilations[i],
                          downsample=need_down, rngs=rngs))
                cin = planes * block.expansion
            stages.append(nnx.List(blocks))
            self.out_channels.append(cin)
        self.stages = nnx.List(stages)

    def __call__(self, x):
        """x: [B, H, W, 3] -> tuple of stage outputs at out_indices."""
        x = nnx.relu(self.stem_bn(self.stem_conv(x)))
        x = nnx.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)))
        outs = []
        for i, stage in enumerate(self.stages):
            for blk in stage:
                x = blk(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
