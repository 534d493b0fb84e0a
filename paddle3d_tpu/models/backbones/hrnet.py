"""HRNet backbone (reference: paddle3d/models/backbones/hrnet.py:30
HRNet_W18 — the SMOKE/CADDN high-resolution branch).

Parallel multi-resolution streams with repeated cross-resolution fusion;
the highest-resolution stream (optionally concat of all upsampled streams)
is the output.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ..layers.layer_libs import uniform_init
from .resnet import BasicBlock, Bottleneck

__all__ = ["HRNet", "HRNet_W18"]


def _conv_bn_relu(cin, cout, k, stride=1, relu=True, *, rngs):
    pad = (k - 1) // 2
    layers = [
        nnx.Conv(cin, cout, kernel_size=(k, k), strides=(stride, stride),
                 padding=[(pad, pad), (pad, pad)], use_bias=False,
                 kernel_init=uniform_init(), rngs=rngs),
        nnx.BatchNorm(cout, use_running_average=False, rngs=rngs),
    ]
    if relu:
        layers.append(nnx.relu)
    return nnx.Sequential(*layers)


class FuseLayer(nnx.Module):
    """Cross-resolution fusion: every stream receives every other stream
    resized + projected."""

    def __init__(self, channels: Sequence[int], *, rngs):
        self.n = len(channels)
        projs = []
        for i in range(self.n):        # target stream
            row = []
            for j in range(self.n):    # source stream
                if i == j:
                    row.append(None)
                elif j > i:  # upsample source
                    row.append(_conv_bn_relu(channels[j], channels[i], 1,
                                             relu=False, rngs=rngs))
                else:        # downsample source (stride-2 chain)
                    chain = []
                    c = channels[j]
                    for k in range(i - j):
                        cout = channels[i] if k == i - j - 1 else c
                        chain.append(_conv_bn_relu(
                            c, cout, 3, stride=2,
                            relu=(k != i - j - 1), rngs=rngs))
                        c = cout
                    row.append(nnx.Sequential(*chain))
            projs.append(nnx.List(row))
        self.projs = nnx.List(projs)

    def __call__(self, xs):
        outs = []
        for i in range(self.n):
            acc = xs[i]
            for j in range(self.n):
                if i == j:
                    continue
                y = self.projs[i][j](xs[j])
                if y.shape[1:3] != acc.shape[1:3]:
                    y = jax.image.resize(y, acc.shape, method="nearest")
                acc = acc + y
            outs.append(nnx.relu(acc))
        return outs


class Branch(nnx.Module):
    def __init__(self, channels, num_blocks, *, rngs):
        self.blocks = nnx.List([
            BasicBlock(channels, channels, rngs=rngs)
            for _ in range(num_blocks)
        ])

    def __call__(self, x):
        for blk in self.blocks:
            x = blk(x)
        return x


class Stage(nnx.Module):
    def __init__(self, channels: Sequence[int], num_blocks: int = 4,
                 *, rngs):
        self.branches = nnx.List([
            Branch(c, num_blocks, rngs=rngs) for c in channels
        ])
        self.fuse = FuseLayer(channels, rngs=rngs)

    def __call__(self, xs):
        xs = [b(x) for b, x in zip(self.branches, xs)]
        return self.fuse(xs)


@manager.BACKBONES.add_component
class HRNet(nnx.Module):
    def __init__(self, width: int = 18, num_modules: Sequence[int] = (1, 1, 1),
                 concat_output: bool = True, pretrained: str = None,
                 rngs: nnx.Rngs = None):
        self.pretrained = pretrained
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        w = width
        self.channels = [w, w * 2, w * 4, w * 8]
        self.concat_output = concat_output

        self.stem1 = _conv_bn_relu(3, 64, 3, stride=2, rngs=rngs)
        self.stem2 = _conv_bn_relu(64, 64, 3, stride=2, rngs=rngs)
        # layer1: one bottleneck block at 64 -> 256
        self.layer1 = Bottleneck(64, 64, downsample=True, rngs=rngs)
        self.trans1 = nnx.List([
            _conv_bn_relu(256, self.channels[0], 3, rngs=rngs),
            _conv_bn_relu(256, self.channels[1], 3, stride=2, rngs=rngs),
        ])
        self.stage2 = nnx.List([
            Stage(self.channels[:2], rngs=rngs)
            for _ in range(num_modules[0])
        ])
        self.trans2 = _conv_bn_relu(self.channels[1], self.channels[2], 3,
                                    stride=2, rngs=rngs)
        self.stage3 = nnx.List([
            Stage(self.channels[:3], rngs=rngs)
            for _ in range(num_modules[1])
        ])
        self.trans3 = _conv_bn_relu(self.channels[2], self.channels[3], 3,
                                    stride=2, rngs=rngs)
        self.stage4 = nnx.List([
            Stage(self.channels, rngs=rngs) for _ in range(num_modules[2])
        ])
        self.out_channels = (sum(self.channels) if concat_output
                             else self.channels[0])

    def __call__(self, x):
        x = self.stem2(self.stem1(x))
        x = self.layer1(x)
        xs = [self.trans1[0](x), self.trans1[1](x)]
        for m in self.stage2:
            xs = m(xs)
        xs = xs + [self.trans2(xs[-1])]
        for m in self.stage3:
            xs = m(xs)
        xs = xs + [self.trans3(xs[-1])]
        for m in self.stage4:
            xs = m(xs)
        if not self.concat_output:
            return xs[0]
        b, h, w, _ = xs[0].shape
        ups = [xs[0]] + [
            jax.image.resize(y, (b, h, w, y.shape[-1]), method="bilinear")
            for y in xs[1:]
        ]
        return jnp.concatenate(ups, axis=-1)


@manager.BACKBONES.add_component
def HRNet_W18(**kwargs):
    return HRNet(width=18, **kwargs)
