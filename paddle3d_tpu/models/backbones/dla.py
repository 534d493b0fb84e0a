"""DLA backbone with DLAUp/IDAUp aggregation
(reference: paddle3d/models/backbones/dla.py:29 — DLA-34 for SMOKE/DD3D).

NHWC nnx implementation of deep layer aggregation: base network of
hierarchical Trees, then iterative deep aggregation upsampling back to
down_ratio resolution. GroupNorm default matches the reference ("gn").
"""
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...apis import manager
from ..layers.layer_libs import uniform_init

__all__ = ["DLA", "DLA34"]


def _norm(c, norm_type, rngs):
    if norm_type == "gn":
        return nnx.GroupNorm(c, num_groups=min(32, c), rngs=rngs)
    return nnx.BatchNorm(c, epsilon=1e-5, momentum=0.9,
                         use_running_average=False, rngs=rngs)


def _bilinear_up_init(factor):
    """Bilinear-interpolation init for the IDAUp deconvs (the reference
    DLA's `_fill_up_weights`, dla.py:477 — depthwise bilinear kernels).
    A uniform-random deconv starts with a period-`factor` checkerboard
    that the stride-4 heatmap argmax then locks onto for hundreds of
    iterations (measured in the r5 SMOKE overfit: every top peak sat on
    the x%8==1, y%8==5 lattice while the true-center pixel stayed low).
    Starting from an exact bilinear upsampler removes the artifact."""
    def init(key, shape, dtype=jnp.float32):
        del key
        kh, kw, cin, cout = shape
        c = (2 * factor - 1 - factor % 2) / (2.0 * factor)
        w = 1 - np.abs(np.arange(kh) / factor - c)
        kern = np.zeros(shape, np.float32)
        eye = min(cin, cout)
        kern[:, :, np.arange(eye), np.arange(eye)] = (
            w[:, None] * w[None, :])[:, :, None]
        return jnp.asarray(kern, dtype)
    return init


def _conv(cin, cout, k, stride=1, dilation=1, *, rngs):
    pad = dilation * (k - 1) // 2
    return nnx.Conv(cin, cout, kernel_size=(k, k), strides=(stride, stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(dilation, dilation), use_bias=False,
                    kernel_init=uniform_init(), rngs=rngs)


class BasicBlock(nnx.Module):
    def __init__(self, cin, cout, stride=1, dilation=1, norm_type="gn",
                 *, rngs):
        self.conv1 = _conv(cin, cout, 3, stride, dilation, rngs=rngs)
        self.norm1 = _norm(cout, norm_type, rngs)
        self.conv2 = _conv(cout, cout, 3, 1, dilation, rngs=rngs)
        self.norm2 = _norm(cout, norm_type, rngs)

    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        out = nnx.relu(self.norm1(self.conv1(x)))
        out = self.norm2(self.conv2(out))
        return nnx.relu(out + residual)


class Root(nnx.Module):
    def __init__(self, cin, cout, kernel_size, residual, norm_type, *, rngs):
        self.conv = _conv(cin, cout, kernel_size, rngs=rngs)
        self.norm = _norm(cout, norm_type, rngs)
        self.residual = residual

    def __call__(self, *xs):
        x = self.conv(jnp.concatenate(xs, axis=-1))
        x = self.norm(x)
        if self.residual:
            x = x + xs[0]
        return nnx.relu(x)


class Tree(nnx.Module):
    def __init__(self, levels, cin, cout, stride=1, level_root=False,
                 root_dim=0, root_kernel_size=1, dilation=1,
                 root_residual=False, norm_type="gn", *, rngs):
        if root_dim == 0:
            root_dim = 2 * cout
        if level_root:
            root_dim += cin
        self.levels = levels
        self.level_root = level_root
        self.stride = stride

        if levels == 1:
            self.tree1 = BasicBlock(cin, cout, stride, dilation, norm_type,
                                    rngs=rngs)
            self.tree2 = BasicBlock(cout, cout, 1, dilation, norm_type,
                                    rngs=rngs)
            self.root = Root(root_dim, cout, root_kernel_size, root_residual,
                             norm_type, rngs=rngs)
        else:
            self.tree1 = Tree(levels - 1, cin, cout, stride,
                              root_dim=0, root_kernel_size=root_kernel_size,
                              dilation=dilation, root_residual=root_residual,
                              norm_type=norm_type, rngs=rngs)
            self.tree2 = Tree(levels - 1, cout, cout,
                              root_dim=root_dim + cout,
                              root_kernel_size=root_kernel_size,
                              dilation=dilation, root_residual=root_residual,
                              norm_type=norm_type, rngs=rngs)
            self.root = None

        if cin != cout:
            self.project_conv = _conv(cin, cout, 1, rngs=rngs)
            self.project_norm = _norm(cout, norm_type, rngs)
        else:
            self.project_conv = None

    def __call__(self, x, residual=None, children=None):
        children = [] if children is None else children
        if self.stride > 1:
            bottom = nnx.max_pool(x, window_shape=(self.stride, self.stride),
                                  strides=(self.stride, self.stride))
        else:
            bottom = x
        if self.project_conv is not None:
            residual = self.project_norm(self.project_conv(bottom))
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, residual)
        if self.levels == 1:
            x2 = self.tree2(x1)
            return self.root(x2, x1, *children)
        children.append(x1)
        return self.tree2(x1, children=children)


class DLABase(nnx.Module):
    def __init__(self, levels, channels, norm_type="gn", *, rngs):
        self.channels = channels
        self.base_conv = _conv(3, channels[0], 7, rngs=rngs)
        self.base_norm = _norm(channels[0], norm_type, rngs)
        self.level0_conv = _conv(channels[0], channels[0], 3, rngs=rngs)
        self.level0_norm = _norm(channels[0], norm_type, rngs)
        self.level1_conv = _conv(channels[0], channels[1], 3, stride=2,
                                 rngs=rngs)
        self.level1_norm = _norm(channels[1], norm_type, rngs)
        self.level2 = Tree(levels[2], channels[1], channels[2], 2,
                           level_root=False, norm_type=norm_type, rngs=rngs)
        self.level3 = Tree(levels[3], channels[2], channels[3], 2,
                           level_root=True, norm_type=norm_type, rngs=rngs)
        self.level4 = Tree(levels[4], channels[3], channels[4], 2,
                           level_root=True, norm_type=norm_type, rngs=rngs)
        self.level5 = Tree(levels[5], channels[4], channels[5], 2,
                           level_root=True, norm_type=norm_type, rngs=rngs)

    def __call__(self, x):
        x = nnx.relu(self.base_norm(self.base_conv(x)))
        y = []
        x = nnx.relu(self.level0_norm(self.level0_conv(x)))
        y.append(x)
        x = nnx.relu(self.level1_norm(self.level1_conv(x)))
        y.append(x)
        for lvl in (self.level2, self.level3, self.level4, self.level5):
            x = lvl(x)
            y.append(x)
        return y


class _UpConv(nnx.Module):
    """proj conv + learnable 2^f upsample (deconv) used by IDAUp."""

    def __init__(self, cin, cout, factor, norm_type, *, rngs):
        self.proj_conv = _conv(cin, cout, 3, rngs=rngs)
        self.proj_norm = _norm(cout, norm_type, rngs)
        self.factor = factor
        if factor > 1:
            self.up = nnx.ConvTranspose(
                cout, cout, kernel_size=(factor * 2, factor * 2),
                strides=(factor, factor), padding="SAME", use_bias=False,
                kernel_init=_bilinear_up_init(factor), rngs=rngs)
        else:
            self.up = None
        self.node_conv = _conv(cout, cout, 3, rngs=rngs)
        self.node_norm = _norm(cout, norm_type, rngs)

    def project(self, x):
        return nnx.relu(self.proj_norm(self.proj_conv(x)))

    def upsample(self, x):
        return self.up(x) if self.up is not None else x

    def node(self, x):
        return nnx.relu(self.node_norm(self.node_conv(x)))


class IDAUp(nnx.Module):
    def __init__(self, in_channels, out_channel, up_f, norm_type="gn",
                 *, rngs):
        self.ups = nnx.List([
            _UpConv(in_channels[i], out_channel, int(up_f[i]), norm_type,
                    rngs=rngs) for i in range(1, len(in_channels))
        ])
        self.first_channels = in_channels[0]
        self.out_channel = out_channel
        if in_channels[0] != out_channel:
            self.first_proj = _UpConv(in_channels[0], out_channel, 1,
                                      norm_type, rngs=rngs)
        else:
            self.first_proj = None

    def __call__(self, layers, startp, endp):
        if self.first_proj is not None:
            layers[startp] = self.first_proj.project(layers[startp])
        for i in range(startp + 1, endp):
            upc = self.ups[i - startp - 1]
            x = upc.upsample(upc.project(layers[i]))
            layers[i] = upc.node(x + layers[i - 1])
        return layers


class DLAUp(nnx.Module):
    def __init__(self, startp, channels, scales, norm_type="gn", *, rngs):
        self.startp = startp
        channels = list(channels)
        scales = list(scales)
        self.idas = nnx.List([])
        self.channels_schedule = []
        for i in range(len(channels) - 1):
            j = -i - 2
            self.idas.append(
                IDAUp(channels[j:], channels[j],
                      [s // scales[j] for s in scales[j:]],
                      norm_type, rngs=rngs))
            scales[j + 1:] = [scales[j] for _ in scales[j + 1:]]
            channels[j + 1:] = [channels[j] for _ in channels[j + 1:]]

    def __call__(self, layers):
        out = [layers[-1]]
        layers = list(layers)
        for i, ida in enumerate(self.idas):
            ida(layers, len(layers) - i - 2, len(layers))
            out.insert(0, layers[-1])
        return out



@manager.BACKBONES.add_component
class DLA(nnx.Module):
    """(reference: dla.py:29) levels/channels configurable; DLA34 defaults."""

    def __init__(self,
                 levels: Sequence[int] = (1, 1, 1, 2, 2, 1),
                 channels: Sequence[int] = (16, 32, 64, 128, 256, 512),
                 down_ratio: int = 4,
                 last_level: int = 5,
                 out_channel: int = 0,
                 norm_type: str = "gn",
                 pretrained: str = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.first_level = int(math.log2(down_ratio))
        self.last_level = last_level
        self.base = DLABase(list(levels), list(channels), norm_type,
                            rngs=rngs)
        scales = [2 ** i for i in range(len(channels[self.first_level:]))]
        self.dla_up = DLAUp(self.first_level, channels[self.first_level:],
                            scales, norm_type, rngs=rngs)
        if out_channel == 0:
            out_channel = channels[self.first_level]
        self.out_channels = out_channel
        up_scales = [2 ** i for i in
                     range(self.last_level - self.first_level)]
        self.ida_up = IDAUp(
            list(channels[self.first_level:self.last_level]), out_channel,
            up_scales, norm_type, rngs=rngs)

    def __call__(self, x):
        x = self.base(x)
        x = self.dla_up(x)
        y = [x[i] for i in range(self.last_level - self.first_level)]
        self.ida_up(y, 0, len(y))
        return y[-1]


@manager.BACKBONES.add_component
def DLA34(**kwargs):
    return DLA(levels=(1, 1, 1, 2, 2, 1),
               channels=(16, 32, 64, 128, 256, 512), **kwargs)


@manager.BACKBONES.add_component
class DLABase34(nnx.Module):
    """Multi-scale DLA-34 trunk for FPN consumers (reference: DD3D's
    backbone, configs/dd3d/dd3d_dla_34_kitti.yml:61-63 — DLABase34 with
    out_features=[3,4,5] feeding an FPN over strides 8/16/32)."""

    _CHANNELS = (16, 32, 64, 128, 256, 512)

    def __init__(self,
                 out_features: Sequence[int] = (3, 4, 5),
                 norm_type: str = "bn",
                 pretrained: str = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        if norm_type == "frozen_bn":  # we model FrozenBN as plain BN
            norm_type = "bn"
        self.out_features = list(out_features)
        self.base = DLABase([1, 1, 1, 2, 2, 1], list(self._CHANNELS),
                            norm_type, rngs=rngs)
        self.out_channels = [self._CHANNELS[i] for i in self.out_features]

    def __call__(self, x):
        y = self.base(x)
        return [y[i] for i in self.out_features]
