"""FPN necks for camera models
(reference: paddle3d/models/necks/fpn.py:28 FPN + P6/P7 variants :178,206,
cp_fpn.py:31 CPFPN).

NHWC; upsampling is nearest-neighbor resize (XLA-friendly static shapes).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ..layers.layer_libs import uniform_bias_init, uniform_init

__all__ = ["FPN", "CPFPN"]


def _conv(cin, cout, k, stride=1, *, rngs):
    pad = (k - 1) // 2
    return nnx.Conv(cin, cout, kernel_size=(k, k), strides=(stride, stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_init=uniform_init(),
                    bias_init=uniform_bias_init(cin * k * k), rngs=rngs)


def _upsample2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


@manager.NECKS.add_component
class FPN(nnx.Module):
    def __init__(self,
                 in_channels: Sequence[int],
                 out_channels: int = 256,
                 num_outs: int = None,
                 start_level: int = 0,
                 add_extra_convs: bool = False,
                 relu_before_extra_convs: bool = False,
                 top_block=None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        # reference dd3d-style FPN top_block (LastLevelP6 / LastLevelP6P7)
        # appended after the pyramid levels
        self.top_block = top_block
        self.start_level = start_level
        self.num_ins = len(in_channels)
        self.num_outs = num_outs or (self.num_ins - start_level)
        self.add_extra_convs = add_extra_convs
        self.out_channels = out_channels  # consumers size projections off it
        self.relu_before_extra_convs = relu_before_extra_convs

        self.lateral_convs = nnx.List([
            _conv(in_channels[i], out_channels, 1, rngs=rngs)
            for i in range(start_level, self.num_ins)
        ])
        self.fpn_convs = nnx.List([
            _conv(out_channels, out_channels, 3, rngs=rngs)
            for _ in range(start_level, self.num_ins)
        ])
        n_extra = self.num_outs - (self.num_ins - start_level)
        extra = []
        cin = in_channels[-1] if add_extra_convs == "on_input" else \
            out_channels
        for i in range(n_extra):
            extra.append(_conv(cin if i == 0 and add_extra_convs == "on_input"
                               else out_channels, out_channels, 3, stride=2,
                               rngs=rngs))
        self.extra_convs = nnx.List(extra)

    def __call__(self, inputs):
        laterals = [
            conv(inputs[self.start_level + i])
            for i, conv in enumerate(self.lateral_convs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(laterals[i], laterals[i - 1].shape,
                                  method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [conv(lat) for conv, lat in zip(self.fpn_convs, laterals)]

        if self.num_outs > len(outs):
            if self.extra_convs:
                x = inputs[-1] if self.add_extra_convs == "on_input" else \
                    outs[-1]
                for i, conv in enumerate(self.extra_convs):
                    if i > 0 and self.relu_before_extra_convs:
                        x = nnx.relu(x)
                    x = conv(x)
                    outs.append(x)
            else:
                while len(outs) < self.num_outs:
                    outs.append(
                        nnx.max_pool(outs[-1], window_shape=(1, 1),
                                     strides=(2, 2)))
        if self.top_block is not None:
            src = inputs[-1] if getattr(self.top_block, "in_feature",
                                        "p5").startswith("res") else outs[-1]
            outs = list(outs) + list(self.top_block(src))
        return tuple(outs)


@manager.NECKS.add_component
class CPFPN(FPN):
    """Cross-stage partial FPN used by PETR (reference: cp_fpn.py:31) —
    same lateral/topdown structure, 3x3 convs only on the first level."""

    def __init__(self, in_channels, out_channels=256, num_outs=None,
                 rngs: nnx.Rngs = None):
        super().__init__(in_channels, out_channels, num_outs, rngs=rngs)
        # only level-0 keeps its 3x3 smoothing conv
        self.fpn_convs = nnx.List([self.fpn_convs[0]])

    def __call__(self, inputs):
        laterals = [
            conv(inputs[self.start_level + i])
            for i, conv in enumerate(self.lateral_convs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(laterals[i], laterals[i - 1].shape,
                                  method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            self.fpn_convs[0](laterals[0]) if i == 0 else laterals[i]
            for i in range(len(laterals))
        ]
        return tuple(outs)


@manager.NECKS.add_component
class FPNC(FPN):
    """BEVFusion camera neck (reference: fpnc.py:308): FPN levels upsampled
    to a common resolution, concatenated and fused to one map."""

    def __init__(self, in_channels, out_channels=256, num_outs=None,
                 final_dim=None, fuse_channels=None, rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        super().__init__(in_channels, out_channels, num_outs, rngs=rngs)
        n = len(in_channels)
        fuse_channels = fuse_channels or out_channels
        self.fuse = _conv(out_channels * n, fuse_channels, 3, rngs=rngs)
        self.out_channels = fuse_channels

    def __call__(self, inputs):
        outs = super().__call__(inputs)
        b, h, w, _ = outs[0].shape
        ups = [outs[0]] + [
            jax.image.resize(o, (b, h, w, o.shape[-1]), method="bilinear")
            for o in outs[1:]
        ]
        return (self.fuse(jnp.concatenate(ups, axis=-1)),)


@manager.NECKS.add_component
class LastLevelP6(nnx.Module):
    """FPN top block: one stride-2 conv producing P6 from P5 (reference:
    dd3d fpn top_block LastLevelP6)."""

    def __init__(self, in_channels: int, out_channels: int,
                 in_feature: str = "p5", rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.in_feature = in_feature
        self.p6 = nnx.Conv(in_channels, out_channels, kernel_size=(3, 3),
                           strides=(2, 2), padding="SAME", rngs=rngs)

    def __call__(self, x):
        return [self.p6(x)]


@manager.NECKS.add_component
class LastLevelP6P7(nnx.Module):
    """FPN top block producing P6 and P7 (reference: dd3d LastLevelP6P7 —
    stride-2 convs with a ReLU between)."""

    def __init__(self, in_channels: int, out_channels: int,
                 in_feature: str = "p5", rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.in_feature = in_feature
        self.p6 = nnx.Conv(in_channels, out_channels, kernel_size=(3, 3),
                           strides=(2, 2), padding="SAME", rngs=rngs)
        self.p7 = nnx.Conv(out_channels, out_channels, kernel_size=(3, 3),
                           strides=(2, 2), padding="SAME", rngs=rngs)

    def __call__(self, x):
        p6 = self.p6(x)
        return [p6, self.p7(nnx.relu(p6))]
