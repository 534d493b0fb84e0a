"""BEV-space ResNet (reference: paddle3d/models/backbones/custom_resnet.py:23
CustomResNet — the BEVDet BEV encoder)."""
from typing import Sequence

from flax import nnx

from ...apis import manager
from .resnet import BasicBlock

__all__ = ["CustomResNet"]


@manager.BACKBONES.add_component
class CustomResNet(nnx.Module):
    def __init__(self,
                 numC_input: int,
                 num_layer: Sequence[int] = (2, 2, 2),
                 num_channels: Sequence[int] = None,
                 stride: Sequence[int] = (2, 2, 2),
                 backbone_output_ids: Sequence[int] = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        num_channels = (list(num_channels) if num_channels is not None else
                        [numC_input * 2 ** (i + 1)
                         for i in range(len(num_layer))])
        self.backbone_output_ids = (list(backbone_output_ids)
                                    if backbone_output_ids is not None else
                                    list(range(len(num_layer))))
        stages = []
        cin = numC_input
        for i, n in enumerate(num_layer):
            blocks = [
                BasicBlock(cin, num_channels[i], stride=stride[i],
                           downsample=True, rngs=rngs)
            ]
            for _ in range(n - 1):
                blocks.append(
                    BasicBlock(num_channels[i], num_channels[i], rngs=rngs))
            stages.append(nnx.List(blocks))
            cin = num_channels[i]
        self.stages = nnx.List(stages)
        self.out_channels = num_channels

    def __call__(self, x):
        outs = []
        for i, stage in enumerate(self.stages):
            for blk in stage:
                x = blk(x)
            if i in self.backbone_output_ids:
                outs.append(x)
        return tuple(outs)
