"""VoVNet(CP) backbone (reference: paddle3d/models/backbones/vovnet.py:240,
vovnetcp.py:366 — the PETR V99 image backbone).

One-Shot-Aggregation blocks: a chain of 3x3 convs whose outputs (plus the
input) concat into a 1x1 aggregation conv, with optional identity residual
and eSE channel attention. VoVNetCP = same net under jax.checkpoint
(rematerialization replaces the reference's recompute wrappers).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ..layers.layer_libs import uniform_init

__all__ = ["VoVNet", "VoVNetCP"]

_STAGE_SPECS = {
    # name: (stem_ch, stage_conv_ch, stage_out_ch, layers_per_block,
    #        blocks_per_stage)
    "V-19-eSE": ((64, 64, 128), (128, 160, 192, 224),
                 (256, 512, 768, 1024), 3, (1, 1, 1, 1)),
    "V-39-eSE": ((64, 64, 128), (128, 160, 192, 224),
                 (256, 512, 768, 1024), 5, (1, 1, 2, 2)),
    "V-57-eSE": ((64, 64, 128), (128, 160, 192, 224),
                 (256, 512, 768, 1024), 5, (1, 1, 4, 3)),
    "V-99-eSE": ((64, 64, 128), (128, 160, 192, 224),
                 (256, 512, 768, 1024), 5, (1, 3, 9, 3)),
}


def _conv_bn_relu(cin, cout, k, stride=1, *, rngs):
    pad = (k - 1) // 2
    return nnx.Sequential(
        nnx.Conv(cin, cout, kernel_size=(k, k), strides=(stride, stride),
                 padding=[(pad, pad), (pad, pad)], use_bias=False,
                 kernel_init=uniform_init(), rngs=rngs),
        nnx.BatchNorm(cout, use_running_average=False, rngs=rngs),
        nnx.relu)


class eSEModule(nnx.Module):
    """Effective squeeze-excitation."""

    def __init__(self, channels, *, rngs):
        self.fc = nnx.Conv(channels, channels, kernel_size=(1, 1), rngs=rngs)

    def __call__(self, x):
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        return x * jax.nn.hard_sigmoid(self.fc(gap))


class OSABlock(nnx.Module):
    def __init__(self, cin, conv_ch, cout, num_layers, identity, *, rngs):
        self.identity = identity and cin == cout
        layers = []
        c = cin
        for _ in range(num_layers):
            layers.append(_conv_bn_relu(c, conv_ch, 3, rngs=rngs))
            c = conv_ch
        self.layers = nnx.List(layers)
        concat_ch = cin + num_layers * conv_ch
        self.concat_conv = _conv_bn_relu(concat_ch, cout, 1, rngs=rngs)
        self.ese = eSEModule(cout, rngs=rngs)

    def __call__(self, x):
        identity = x
        outs = [x]
        for layer in self.layers:
            x = layer(x)
            outs.append(x)
        out = self.ese(self.concat_conv(jnp.concatenate(outs, axis=-1)))
        if self.identity:
            out = out + identity
        return out


@manager.BACKBONES.add_component
class VoVNet(nnx.Module):
    def __init__(self,
                 spec_name: str = "V-99-eSE",
                 input_ch: int = 3,
                 out_features: Sequence[str] = ("stage4", "stage5"),
                 frozen_stages: int = -1,
                 remat: bool = False,
                 norm_eval: bool = False,
                 pretrained: str = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        if isinstance(out_features, str):
            # reference configs write the tuple as a YAML string, e.g.
            # "('stage4','stage5',)" (petr_vovnet_*.yml)
            import ast
            out_features = ast.literal_eval(out_features)
        stem_ch, conv_ch, out_ch, n_layers, n_blocks = _STAGE_SPECS[spec_name]
        self.norm_eval = norm_eval
        self.pretrained = pretrained
        self.out_features = tuple(out_features)
        self.remat = remat

        self.stem = nnx.List([
            _conv_bn_relu(input_ch, stem_ch[0], 3, stride=2, rngs=rngs),
            _conv_bn_relu(stem_ch[0], stem_ch[1], 3, rngs=rngs),
            _conv_bn_relu(stem_ch[1], stem_ch[2], 3, stride=2, rngs=rngs),
        ])
        stages = []
        cin = stem_ch[2]
        self.out_channels = []
        for i in range(4):
            blocks = []
            for j in range(n_blocks[i]):
                blocks.append(
                    OSABlock(cin if j == 0 else out_ch[i], conv_ch[i],
                             out_ch[i], n_layers, identity=j > 0, rngs=rngs))
            stages.append(nnx.List(blocks))
            cin = out_ch[i]
            self.out_channels.append(cin)
        self.stages = nnx.List(stages)
        if norm_eval:
            # reference norm_eval: BN uses running stats even in training
            # (frozen-pretrained-backbone fine-tuning)
            self.set_attributes(use_running_average=True,
                                raise_if_not_found=False)

    def __call__(self, x):
        for layer in self.stem:
            x = layer(x)
        outs = {}
        for i, stage in enumerate(self.stages):
            if i > 0:
                x = nnx.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                                 padding=((1, 1), (1, 1)))
            for blk in stage:
                x = blk(x)
            outs["stage{}".format(i + 2)] = x
        return tuple(outs[name] for name in self.out_features)


@manager.BACKBONES.add_component
def VoVNetCP(**kwargs):
    """Checkpointed variant (reference: vovnetcp.py) — rematerialize
    activations to trade FLOPs for memory."""
    kwargs.setdefault("remat", True)
    return VoVNet(**kwargs)
