"""FPN_LSS neck (reference: paddle3d/models/necks/lss_fpn.py:23) —
upsample the deep BEV stage and fuse with the shallow one."""
import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ..layers.layer_libs import ConvBNReLU

__all__ = ["FPN_LSS"]


@manager.NECKS.add_component
class FPN_LSS(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int,
                 scale_factor: int = 4, rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.scale_factor = scale_factor
        self.conv1 = ConvBNReLU(in_channels, out_channels, 3, rngs=rngs)
        self.conv2 = ConvBNReLU(out_channels, out_channels, 3, rngs=rngs)

    def __call__(self, feats):
        """feats: (shallow [B,H,W,C1], deep [B,H/s,W/s,C2]) -> fused."""
        x1, x2 = feats[0], feats[-1]
        b, h, w, _ = x1.shape
        x2 = jax.image.resize(x2, (b, h, w, x2.shape[-1]), method="bilinear")
        x = jnp.concatenate([x1, x2], axis=-1)
        return self.conv2(self.conv1(x))
