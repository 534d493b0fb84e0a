import numpy as np
import jax.numpy as jnp
from flax import nnx


def test_vovnet_shapes():
    from paddle3d_tpu.models.backbones import VoVNet
    m = VoVNet(spec_name="V-19-eSE", out_features=("stage4", "stage5"),
               rngs=nnx.Rngs(0))
    x = jnp.ones((1, 64, 64, 3))
    s4, s5 = m(x)
    assert s4.shape == (1, 4, 4, 768)
    assert s5.shape == (1, 2, 2, 1024)
    assert np.isfinite(np.asarray(s5)).all()


def test_hrnet_shapes():
    from paddle3d_tpu.models.backbones import HRNet
    m = HRNet(width=8, rngs=nnx.Rngs(0))
    x = jnp.ones((1, 64, 64, 3))
    y = m(x)
    # concat of 4 streams at 1/4 resolution
    assert y.shape == (1, 16, 16, 8 + 16 + 32 + 64)
    assert np.isfinite(np.asarray(y)).all()
