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


def test_swin_shapes():
    from paddle3d_tpu.models.backbones import SwinTransformer
    m = SwinTransformer(embed_dim=16, depths=(2, 2), num_heads=(2, 4),
                        window_size=4, patch_size=4, out_indices=(0, 1),
                        rngs=nnx.Rngs(0))
    x = jnp.ones((1, 64, 64, 3))
    s0, s1 = m(x)
    assert s0.shape == (1, 16, 16, 16)
    assert s1.shape == (1, 8, 8, 32)
    assert np.isfinite(np.asarray(s1)).all()


def test_swin_shifted_window_gradients(rng):
    import jax
    from paddle3d_tpu.models.backbones import SwinTransformer
    m = SwinTransformer(embed_dim=8, depths=(2,), num_heads=(2,),
                        window_size=4, patch_size=4, out_indices=(0,),
                        rngs=nnx.Rngs(0))
    gd, params = nnx.split(m, nnx.Param)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))

    def loss(p):
        mm = nnx.merge(gd, p)
        return jnp.sum(mm(x)[0] ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(g))


def test_cbswin_dual_tower(rng):
    """CBNet dual-Swin: assisting tower features injected into the lead."""
    import jax
    from paddle3d_tpu.models.backbones import CBSwinTransformer
    m = CBSwinTransformer(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                          window_size=4, patch_size=4, out_indices=(0, 1),
                          rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    s0, s1 = m(x)
    assert s0.shape == (1, 8, 8, 8)
    assert s1.shape == (1, 4, 4, 16)

    gd, params = nnx.split(m, nnx.Param)

    def loss(p):
        mm = nnx.merge(gd, p)
        return sum(jnp.sum(o ** 2) for o in mm(x))

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(v)).all() for v in flat)
    # the assisting tower must receive gradient through the injection
    asst = nnx.split(m.assist, nnx.Param)[1]
    assert len(jax.tree.leaves(asst)) > 0
