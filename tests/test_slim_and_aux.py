import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx


def test_fake_quant_ste():
    from paddle3d_tpu.slim import fake_quant
    x = jnp.linspace(-1, 1, 64)
    q = fake_quant(x, bits=8)
    assert float(jnp.abs(q - x).max()) < 1.0 / 127 + 1e-6
    # STE: gradient is identity
    g = jax.grad(lambda v: jnp.sum(fake_quant(v, 8) * 2))(x)
    np.testing.assert_allclose(np.asarray(g), 2.0)


def test_qat_wraps_and_runs():
    from paddle3d_tpu.slim import QAT, get_qat_config
    from paddle3d_tpu.models.backbones import SecondBackbone
    m = SecondBackbone(4, (8,), (1,), (1,), rngs=nnx.Rngs(0))
    QAT(get_qat_config()).quantize(m)
    y = m(jnp.ones((1, 16, 16, 4)))
    assert np.isfinite(np.asarray(y[0])).all()


def test_model_ema():
    from paddle3d_tpu.utils import SimpleModelEMA
    m = nnx.Linear(2, 2, rngs=nnx.Rngs(0))
    ema = SimpleModelEMA(m, decay=0.5)
    m.kernel[...] = m.kernel[...] + 1.0
    ema.update(m)
    backup = ema.apply_to(m)
    # ema weight = 0.5*old + 0.5*new = old + 0.5
    ema.restore(m, backup)


def test_multiview_transforms(rng):
    from paddle3d_tpu.sample import Sample
    from paddle3d_tpu.transforms import (GridMask, NormalizeMultiviewImage,
                                         PadMultiViewImage,
                                         ResizeCropFlipImage)
    s = Sample(path=None, modality="multiview")
    s.img = rng.integers(0, 255, (2, 30, 50, 3)).astype(np.float32)
    s.meta.lidar2imgs = np.broadcast_to(np.eye(4, dtype=np.float32),
                                        (2, 4, 4)).copy()
    s.meta.img2lidars = s.meta.lidar2imgs.copy()
    s = ResizeCropFlipImage(final_size=(32, 48), training=True)(s)
    assert s.img.shape == (2, 32, 48, 3)
    s = GridMask(prob=1.0)(s)
    s = NormalizeMultiviewImage([100.] * 3, [50.] * 3)(s)
    s = PadMultiViewImage(size_divisor=32)(s)
    assert s.img.shape == (2, 32, 64, 3)


def test_global_rot_scale_trans_image(rng):
    """gt transform and lidar2img update stay consistent: a box center
    projected before == its transformed center through the updated matrix."""
    from paddle3d_tpu.sample import Sample
    from paddle3d_tpu.transforms import GlobalRotScaleTransImage
    s = Sample(path=None, modality="multiview")
    s.bboxes_3d = np.array([[4., 2., -1., 1.9, 4.5, 1.6, 0.3, 0.5, 0.1]],
                           np.float32)
    l2i = np.eye(4, dtype=np.float32)[None]
    l2i[0, 0, 1] = 0.2  # arbitrary projective-ish row
    s.meta.lidar2imgs = l2i.copy()
    s.meta.img2lidars = np.linalg.inv(l2i)
    center0 = np.array([4., 2., -1., 1.])
    proj0 = l2i[0] @ center0
    s = GlobalRotScaleTransImage(translation_std=(0.5, 0.5, 0.2))(s)
    b = np.asarray(s.bboxes_3d)[0]
    proj1 = s.meta.lidar2imgs[0] @ np.array([b[0], b[1], b[2], 1.])
    np.testing.assert_allclose(proj1, proj0, atol=1e-4)
