"""Neural rendering suite (reference: contrib/PaddleRendering/pprndr):
encoders vs closed form, volume rendering invariants, importance sampling,
and NGP/NeRF overfitting the procedural sphere scene."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx


def test_sh_encoder_closed_form():
    from paddle3d_tpu.rendering import SHEncoder

    enc = SHEncoder(4)
    d = jnp.asarray([[0., 0., 1.]])  # +z
    out = np.asarray(enc(d))[0]
    assert out.shape == (16,)
    np.testing.assert_allclose(out[0], 0.28209479, atol=1e-6)   # Y00
    np.testing.assert_allclose(out[2], 0.48860251, atol=1e-6)   # Y10 ~ z
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)          # ~ -y
    np.testing.assert_allclose(out[3], 0.0, atol=1e-6)          # ~ -x
    # Y20 at z=1: 0.94617469... * 1 - 0.31539156... = 0.63078313
    np.testing.assert_allclose(out[6], 0.63078313, atol=1e-6)


def test_hash_grid_encoder(rng):
    from paddle3d_tpu.rendering import HashGridEncoder

    enc = HashGridEncoder(num_levels=4, features_per_level=2,
                          log2_hashmap_size=10, base_resolution=4,
                          max_resolution=32)
    x = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    out = enc(x)
    assert out.shape == (64, 8)
    # continuity: nearby points give nearby encodings
    out2 = enc(x + 1e-4)
    assert float(jnp.abs(out - out2).max()) < 1e-2
    # gradients flow into the table
    gd, state = nnx.split(enc)

    def loss(s):
        return jnp.sum(nnx.merge(gd, s)(x) ** 2)

    g = jax.grad(loss)(state)
    total = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
    assert total > 0


def test_render_rays_closed_form():
    from paddle3d_tpu.rendering import render_rays

    t = jnp.asarray([[1.0, 2.0, 3.0]])
    colors = jnp.asarray([[[1., 0., 0.], [0., 1., 0.], [0., 0., 1.]]])
    # opaque second sample -> pure green, depth 2
    dens = jnp.asarray([[0.0, 1e9, 0.0]])
    out = render_rays(dens, colors, t)
    np.testing.assert_allclose(np.asarray(out["rgb"])[0], [0., 1., 0.],
                               atol=1e-5)
    np.testing.assert_allclose(float(out["depth"][0]), 2.0, atol=1e-4)
    # empty scene + white background -> white
    out2 = render_rays(jnp.zeros((1, 3)), colors, t,
                       white_background=True)
    np.testing.assert_allclose(np.asarray(out2["rgb"])[0], [1., 1., 1.],
                               atol=1e-5)


def test_sample_pdf_concentrates():
    from paddle3d_tpu.rendering import sample_pdf

    bins = jnp.linspace(0., 1., 9)[None]  # 8 bins
    w = jnp.zeros((1, 8)).at[0, 4].set(100.0)  # mass in bin 4: (0.5, 0.625)
    s = np.asarray(sample_pdf(jax.random.key(0), bins, w, 64,
                              perturb=True))
    frac = np.mean((s >= 0.5) & (s <= 0.625))
    assert frac > 0.9, frac


def test_undistort_roundtrip(rng):
    from paddle3d_tpu.rendering import radial_tangential_undistort

    k = jnp.asarray([0.1, -0.05, 0.001, 0.002])
    uv = jnp.asarray(rng.uniform(-0.5, 0.5, (32, 2)).astype(np.float32))

    def distort(p):
        x, y = p[:, 0], p[:, 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k[0] + k[1] * r2)
        xd = x * radial + 2 * k[2] * x * y + k[3] * (r2 + 2 * x * x)
        yd = y * radial + k[2] * (r2 + 2 * y * y) + 2 * k[3] * x * y
        return jnp.stack([xd, yd], axis=-1)

    undone = radial_tangential_undistort(distort(uv), k, iters=8)
    np.testing.assert_allclose(np.asarray(undone), np.asarray(uv),
                               atol=1e-4)


def test_instant_ngp_overfits_sphere():
    import optax

    from paddle3d_tpu.rendering import InstantNGP
    from paddle3d_tpu.rendering.datasets import SyntheticSphereRaysDataset

    ds = SyntheticSphereRaysDataset(num_batches=4, rays_per_batch=256)
    model = InstantNGP(num_samples=48, near=2.0, far=5.5,
                       num_levels=4, log2_hashmap_size=12,
                       base_resolution=4, max_resolution=64,
                       geo_width=32, color_width=32)
    optimizer = nnx.Optimizer(model, optax.adam(5e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            losses = m.train_forward(batch)
            return losses["loss"], losses
        (_, losses), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        optimizer.update(model, grads)
        return losses

    batches = [ds.collate_fn([ds[i]])[0] for i in range(4)]
    first = None
    last = None
    for it in range(30):
        losses = jax.device_get(step(model, optimizer,
                                     batches[it % len(batches)]))
        if first is None:
            first = losses["psnr"]
        last = losses["psnr"]
    assert last > first + 2.0, (first, last)  # PSNR climbs while overfitting

    out = model.test_forward(batches[0])
    assert out["rgb"].shape == (1, 256, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_nerf_coarse_fine_smoke(rng):
    import optax

    from paddle3d_tpu.rendering import NeRF

    model = NeRF(num_coarse=16, num_fine=16, near=2.0, far=5.5,
                 pos_freqs=4, dir_freqs=2, trunk_width=32, trunk_depth=2,
                 skip_at=1)
    o = rng.uniform(-1, 1, (64, 3)).astype(np.float32) + np.array(
        [0, 0, 3.5], np.float32)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    batch = {"rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d),
             "rgb": jnp.ones((64, 3), jnp.float32)}
    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        def loss_fn(m):
            return m.train_forward(batch)["loss"]
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(5)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert "rgb_coarse" not in model.test_forward(batch)


def test_rendering_trainer_e2e(tmp_path):
    """The rendering suite runs through the main Trainer: config -> train
    -> evaluate (PSNR metric) on the hermetic sphere scene."""
    import os

    from paddle3d_tpu.apis import Config, Trainer

    cfg = Config(path=os.path.join(
        os.path.dirname(__file__), "../../configs/rendering/"
        "instant_ngp_sphere_tiny.yml"), iters=8)
    trainer = Trainer(
        model=cfg.model, optimizer=cfg.optimizer, iters=8,
        train_dataset=cfg.train_dataset, val_dataset=cfg.val_dataset,
        batch_size=4, save_dir=str(tmp_path), save_interval=8,
        log_interval=4)
    trainer.train()
    metrics = trainer.evaluate()
    assert "psnr" in metrics and np.isfinite(metrics["psnr"])


@pytest.mark.parametrize("name,kwargs", [
    ("MipNeRF", dict(num_coarse=8, num_fine=8, trunk_width=32,
                     trunk_depth=2, num_freqs=4)),
    ("RefNeRF", dict(num_samples=8, trunk_width=32, trunk_depth=2,
                     pos_freqs=3)),
    ("NeuS", dict(num_samples=8, trunk_width=32, trunk_depth=2,
                  feat_dim=16, pos_freqs=3)),
    ("Plenoxels", dict(num_samples=8, resolution=16)),
    ("TensoRF", dict(num_samples=8, resolution=16, density_rank=2,
                     app_rank=4, app_dim=8)),
])
def test_new_family_trains(name, kwargs, rng):
    """Each added NeRF family (reference: pprndr/models/<name>) optimizes
    its photometric loss on a fixed ray batch and renders finite images."""
    import optax
    from paddle3d_tpu.apis import manager

    model = manager.MODELS.components_dict[name](**kwargs)
    r = 64
    rays_o = jnp.asarray(rng.uniform(-0.1, 0.1, (r, 3)).astype(np.float32))
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(d)
    rgb = jnp.asarray(rng.uniform(0, 1, (r, 3)).astype(np.float32))
    batch = {"rays_o": rays_o, "rays_d": rays_d, "rgb": rgb}

    optimizer = nnx.Optimizer(model, optax.adam(5e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer):
        def lf(m):
            return m.train_forward(batch)["loss"]
        loss, grads = nnx.value_and_grad(lf)(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer)) for _ in range(15)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"{name} loss did not decrease: {losses}"

    out = model.test_forward(batch)
    assert out["rgb"].shape == (r, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
