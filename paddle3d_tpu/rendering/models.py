"""NeRF-family models (reference: pprndr/models/nerf and instant_ngp —
coarse/fine hierarchical NeRF and the hash-grid NGP, each as train/test
forward pairs over fixed-size ray batches; the pprndr Trainer contract
maps onto the main Trainer via ray-batch datasets)."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..apis import manager
from .fields import InstantNGPField, NeRFField
from .renderer import render_rays
from .samplers import sample_pdf, sample_stratified

__all__ = ["NeRF", "InstantNGP", "NF_MODELS"]


class _RadianceModel(nnx.Module):
    """Shared ray-batch train/test contract: batch = {rays_o [R,3],
    rays_d [R,3], rgb [R,3]} -> photometric loss / rendered rgb."""

    def _render(self, rays_o, rays_d, key, perturb):
        raise NotImplementedError

    def train_forward(self, batch) -> dict:
        key = self.rngs.sample()
        out = self._render(batch["rays_o"].reshape(-1, 3),
                           batch["rays_d"].reshape(-1, 3), key,
                           perturb=True)
        loss = jnp.mean((out["rgb"] - batch["rgb"].reshape(-1, 3)) ** 2)
        losses = {"loss_rgb": loss}
        if "rgb_coarse" in out:
            lc = jnp.mean(
                (out["rgb_coarse"] - batch["rgb"].reshape(-1, 3)) ** 2)
            losses["loss_rgb_coarse"] = lc
            loss = loss + lc
        losses["loss"] = loss
        # PSNR for logging (reference pprndr metrics)
        losses["psnr"] = -10.0 * jnp.log10(
            jnp.maximum(losses["loss_rgb"], 1e-8))
        return losses

    def test_forward(self, batch) -> dict:
        key = jax.random.key(0)
        shape = batch["rays_o"].shape
        out = self._render(batch["rays_o"].reshape(-1, 3),
                           batch["rays_d"].reshape(-1, 3), key,
                           perturb=False)
        lead = shape[:-1]
        return {"rgb": out["rgb"].reshape(lead + (3,)),
                "depth": out["depth"].reshape(lead),
                "acc": out["acc"].reshape(lead)}

    export_forward = test_forward

    @staticmethod
    def postprocess_to_samples(outputs, metas):
        from ..sample import Sample
        results = []
        rgb = np.asarray(outputs["rgb"])
        for i, meta in enumerate(metas):
            s = Sample(path=meta.get("path"), modality="image")
            s.data = rgb[i] if rgb.ndim == 3 else rgb
            s.meta.update(meta)
            results.append(s)
        return results


@manager.MODELS.add_component
class NeRF(_RadianceModel):
    """Hierarchical NeRF (reference: pprndr/models/nerf): coarse stratified
    pass, importance-resampled fine pass, both volume-rendered."""

    def __init__(self, num_coarse: int = 64, num_fine: int = 64,
                 near: float = 2.0, far: float = 6.0,
                 white_background: bool = True, field=None,
                 coarse_field=None, rngs: nnx.Rngs = None,
                 **field_kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.rngs = nnx.Rngs(sample=0)
        self.num_coarse = num_coarse
        self.num_fine = num_fine
        self.near = float(near)
        self.far = float(far)
        self.white_background = white_background
        self.coarse = coarse_field or NeRFField(rngs=rngs, **field_kwargs)
        self.fine = field or NeRFField(rngs=rngs, **field_kwargs)

    def _render(self, rays_o, rays_d, key, perturb):
        r = rays_o.shape[0]
        k1, k2 = jax.random.split(key)
        t_c = sample_stratified(k1, r, self.num_coarse, self.near,
                                self.far, perturb=perturb)
        pts = rays_o[:, None] + rays_d[:, None] * t_c[..., None]
        dirs = jnp.broadcast_to(rays_d[:, None], pts.shape)
        sigma, rgb = self.coarse(pts, dirs)
        out_c = render_rays(sigma, rgb, t_c, rays_d,
                            self.white_background)

        mids = 0.5 * (t_c[:, 1:] + t_c[:, :-1])
        t_f = sample_pdf(k2, mids, out_c["weights"][:, 1:-1],
                         self.num_fine, perturb=perturb)
        t_all = jnp.sort(jnp.concatenate([t_c, t_f], axis=-1), axis=-1)
        pts = rays_o[:, None] + rays_d[:, None] * t_all[..., None]
        dirs = jnp.broadcast_to(rays_d[:, None], pts.shape)
        sigma, rgb = self.fine(pts, dirs)
        out = render_rays(sigma, rgb, t_all, rays_d,
                          self.white_background)
        out["rgb_coarse"] = out_c["rgb"]
        return out


@manager.MODELS.add_component
class InstantNGP(_RadianceModel):
    """instant-NGP (reference: pprndr/models/instant_ngp): hash-grid field,
    single dense stratified pass (the CUDA occupancy-grid ray marcher
    becomes a fixed-count sampler — static shapes for TPU)."""

    def __init__(self, num_samples: int = 128, near: float = 2.0,
                 far: float = 6.0, white_background: bool = True,
                 field=None, rngs: nnx.Rngs = None, **field_kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.rngs = nnx.Rngs(sample=0)
        self.num_samples = num_samples
        self.near = float(near)
        self.far = float(far)
        self.white_background = white_background
        self.field = field or InstantNGPField(rngs=rngs, **field_kwargs)

    def _render(self, rays_o, rays_d, key, perturb):
        r = rays_o.shape[0]
        t = sample_stratified(key, r, self.num_samples, self.near,
                              self.far, perturb=perturb)
        pts = rays_o[:, None] + rays_d[:, None] * t[..., None]
        dirs = jnp.broadcast_to(rays_d[:, None], pts.shape)
        sigma, rgb = self.field(pts, dirs)
        return render_rays(sigma, rgb, t, rays_d, self.white_background)


NF_MODELS = ("NeRF", "InstantNGP")
