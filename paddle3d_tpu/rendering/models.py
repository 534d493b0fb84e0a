"""NeRF-family models (reference: pprndr/models/nerf and instant_ngp —
coarse/fine hierarchical NeRF and the hash-grid NGP, each as train/test
forward pairs over fixed-size ray batches; the pprndr Trainer contract
maps onto the main Trainer via ray-batch datasets)."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..apis import manager
from .fields import (InstantNGPField, MipNeRFField, NeRFField,
                     PlenoxelGrid, SDFField, TensoRFField)
from .renderer import render_rays, trunc_exp
from .samplers import sample_pdf, sample_stratified

__all__ = ["NeRF", "InstantNGP", "MipNeRF", "RefNeRF", "NeuS",
           "Plenoxels", "TensoRF", "NF_MODELS"]


class _RadianceModel(nnx.Module):
    """Shared ray-batch train/test contract: batch = {rays_o [R,3],
    rays_d [R,3], rgb [R,3]} -> photometric loss / rendered rgb."""

    def _render(self, rays_o, rays_d, key, perturb):
        raise NotImplementedError

    def _extra_losses(self, out, losses) -> jnp.ndarray:
        """Model-specific regularizers (eikonal, TV, orientation...);
        returns an addend for the total loss and may record terms."""
        return jnp.asarray(0.)

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
        loss = loss + self._extra_losses(out, losses)
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


NF_MODELS = ("NeRF", "InstantNGP", "MipNeRF", "RefNeRF", "NeuS",
             "Plenoxels", "TensoRF")


def _conical_frustum_gaussian(rays_o, rays_d, t_edges, base_radius):
    """mip-NeRF conical frustum -> per-section Gaussian (mean [R,S,3],
    var [R,S,3]); t_edges [R, S+1] sorted (reference: pprndr mip_nerf
    cast_rays)."""
    t0 = t_edges[:, :-1]
    t1 = t_edges[:, 1:]
    t_mu = 0.5 * (t0 + t1)
    t_d = 0.5 * (t1 - t0)
    denom = 3. * t_mu ** 2 + t_d ** 2
    mu_t = t_mu + 2. * t_mu * t_d ** 2 / denom
    var_t = (t_d ** 2) / 3. - (4. / 15.) * (
        t_d ** 4 * (12. * t_mu ** 2 - t_d ** 2) / denom ** 2)
    var_r = base_radius ** 2 * (
        t_mu ** 2 / 4. + (5. / 12.) * t_d ** 2
        - (4. / 15.) * t_d ** 4 / denom)
    mean = rays_o[:, None] + rays_d[:, None] * mu_t[..., None]
    d2 = jnp.sum(rays_d ** 2, axis=-1, keepdims=True)
    dd = (rays_d ** 2) / jnp.maximum(d2, 1e-10)
    var = (var_t[..., None] * dd[:, None]
           + var_r[..., None] * (1. - dd)[:, None])
    return mean, var, t_mu


@manager.MODELS.add_component
class MipNeRF(_RadianceModel):
    """mip-NeRF (reference: pprndr/models/mip_nerf): conical-frustum
    integrated positional encodings, ONE multiscale field queried at both
    hierarchy levels (no separate coarse MLP)."""

    def __init__(self, num_coarse: int = 64, num_fine: int = 64,
                 near: float = 2.0, far: float = 6.0,
                 base_radius: float = 0.0008, white_background: bool = True,
                 field=None, rngs: nnx.Rngs = None, **field_kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.rngs = nnx.Rngs(sample=0)
        self.num_coarse = num_coarse
        self.num_fine = num_fine
        self.near, self.far = float(near), float(far)
        self.base_radius = float(base_radius)
        self.white_background = white_background
        self.field = field or MipNeRFField(rngs=rngs, **field_kwargs)

    def _level(self, rays_o, rays_d, t_edges):
        mean, var, t_mu = _conical_frustum_gaussian(
            rays_o, rays_d, t_edges, self.base_radius)
        dirs = jnp.broadcast_to(rays_d[:, None], mean.shape)
        sigma, rgb = self.field(mean, var, dirs)
        return render_rays(sigma, rgb, t_mu, rays_d, self.white_background)

    def _render(self, rays_o, rays_d, key, perturb):
        r = rays_o.shape[0]
        k1, k2 = jax.random.split(key)
        t_c = sample_stratified(k1, r, self.num_coarse + 1, self.near,
                                self.far, perturb=perturb)
        out_c = self._level(rays_o, rays_d, t_c)
        t_f = sample_pdf(k2, t_c, out_c["weights"], self.num_fine + 1,
                         perturb=perturb)
        out = self._level(rays_o, rays_d, jnp.sort(t_f, axis=-1))
        out["rgb_coarse"] = out_c["rgb"]
        return out


@manager.MODELS.add_component
class RefNeRF(_RadianceModel):
    """Ref-NeRF (reference: pprndr/models/ref_nerf): reflectance
    parameterization — the spatial MLP predicts density, diffuse color,
    tint, roughness and a normal; the directional MLP sees the view
    direction REFLECTED about that normal through a roughness-attenuated
    integrated directional encoding (SH damped by exp(-rho l(l+1)))."""

    def __init__(self, num_samples: int = 96, near: float = 2.0,
                 far: float = 6.0, white_background: bool = True,
                 pos_freqs: int = 8, trunk_width: int = 256,
                 trunk_depth: int = 8, sh_levels: int = 4,
                 orientation_weight: float = 0.1, rngs: nnx.Rngs = None):
        from .encoders import NeRFPositionalEncoding, SHEncoder
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.rngs = nnx.Rngs(sample=0)
        self.num_samples = num_samples
        self.near, self.far = float(near), float(far)
        self.white_background = white_background
        self.orientation_weight = float(orientation_weight)
        self.pos_enc = NeRFPositionalEncoding(pos_freqs)
        self.sh = SHEncoder(sh_levels)
        # per-SH-coefficient degree l (for the roughness attenuation)
        degs = []
        for l in range(sh_levels):
            degs += [l] * (2 * l + 1)
        self._sh_degrees = np.asarray(degs, np.float32)
        in_pos = 3 * self.pos_enc.out_mult
        self.trunk = nnx.List([])
        c = in_pos
        width = trunk_width
        for _ in range(trunk_depth):
            self.trunk.append(nnx.Linear(c, width, rngs=rngs))
            c = width
        # sigma(1) feat(128) diffuse(3) tint(3) roughness(1) normal(3)
        self.heads = nnx.Linear(width, 1 + 128 + 3 + 3 + 1 + 3, rngs=rngs)
        cin = 128 + self.sh.out_channels + 1
        self.spec1 = nnx.Linear(cin, width // 2, rngs=rngs)
        self.spec2 = nnx.Linear(width // 2, 3, rngs=rngs)

    def _render(self, rays_o, rays_d, key, perturb):
        r = rays_o.shape[0]
        t = sample_stratified(key, r, self.num_samples, self.near,
                              self.far, perturb=perturb)
        pts = rays_o[:, None] + rays_d[:, None] * t[..., None]
        h = self.pos_enc(pts)
        for lin in self.trunk:
            h = nnx.relu(lin(h))
        h = self.heads(h)
        sigma = trunc_exp(h[..., 0])
        feat = h[..., 1:129]
        diffuse = nnx.sigmoid(h[..., 129:132])
        tint = nnx.sigmoid(h[..., 132:135])
        rough = nnx.softplus(h[..., 135])
        normal = h[..., 136:139]
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)

        view = rays_d / jnp.maximum(
            jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-6)
        v = -jnp.broadcast_to(view[:, None], normal.shape)
        ndv = jnp.sum(normal * v, axis=-1, keepdims=True)
        refl = 2. * ndv * normal - v
        ide = self.sh(refl) * jnp.exp(
            -rough[..., None] * self._sh_degrees *
            (self._sh_degrees + 1.))
        spec_in = jnp.concatenate([feat, ide, ndv], axis=-1)
        spec = nnx.sigmoid(self.spec2(nnx.relu(self.spec1(spec_in))))
        rgb = jnp.clip(diffuse + tint * spec, 0., 1.)
        out = render_rays(sigma, rgb, t, rays_d, self.white_background)
        # orientation penalty: normals facing away from the camera
        out["orientation"] = jnp.mean(
            out["weights"] * jnp.maximum(
                0., jnp.sum(normal * jnp.broadcast_to(
                    view[:, None], normal.shape), axis=-1)) ** 2)
        return out

    def _extra_losses(self, out, losses):
        lo = self.orientation_weight * out["orientation"]
        losses["loss_orientation"] = lo
        return lo


@manager.MODELS.add_component
class NeuS(_RadianceModel):
    """NeuS (reference: pprndr/models/neus): SDF-based surface rendering —
    section alphas from the logistic CDF of the SDF, analytic normals via
    autodiff, eikonal regularization."""

    def __init__(self, num_samples: int = 64, near: float = 2.0,
                 far: float = 6.0, white_background: bool = True,
                 eikonal_weight: float = 0.1, field=None,
                 rngs: nnx.Rngs = None, **field_kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.rngs = nnx.Rngs(sample=0)
        self.num_samples = num_samples
        self.near, self.far = float(near), float(far)
        self.white_background = white_background
        self.eikonal_weight = float(eikonal_weight)
        self.field = field or SDFField(rngs=rngs, **field_kwargs)

    def _render(self, rays_o, rays_d, key, perturb):
        r = rays_o.shape[0]
        t = sample_stratified(key, r, self.num_samples + 1, self.near,
                              self.far, perturb=perturb)
        pts = rays_o[:, None] + rays_d[:, None] * t[..., None]
        sdf, feat = self.field.sdf(pts)
        inv_s = self.field.inv_s()
        # NeuS alpha: (Phi(s f_i) - Phi(s f_{i+1})) / Phi(s f_i), clipped
        cdf0 = nnx.sigmoid(sdf[:, :-1] * inv_s)
        cdf1 = nnx.sigmoid(sdf[:, 1:] * inv_s)
        alpha = jnp.clip((cdf0 - cdf1) / jnp.maximum(cdf0, 1e-6), 0., 1.)

        mid = 0.5 * (pts[:, :-1] + pts[:, 1:])
        grads = self.field.gradient(mid)
        normals = grads / jnp.maximum(
            jnp.linalg.norm(grads, axis=-1, keepdims=True), 1e-6)
        dirs = jnp.broadcast_to(rays_d[:, None], mid.shape)
        rgb = self.field.rgb(mid, dirs, normals,
                             0.5 * (feat[:, :-1] + feat[:, 1:]))

        trans = jnp.cumprod(1. - alpha + 1e-10, axis=-1)
        trans = jnp.concatenate(
            [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
        weights = alpha * trans
        t_mid = 0.5 * (t[:, :-1] + t[:, 1:])
        rgb_out = jnp.sum(weights[..., None] * rgb, axis=-2)
        acc = jnp.sum(weights, axis=-1)
        if self.white_background:
            rgb_out = rgb_out + (1. - acc[..., None])
        return {"rgb": rgb_out,
                "depth": jnp.sum(weights * t_mid, axis=-1),
                "acc": acc, "weights": weights,
                "eikonal": jnp.mean(
                    (jnp.linalg.norm(grads, axis=-1) - 1.) ** 2)}

    def _extra_losses(self, out, losses):
        le = self.eikonal_weight * out["eikonal"]
        losses["loss_eikonal"] = le
        return le


class _SampledFieldModel(_RadianceModel):
    """Single-pass stratified sampling over an explicit field."""

    def __init__(self, field, num_samples, near, far, white_background):
        self.rngs = nnx.Rngs(sample=0)
        self.field = field
        self.num_samples = num_samples
        self.near, self.far = float(near), float(far)
        self.white_background = white_background

    def _render(self, rays_o, rays_d, key, perturb):
        r = rays_o.shape[0]
        t = sample_stratified(key, r, self.num_samples, self.near,
                              self.far, perturb=perturb)
        pts = rays_o[:, None] + rays_d[:, None] * t[..., None]
        dirs = jnp.broadcast_to(rays_d[:, None], pts.shape)
        sigma, rgb = self.field(pts, dirs)
        return render_rays(sigma, rgb, t, rays_d, self.white_background)


@manager.MODELS.add_component
class Plenoxels(_SampledFieldModel):
    """Plenoxels (reference: pprndr/models/plenoxels): MLP-free dense
    SH voxel grid with total-variation regularization."""

    def __init__(self, num_samples: int = 96, near: float = 2.0,
                 far: float = 6.0, white_background: bool = True,
                 tv_weight: float = 1e-4, rngs: nnx.Rngs = None,
                 **field_kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        super().__init__(PlenoxelGrid(rngs=rngs, **field_kwargs),
                         num_samples, near, far, white_background)
        self.tv_weight = float(tv_weight)

    def _extra_losses(self, out, losses):
        tv = self.tv_weight * self.field.tv_loss()
        losses["loss_tv"] = tv
        return tv


@manager.MODELS.add_component
class TensoRF(_SampledFieldModel):
    """TensoRF (reference: pprndr/models/tensorf): VM tensor factorization
    of density/appearance with a small appearance decoder."""

    def __init__(self, num_samples: int = 96, near: float = 2.0,
                 far: float = 6.0, white_background: bool = True,
                 l1_weight: float = 1e-5, rngs: nnx.Rngs = None,
                 **field_kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        super().__init__(TensoRFField(rngs=rngs, **field_kwargs),
                         num_samples, near, far, white_background)
        self.l1_weight = float(l1_weight)

    def _extra_losses(self, out, losses):
        l1 = sum(jnp.mean(jnp.abs(p[...]))
                 for p in list(self.field.den_planes) +
                 list(self.field.den_lines))
        l1 = self.l1_weight * l1
        losses["loss_l1"] = l1
        return l1
