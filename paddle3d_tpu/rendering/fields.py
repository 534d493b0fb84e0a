"""Radiance fields (reference: pprndr/models/fields + the ffmlp CUDA ext —
fused MLP becomes plain nnx.Linear stacks: XLA fuses small matmul chains on
the MXU without a hand-written kernel)."""
import jax
import jax.numpy as jnp
from flax import nnx

from .encoders import HashGridEncoder, NeRFPositionalEncoding, SHEncoder
from .renderer import trunc_exp

__all__ = ["NeRFField", "InstantNGPField", "MipNeRFField",
           "SDFField", "PlenoxelGrid", "TensoRFField"]


class NeRFField(nnx.Module):
    """Vanilla NeRF MLP (reference: pprndr/models/nerf fields): 8x256 trunk
    on gamma(x) with a skip, density head + view-dependent color head."""

    def __init__(self, pos_freqs: int = 10, dir_freqs: int = 4,
                 trunk_width: int = 256, trunk_depth: int = 8,
                 skip_at: int = 4, rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.pos_enc = NeRFPositionalEncoding(pos_freqs)
        self.dir_enc = NeRFPositionalEncoding(dir_freqs)
        self.skip_at = skip_at
        in_pos = 3 * self.pos_enc.out_mult
        in_dir = 3 * self.dir_enc.out_mult
        self.trunk = nnx.List([])
        c = in_pos
        for i in range(trunk_depth):
            if i == skip_at:
                c += in_pos
            self.trunk.append(nnx.Linear(c, trunk_width, rngs=rngs))
            c = trunk_width
        self.sigma_head = nnx.Linear(trunk_width, 1, rngs=rngs)
        self.feat_head = nnx.Linear(trunk_width, trunk_width, rngs=rngs)
        self.color1 = nnx.Linear(trunk_width + in_dir, trunk_width // 2,
                                 rngs=rngs)
        self.color2 = nnx.Linear(trunk_width // 2, 3, rngs=rngs)

    def __call__(self, xyz, dirs):
        """xyz [..., 3] (scene units), dirs [..., 3] unit ->
        (sigma [...], rgb [..., 3])."""
        pe = self.pos_enc(xyz)
        h = pe
        for i, lin in enumerate(self.trunk):
            if i == self.skip_at:
                h = jnp.concatenate([h, pe], axis=-1)
            h = nnx.relu(lin(h))
        sigma = trunc_exp(self.sigma_head(h)[..., 0])
        feat = self.feat_head(h)
        de = self.dir_enc(dirs)
        h2 = nnx.relu(self.color1(jnp.concatenate([feat, de], axis=-1)))
        rgb = nnx.sigmoid(self.color2(h2))
        return sigma, rgb


class InstantNGPField(nnx.Module):
    """instant-NGP field (reference: pprndr/models/instant_ngp): hash-grid
    position encoding -> tiny sigma MLP; SH direction encoding -> tiny
    color MLP."""

    def __init__(self, aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5),
                 num_levels: int = 8, features_per_level: int = 2,
                 log2_hashmap_size: int = 15, base_resolution: int = 16,
                 max_resolution: int = 512, geo_width: int = 64,
                 geo_feat_dim: int = 15, color_width: int = 64,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.aabb = tuple(map(float, aabb))
        self.grid = HashGridEncoder(
            num_levels=num_levels, features_per_level=features_per_level,
            log2_hashmap_size=log2_hashmap_size,
            base_resolution=base_resolution,
            max_resolution=max_resolution, rngs=rngs)
        self.sh = SHEncoder(4)
        gin = self.grid.out_channels
        self.geo1 = nnx.Linear(gin, geo_width, rngs=rngs)
        self.geo2 = nnx.Linear(geo_width, 1 + geo_feat_dim, rngs=rngs)
        cin = geo_feat_dim + self.sh.out_channels
        self.col1 = nnx.Linear(cin, color_width, rngs=rngs)
        self.col2 = nnx.Linear(color_width, color_width, rngs=rngs)
        self.col3 = nnx.Linear(color_width, 3, rngs=rngs)

    def __call__(self, xyz, dirs):
        lo = jnp.asarray(self.aabb[:3])
        hi = jnp.asarray(self.aabb[3:])
        x01 = jnp.clip((xyz - lo) / (hi - lo), 0., 1.)
        g = self.grid(x01)
        h = self.geo2(nnx.relu(self.geo1(g)))
        sigma = trunc_exp(h[..., 0])
        feat = h[..., 1:]
        sh = self.sh(dirs)
        h2 = nnx.relu(self.col1(jnp.concatenate([feat, sh], axis=-1)))
        h2 = nnx.relu(self.col2(h2))
        rgb = nnx.sigmoid(self.col3(h2))
        return sigma, rgb


class MipNeRFField(nnx.Module):
    """mip-NeRF multiscale MLP (reference: pprndr/models/mip_nerf): one MLP
    serves both hierarchy levels, queried with integrated positional
    encodings of conical-frustum Gaussians instead of point encodings."""

    def __init__(self, num_freqs: int = 12, dir_freqs: int = 4,
                 trunk_width: int = 256, trunk_depth: int = 8,
                 skip_at: int = 4, rngs: nnx.Rngs = None):
        from .encoders import IntegratedPositionalEncoding
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.ipe = IntegratedPositionalEncoding(num_freqs)
        self.dir_enc = NeRFPositionalEncoding(dir_freqs)
        self.skip_at = skip_at
        in_pos = 3 * self.ipe.out_mult
        in_dir = 3 * self.dir_enc.out_mult
        self.trunk = nnx.List([])
        c = in_pos
        for i in range(trunk_depth):
            if i == skip_at:
                c += in_pos
            self.trunk.append(nnx.Linear(c, trunk_width, rngs=rngs))
            c = trunk_width
        self.sigma_head = nnx.Linear(trunk_width, 1, rngs=rngs)
        self.feat_head = nnx.Linear(trunk_width, trunk_width, rngs=rngs)
        self.color1 = nnx.Linear(trunk_width + in_dir, trunk_width // 2,
                                 rngs=rngs)
        self.color2 = nnx.Linear(trunk_width // 2, 3, rngs=rngs)

    def __call__(self, mean, var, dirs):
        pe = self.ipe(mean, var)
        h = pe
        for i, lin in enumerate(self.trunk):
            if i == self.skip_at:
                h = jnp.concatenate([h, pe], axis=-1)
            h = nnx.relu(lin(h))
        sigma = trunc_exp(self.sigma_head(h)[..., 0])
        feat = self.feat_head(h)
        de = self.dir_enc(dirs)
        h2 = nnx.relu(self.color1(jnp.concatenate([feat, de], axis=-1)))
        rgb = nnx.sigmoid(self.color2(h2))
        return sigma, rgb


class SDFField(nnx.Module):
    """NeuS signed-distance + color field (reference: pprndr/models/neus):
    geometric-init-style MLP producing (sdf, feature); color MLP conditioned
    on position, normal, view dir and feature; a learned single-variance
    parameter controls the logistic CDF sharpness."""

    def __init__(self, pos_freqs: int = 6, trunk_width: int = 256,
                 trunk_depth: int = 8, skip_at: int = 4,
                 feat_dim: int = 256, init_variance: float = 0.3,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.pos_enc = NeRFPositionalEncoding(pos_freqs)
        in_pos = 3 * self.pos_enc.out_mult
        self.skip_at = skip_at
        self.trunk = nnx.List([])
        c = in_pos
        for i in range(trunk_depth):
            if i == skip_at:
                c += in_pos
            self.trunk.append(nnx.Linear(c, trunk_width, rngs=rngs))
            c = trunk_width
        self.sdf_head = nnx.Linear(trunk_width, 1 + feat_dim, rngs=rngs)
        self.color = nnx.List([
            nnx.Linear(3 + 3 + 3 + feat_dim, trunk_width // 2, rngs=rngs),
            nnx.Linear(trunk_width // 2, 3, rngs=rngs),
        ])
        # s = exp(10 * variance) as in NeuS
        self.variance = nnx.Param(jnp.asarray([init_variance]))

    def sdf(self, xyz):
        pe = self.pos_enc(xyz)
        h = pe
        for i, lin in enumerate(self.trunk):
            if i == self.skip_at:
                h = jnp.concatenate([h, pe], axis=-1)
            h = nnx.relu(lin(h))
        out = self.sdf_head(h)
        return out[..., 0], out[..., 1:]

    def gradient(self, xyz):
        """Analytic SDF spatial gradient (normals) via autodiff."""
        flat = xyz.reshape(-1, 3)
        g = jax.vmap(jax.grad(lambda p: self.sdf(p[None])[0][0]))(flat)
        return g.reshape(xyz.shape)

    def rgb(self, xyz, dirs, normals, feat):
        h = jnp.concatenate([xyz, dirs, normals, feat], axis=-1)
        h = nnx.relu(self.color[0](h))
        return nnx.sigmoid(self.color[1](h))

    def inv_s(self):
        return jnp.exp(10.0 * self.variance[0])


class PlenoxelGrid(nnx.Module):
    """Plenoxels explicit field (reference: pprndr/models/plenoxels): a
    dense voxel grid holding density + degree-2 SH color coefficients,
    sampled by trilinear interpolation — no MLP anywhere."""

    def __init__(self, resolution: int = 64, sh_degree: int = 2,
                 aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5),
                 rngs: nnx.Rngs = None):
        from .encoders import SHEncoder
        self.aabb = tuple(map(float, aabb))
        self.res = int(resolution)
        self.sh = SHEncoder(sh_degree + 1)
        nsh = self.sh.out_channels
        self.n_sh = nsh
        # [R, R, R, 1 + 3*nsh]: density logit + SH coeffs per RGB channel
        self.grid = nnx.Param(
            jnp.zeros((self.res, self.res, self.res, 1 + 3 * nsh)))

    def _trilinear(self, x01):
        r = self.res
        g = self.grid[...]
        pos = jnp.clip(x01, 0., 1.) * (r - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, r - 2)
        f = pos - lo
        vals = 0.
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = ((f[..., 0] if dx else 1 - f[..., 0]) *
                         (f[..., 1] if dy else 1 - f[..., 1]) *
                         (f[..., 2] if dz else 1 - f[..., 2]))
                    corner = g[lo[..., 0] + dx, lo[..., 1] + dy,
                               lo[..., 2] + dz]
                    vals = vals + w[..., None] * corner
        return vals

    def __call__(self, xyz, dirs):
        lo = jnp.asarray(self.aabb[:3])
        hi = jnp.asarray(self.aabb[3:])
        v = self._trilinear((xyz - lo) / (hi - lo))
        sigma = nnx.softplus(v[..., 0])
        sh_basis = self.sh(dirs)  # [..., nsh]
        coeffs = v[..., 1:].reshape(v.shape[:-1] + (3, self.n_sh))
        rgb = nnx.sigmoid(jnp.sum(coeffs * sh_basis[..., None, :], axis=-1))
        return sigma, rgb

    def tv_loss(self):
        g = self.grid[...]
        dx = jnp.mean((g[1:] - g[:-1]) ** 2)
        dy = jnp.mean((g[:, 1:] - g[:, :-1]) ** 2)
        dz = jnp.mean((g[:, :, 1:] - g[:, :, :-1]) ** 2)
        return dx + dy + dz


class TensoRFField(nnx.Module):
    """TensoRF VM-decomposed field (reference: pprndr/models/tensorf):
    density and appearance tensors factored as sums of plane x line outer
    products over the three axis pairings; a tiny MLP decodes appearance
    features to view-dependent color."""

    def __init__(self, resolution: int = 64, density_rank: int = 8,
                 app_rank: int = 24, app_dim: int = 27,
                 aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5),
                 dir_freqs: int = 2, rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.aabb = tuple(map(float, aabb))
        self.res = int(resolution)
        r = self.res
        k = rngs.params()
        import jax.random as jr
        ks = jr.split(k, 12)
        scale = 0.1
        # plane/line factors per axis pairing: (xy,z), (xz,y), (yz,x)
        self.den_planes = nnx.List([
            nnx.Param(scale * jr.normal(ks[i], (density_rank, r, r)))
            for i in range(3)])
        self.den_lines = nnx.List([
            nnx.Param(scale * jr.normal(ks[3 + i], (density_rank, r)))
            for i in range(3)])
        self.app_planes = nnx.List([
            nnx.Param(scale * jr.normal(ks[6 + i], (app_rank, r, r)))
            for i in range(3)])
        self.app_lines = nnx.List([
            nnx.Param(scale * jr.normal(ks[9 + i], (app_rank, r)))
            for i in range(3)])
        self.basis = nnx.Linear(3 * app_rank, app_dim, use_bias=False,
                                rngs=rngs)
        self.dir_enc = NeRFPositionalEncoding(dir_freqs)
        cin = app_dim + 3 * self.dir_enc.out_mult
        self.dec1 = nnx.Linear(cin, 128, rngs=rngs)
        self.dec2 = nnx.Linear(128, 3, rngs=rngs)

    @staticmethod
    def _interp1(line, t01):
        """line [K, R]; t01 [...] in [0,1] -> [..., K]."""
        r = line.shape[-1]
        pos = jnp.clip(t01, 0., 1.) * (r - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, r - 2)
        f = pos - lo
        a = line[:, lo]
        b = line[:, lo + 1]
        return jnp.moveaxis(a * (1 - f) + b * f, 0, -1)

    @staticmethod
    def _interp2(plane, u01, v01):
        """plane [K, R, R]; -> [..., K] bilinear."""
        r = plane.shape[-1]
        pu = jnp.clip(u01, 0., 1.) * (r - 1)
        pv = jnp.clip(v01, 0., 1.) * (r - 1)
        lu = jnp.clip(jnp.floor(pu).astype(jnp.int32), 0, r - 2)
        lv = jnp.clip(jnp.floor(pv).astype(jnp.int32), 0, r - 2)
        fu, fv = pu - lu, pv - lv
        out = 0.
        for du in (0, 1):
            for dv in (0, 1):
                w = ((fu if du else 1 - fu) * (fv if dv else 1 - fv))
                out = out + w[..., None] * jnp.moveaxis(
                    plane[:, lu + du, lv + dv], 0, -1)
        return out

    def _vm(self, planes, lines, x01):
        pairs = ((0, 1, 2), (0, 2, 1), (1, 2, 0))  # (u, v, line-axis)
        feats = []
        for (u, v, w), pl, ln in zip(pairs, planes, lines):
            p = self._interp2(pl[...], x01[..., u], x01[..., v])
            l = self._interp1(ln[...], x01[..., w])
            feats.append(p * l)
        return feats

    def __call__(self, xyz, dirs):
        lo = jnp.asarray(self.aabb[:3])
        hi = jnp.asarray(self.aabb[3:])
        x01 = jnp.clip((xyz - lo) / (hi - lo), 0., 1.)
        den = sum(f.sum(-1) for f in self._vm(self.den_planes,
                                              self.den_lines, x01))
        sigma = nnx.softplus(den)
        app = jnp.concatenate(self._vm(self.app_planes, self.app_lines,
                                       x01), axis=-1)
        feat = self.basis(app)
        de = self.dir_enc(dirs)
        h = nnx.relu(self.dec1(jnp.concatenate([feat, de], axis=-1)))
        rgb = nnx.sigmoid(self.dec2(h))
        return sigma, rgb
