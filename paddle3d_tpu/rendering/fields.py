"""Radiance fields (reference: pprndr/models/fields + the ffmlp CUDA ext —
fused MLP becomes plain nnx.Linear stacks: XLA fuses small matmul chains on
the MXU without a hand-written kernel)."""
import jax.numpy as jnp
from flax import nnx

from .encoders import HashGridEncoder, NeRFPositionalEncoding, SHEncoder
from .renderer import trunc_exp

__all__ = ["NeRFField", "InstantNGPField"]


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
