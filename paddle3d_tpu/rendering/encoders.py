"""Input encoders (reference: pprndr/cpp_extensions grid_encoder (hash grid,
604 LoC CUDA), sh_encoder (873 LoC CUDA), and the NeRF frequency encoding).

TPU-native: the multiresolution hash grid is a table gather + trilinear
blend (XLA gathers batch perfectly at these sizes); spherical harmonics are
closed-form polynomials (pure VPU); both differentiate by autodiff — no
hand-written backward kernels.
"""
import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["HashGridEncoder", "SHEncoder", "NeRFPositionalEncoding",
           "IntegratedPositionalEncoding"]

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


class NeRFPositionalEncoding(nnx.Module):
    """sin/cos frequency encoding (reference: NeRF gamma(p))."""

    def __init__(self, num_freqs: int = 10, include_input: bool = True):
        self.num_freqs = num_freqs
        self.include_input = include_input

    @property
    def out_mult(self):
        return 2 * self.num_freqs + (1 if self.include_input else 0)

    def __call__(self, x):
        freqs = (2.0 ** jnp.arange(self.num_freqs)) * jnp.pi
        xb = x[..., None, :] * freqs[:, None]  # [..., F, D]
        enc = jnp.concatenate(
            [jnp.sin(xb), jnp.cos(xb)], axis=-2)  # [..., 2F, D]
        enc = enc.reshape(x.shape[:-1] + (-1,))
        if self.include_input:
            enc = jnp.concatenate([x, enc], axis=-1)
        return enc


class HashGridEncoder(nnx.Module):
    """Multiresolution hash-grid encoder
    (reference: cpp_extensions/grid_encoder — instant-NGP).

    L levels of resolution N_l = floor(N_min * b**l); each level owns a
    2**log2_hashmap_size table of F-dim features; a point gathers its 8
    corner entries per level and blends trilinearly."""

    def __init__(self, num_levels: int = 8, features_per_level: int = 2,
                 log2_hashmap_size: int = 15, base_resolution: int = 16,
                 max_resolution: int = 512, rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.num_levels = num_levels
        self.features_per_level = features_per_level
        self.table_size = 2 ** log2_hashmap_size
        growth = (np.exp(np.log(max_resolution / base_resolution) /
                         max(num_levels - 1, 1))
                  if num_levels > 1 else 1.0)
        self.resolutions = [
            int(np.floor(base_resolution * growth ** l))
            for l in range(num_levels)
        ]
        self.table = nnx.Param(
            jax.random.uniform(rngs.params(),
                               (num_levels, self.table_size,
                                features_per_level),
                               minval=-1e-4, maxval=1e-4))

    @property
    def out_channels(self):
        return self.num_levels * self.features_per_level

    def _hash(self, coords):
        """[..., 3] int32 -> [...] table index (spatial hash, reference
        grid_encoder fast_hash)."""
        c = coords.astype(jnp.uint32)
        h = (c[..., 0] * _PRIMES[0]) ^ (c[..., 1] * _PRIMES[1]) ^ \
            (c[..., 2] * _PRIMES[2])
        return (h % jnp.uint32(self.table_size)).astype(jnp.int32)

    def __call__(self, x):
        """x [..., 3] in [0, 1] -> [..., L*F]."""
        table = self.table[...]
        outs = []
        for l, res in enumerate(self.resolutions):
            xs = x * (res - 1)
            x0 = jnp.floor(xs)
            frac = xs - x0
            x0 = x0.astype(jnp.int32)
            feat = 0.
            for corner in range(8):
                off = jnp.asarray(
                    [(corner >> 0) & 1, (corner >> 1) & 1,
                     (corner >> 2) & 1], jnp.int32)
                idx = self._hash(jnp.clip(x0 + off, 0, res - 1))
                w = jnp.prod(
                    jnp.where(off.astype(bool), frac, 1. - frac), axis=-1)
                feat = feat + w[..., None] * table[l][idx]
            outs.append(feat)
        return jnp.concatenate(outs, axis=-1)


class SHEncoder(nnx.Module):
    """Degree-4 real spherical harmonics of a unit direction
    (reference: cpp_extensions/sh_encoder)."""

    degree: int = 4

    def __init__(self, degree: int = 4):
        assert 1 <= degree <= 4
        self.degree = degree

    @property
    def out_channels(self):
        return self.degree ** 2

    def __call__(self, d):
        x, y, z = d[..., 0], d[..., 1], d[..., 2]
        comps = [0.28209479177387814 * jnp.ones_like(x)]
        if self.degree > 1:
            comps += [-0.48860251190291987 * y,
                      0.48860251190291987 * z,
                      -0.48860251190291987 * x]
        if self.degree > 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            comps += [1.0925484305920792 * xy,
                      -1.0925484305920792 * yz,
                      0.94617469575755997 * zz - 0.31539156525251999,
                      -1.0925484305920792 * xz,
                      0.54627421529603959 * (xx - yy)]
        if self.degree > 3:
            comps += [
                0.59004358992664352 * y * (-3.0 * xx + yy),
                2.8906114426405538 * xy * z,
                0.45704579946446572 * y * (1.0 - 5.0 * zz),
                0.3731763325901154 * z * (5.0 * zz - 3.0),
                0.45704579946446572 * x * (1.0 - 5.0 * zz),
                1.4453057213202769 * z * (xx - yy),
                0.59004358992664352 * x * (-xx + 3.0 * yy),
            ]
        return jnp.stack(comps, axis=-1)


class IntegratedPositionalEncoding(nnx.Module):
    """mip-NeRF integrated positional encoding
    (reference: contrib/PaddleRendering pprndr mip_nerf encoding): the
    expected frequency encoding of a Gaussian-approximated conical frustum,
    E[sin(2^j x)] = sin(2^j mu) * exp(-0.5 * 4^j * var)."""

    def __init__(self, num_freqs: int = 16, min_freq: int = 0):
        self.num_freqs = num_freqs
        self.min_freq = min_freq

    @property
    def out_mult(self):
        return 2 * (self.num_freqs - self.min_freq)

    def __call__(self, mean, var):
        """mean/var [..., 3] -> [..., 3 * out_mult]."""
        scales = 2.0 ** jnp.arange(self.min_freq, self.num_freqs)
        m = mean[..., None, :] * scales[:, None]          # [..., F, 3]
        v = var[..., None, :] * (scales[:, None] ** 2)
        damp = jnp.exp(-0.5 * v)
        enc = jnp.concatenate([jnp.sin(m) * damp, jnp.cos(m) * damp],
                              axis=-2)
        return enc.reshape(mean.shape[:-1] + (-1,))
