"""Pallas TPU farthest-point-sampling kernel.

TPU-native replacement for the reference CUDA FPS
(reference: paddle3d/ops/pointnet2/sampling_gpu.cu:37). FPS is inherently
sequential; the XLA formulation (ops/pointnet2.farthest_point_sample) is a
`lax.fori_loop` whose per-step dispatch overhead dominates at npoint=2048+.
This kernel runs the whole loop inside one Mosaic program with the point
cloud resident in VMEM:

  * xyz is pre-tiled to [B, 3, 8, N/8] so every per-step vector op runs on
    full (8, 128) VPU tiles instead of a single sublane;
  * argmax is computed as max + first-index-of-max (matching jnp.argmax
    tie-breaking), selection indices are written with dynamic stores;
  * validity is encoded by a FAR coordinate sentinel: invalid points carry
    d2 = -1 forever, exactly like the XLA path.

Bit-exact parity with ops/pointnet2.farthest_point_sample (same f32
arithmetic order), asserted by tests/ops/test_fps_pallas.py.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["farthest_point_sample_batched"]

_FAR = 1e7
_BIG = 1e10
_SUB = 8  # sublane tiling of the point axis


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(xyz_ref, idx_ref, *, npoint, ncols):
    px = xyz_ref[0, 0]  # [8, ncols]
    py = xyz_ref[0, 1]
    pz = xyz_ref[0, 2]
    valid = px < _FAR / 2
    glob = (jax.lax.broadcasted_iota(jnp.int32, (_SUB, ncols), 0) * ncols +
            jax.lax.broadcasted_iota(jnp.int32, (_SUB, ncols), 1))
    n = _SUB * ncols

    d2 = jnp.where(valid, _BIG, -1.0)
    start = jnp.min(jnp.where(valid, glob, n))  # first valid index
    idx_ref[0, 0, 0] = start.astype(jnp.int32)

    def body(i, carry):
        d2, last = carry
        # coords of the last pick via masked reduction (dynamic lane
        # loads must be 128-aligned, so a gather is not expressible)
        sel = glob == last
        lx = jnp.sum(jnp.where(sel, px, 0.))
        ly = jnp.sum(jnp.where(sel, py, 0.))
        lz = jnp.sum(jnp.where(sel, pz, 0.))
        dx = px - lx
        dy = py - ly
        dz = pz - lz
        dist = dx * dx + dy * dy + dz * dz
        d2 = jnp.where(valid, jnp.minimum(d2, dist), -1.0)
        m = jnp.max(d2)
        sel = jnp.min(jnp.where(d2 == m, glob, n)).astype(jnp.int32)
        idx_ref[0, 0, i] = sel
        return d2, sel

    jax.lax.fori_loop(1, npoint, body, (d2, start.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def _fps_tpu(xyz, mask, npoint, interpret=False):
    b, n, _ = xyz.shape
    npad = _round_up(max(n, _SUB * 128), _SUB * 128)
    ncols = npad // _SUB
    xyz = xyz.astype(jnp.float32)  # distances always in f32
    pts = jnp.where(mask[..., None], xyz, _FAR)
    pts = jnp.pad(pts, ((0, 0), (0, npad - n), (0, 0)),
                  constant_values=_FAR)
    tiled = jnp.transpose(pts, (0, 2, 1)).reshape(b, 3, _SUB, ncols)

    idx = pl.pallas_call(
        functools.partial(_kernel, npoint=npoint, ncols=ncols),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, _SUB, ncols), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, npoint), jnp.int32),
        interpret=interpret,
    )(tiled)
    return idx[:, 0]


def farthest_point_sample_batched(xyz: jnp.ndarray, mask: jnp.ndarray,
                                  npoint: int, interpret: bool = False,
                                  force_xla: bool = False) -> jnp.ndarray:
    """[B,N,3] + [B,N] validity -> [B, npoint] int32 FPS indices."""
    if force_xla or (jax.default_backend() != "tpu" and not interpret):
        from ..pointnet2 import farthest_point_sample
        return jax.vmap(
            lambda x, m: farthest_point_sample(x, m, npoint))(xyz, mask)
    return _fps_tpu(xyz, mask, npoint, interpret=interpret)
