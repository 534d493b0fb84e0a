"""TRAIN-mode fused pillar feature net (single-layer PFNs) — the round-2..5
open item: the eval kernel (fused_pfn.py) folds BatchNorm from running
stats, so training previously fell back to the multi-pass XLA segmented
path (~13 ms fwd + a long backward tail on the KITTI flagship).

Train forward = two kernel passes + tiny XLA glue:

  1. STATS pass (_kernel_stats): decorate -> z = W1^T x over kept rows,
     reduced per block to [sum z, sum z^2, count, sum x (x) z, sum x] —
     everything the BN batch statistics AND the weight-gradient formula
     need. Batch mean/var divide by the TOTAL row count M = B*N (masked
     rows contribute zeros), matching the XLA train path's flax BN over
     zero-padded rows (see pillar_ops.py docstring).
  2. the EVAL kernel (fused_pfn_rows) with the batch-stat-folded affine
     (w_eff = w1 * gamma/sigma, b_eff = beta - mu*gamma/sigma).

Backward is ONE kernel pass (_kernel_bwd): recompute decorate/z/y, route
the rows-cotangent from each pillar's emission row to its argmax row
(first-argmax subgradient), gate by relu', and reduce the three global
sums the BN-aware weight/affine gradients need:

  dbeta  = sum dt
  dgamma = sum dt*zhat
  dW1    = a * (T1 - Sx (x) sum_dt / M - T2 * dgamma / M),
           T1 = sum x (x) dt,  T2 = sum x (x) zhat = (T3 - Sx mu^T)/sigma

(the Sdt/M and zhat*Sdtz/M terms are the batch-statistics' own dependence
on z — the full training-mode BatchNorm VJP.) Reference semantics:
paddle3d/models/voxel_encoders/pillar_encoder.py:64-109 trains the exact
module it evals; this path restores that contract on TPU.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_pfn import _SENT, _decorate, fused_pfn_rows

__all__ = ["fused_pfn_train_rows"]

_NEG = -1e9


def _halo(P):
    span = 1
    while span - 1 < P:
        span *= 2
    return max(64, -(-(span - 1) // 64) * 64)


def _kernel_stats(C_in, C_dec, u1, P, maxV, nx, R, H, with_distance,
                  vx, vy, x_off, y_off,
                  kp_ref, kc_ref, kn_ref, pp_ref, pc_ref, pn_ref,
                  w1_ref, out_ref, carry_ref):
    x, keep, emit, k, dists, same_dn, same_up, rdn, rup = _decorate(
        P, maxV, nx, R, H, with_distance, vx, vy, x_off, y_off,
        kp_ref, kc_ref, kn_ref, pp_ref, pc_ref, pn_ref, carry_ref)
    T = R + 2 * H
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    central = (lane >= H) & (lane < H + R)
    cmask = (keep & central).astype(jnp.float32)

    w1 = w1_ref[...]
    z = jax.lax.dot_general(
        w1, x.astype(w1.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [u1, T]
    z = z * cmask                                          # kept+central
    xm = x * cmask                                         # [C_dec, T]

    # row-vector stats via ones-dots: Mosaic cannot lower at[].set
    # (scatter) or cheap [u1,1]->[1,u1] transposes inside a kernel, so
    # every stat is produced directly in [1, u1] lane layout
    ones_t = jnp.ones((1, T), jnp.float32)

    def rowsum(m):                                         # [1, cols(m.0)]
        return jax.lax.dot_general(
            ones_t, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    s1 = rowsum(z)                                         # [1, u1]
    s2 = rowsum(z * z)
    cntv = rowsum(cmask)                                   # [1, 1]
    # f32 HIGHEST: T3 feeds the cancelling dW1 correction terms — bf16
    # operand rounding there showed up as ~25% relative error on small
    # gradient entries in the parity test
    t3 = jax.lax.dot_general(
        xm, z, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)               # [C_dec, u1]
    sx = rowsum(xm)                                        # [1, C_dec]

    out_ref[0, 0] = jnp.concatenate([
        s1, s2, jnp.broadcast_to(cntv, (1, u1)), t3,
        jnp.concatenate(
            [sx, jnp.zeros((1, u1 - C_dec), jnp.float32)], axis=1),
    ], axis=0)


def _kernel_bwd(C_in, C_dec, u1, u1g, P, maxV, nx, R, H, with_distance,
                vx, vy, x_off, y_off,
                kp_ref, kc_ref, kn_ref, pp_ref, pc_ref, pn_ref,
                gp_ref, gc_ref, gn_ref,
                w1_ref, a_ref, c_ref, mu_ref, is_ref, out_ref, carry_ref):
    x, keep, emit, k, dists, same_dn, same_up, rdn, rup = _decorate(
        P, maxV, nx, R, H, with_distance, vx, vy, x_off, y_off,
        kp_ref, kc_ref, kn_ref, pp_ref, pc_ref, pn_ref, carry_ref)
    T = R + 2 * H
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    central = (lane >= H) & (lane < H + R)

    g = jnp.concatenate(
        [gp_ref[0, :u1, R - H:], gc_ref[0, :u1], gn_ref[0, :u1, :H]],
        axis=-1).astype(jnp.float32)                       # [u1, T]

    w1 = w1_ref[...]
    z = jax.lax.dot_general(
        w1, x.astype(w1.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [u1, T]
    t = z * a_ref[...] + c_ref[...]
    y = jnp.maximum(t, 0.)
    ym = jnp.where(keep, y, _NEG)
    m = ym
    for d in dists:
        dn = jnp.where(same_dn[d], rdn(m, d), _NEG)
        up = jnp.where(same_up[d], rup(m, d), _NEG)
        m = jnp.maximum(m, jnp.maximum(dn, up))            # pillar max

    # route g from the emission row back over the pillar (flag-guided
    # select-propagate; every kept row is within the halo of its emit row)
    flag = emit
    val = jnp.where(emit, g, 0.)
    for d in dists:
        upflag = rup(flag, d)
        take = same_up[d] & jnp.logical_not(flag) & upflag
        val = jnp.where(take, rup(val, d), val)
        flag = flag | (same_up[d] & upflag)

    # first-argmax subgradient: inclusive same-key count of argmax rows
    ind = keep & (ym == m)
    cnt = ind.astype(jnp.int32)
    for d in dists:
        cnt = cnt + jnp.where(same_dn[d], rdn(cnt, d), 0)
    first = ind & (cnt == 1)
    dt = jnp.where(first & (t > 0.) & central, val, 0.)     # [u1, T]

    zhat = (z - mu_ref[...]) * is_ref[...]
    ones_t = jnp.ones((1, T), jnp.float32)

    def rowsum(m):                                          # see _kernel_stats
        return jax.lax.dot_general(
            ones_t, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    sdt = rowsum(dt)                                        # [1, u1]
    sdtz = rowsum(dt * zhat)
    t1 = jax.lax.dot_general(
        x, dt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                # [C_dec, u1]

    out_ref[0, 0] = jnp.concatenate([sdt, sdtz, t1], axis=0)


def _common_geometry(b, c_in, n, P, block_rows):
    R = block_rows
    H = _halo(P)
    nb = -(-n // R)
    npad = nb * R
    return R, H, nb, npad


def _pad_inputs(keys, pts_t, R, npad, n, b):
    keys_p = jnp.concatenate([
        jnp.full((b, 1, R), -1, jnp.int32),
        keys[:, None, :],
        jnp.full((b, 1, npad - n + R), np.int32(_SENT)),
    ], axis=-1)
    pts_p = jnp.pad(pts_t, ((0, 0), (0, 0), (R, npad - n + R)))
    return keys_p, pts_p


@functools.partial(
    jax.jit,
    static_argnames=("P", "maxV", "nx", "vx", "vy", "x_off", "y_off",
                     "with_distance", "interpret", "block_rows"))
def _pfn_stats(keys, pts_t, w1t, *, P, maxV, nx, vx, vy, x_off, y_off,
               with_distance=False, interpret=False, block_rows=8192):
    b, c_in, n = pts_t.shape
    u1, c_dec = w1t.shape
    R, H, nb, npad = _common_geometry(b, c_in, n, P, block_rows)
    keys_p, pts_p = _pad_inputs(keys, pts_t, R, npad, n, b)
    ro = 3 + c_dec + 1

    kspec = lambda off: pl.BlockSpec(
        (1, 1, R), lambda bi, blk: (bi, 0, blk + off))
    pspec = lambda off: pl.BlockSpec(
        (1, c_in, R), lambda bi, blk: (bi, 0, blk + off))

    out = pl.pallas_call(
        functools.partial(
            _kernel_stats, c_in, c_dec, u1, P, maxV, nx, R, H,
            with_distance, float(vx), float(vy), float(x_off),
            float(y_off)),
        grid=(b, nb),
        in_specs=[
            kspec(0), kspec(1), kspec(2),
            pspec(0), pspec(1), pspec(2),
            pl.BlockSpec(w1t.shape, lambda bi, blk: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ro, u1),
                               lambda bi, blk: (bi, blk, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nb, ro, u1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(keys_p, keys_p, keys_p, pts_p, pts_p, pts_p, w1t)
    red = out.sum(axis=(0, 1))                     # [ro, u1]
    s1, s2 = red[0], red[1]
    t3 = red[3:3 + c_dec]
    sx = red[3 + c_dec, :c_dec]
    return s1, s2, t3, sx


@functools.partial(
    jax.jit,
    static_argnames=("P", "maxV", "nx", "vx", "vy", "x_off", "y_off",
                     "with_distance", "interpret", "block_rows"))
def _pfn_bwd(keys, pts_t, g_cm, w1t, a, c, mu, invsig, *, P, maxV, nx,
             vx, vy, x_off, y_off, with_distance=False, interpret=False,
             block_rows=8192):
    b, c_in, n = pts_t.shape
    u1, c_dec = w1t.shape
    u1g = g_cm.shape[1]
    R, H, nb, npad = _common_geometry(b, c_in, n, P, block_rows)
    keys_p, pts_p = _pad_inputs(keys, pts_t, R, npad, n, b)
    g_p = jnp.pad(g_cm[:, :, :n].astype(jnp.float32),
                  ((0, 0), (0, 0), (R, npad - n + R)))
    ro = 2 + c_dec

    kspec = lambda off: pl.BlockSpec(
        (1, 1, R), lambda bi, blk: (bi, 0, blk + off))
    pspec = lambda off: pl.BlockSpec(
        (1, c_in, R), lambda bi, blk: (bi, 0, blk + off))
    gspec = lambda off: pl.BlockSpec(
        (1, u1g, R), lambda bi, blk: (bi, 0, blk + off))
    vspec = lambda: pl.BlockSpec((u1, 1), lambda bi, blk: (0, 0))

    out = pl.pallas_call(
        functools.partial(
            _kernel_bwd, c_in, c_dec, u1, u1g, P, maxV, nx, R, H,
            with_distance, float(vx), float(vy), float(x_off),
            float(y_off)),
        grid=(b, nb),
        in_specs=[
            kspec(0), kspec(1), kspec(2),
            pspec(0), pspec(1), pspec(2),
            gspec(0), gspec(1), gspec(2),
            pl.BlockSpec(w1t.shape, lambda bi, blk: (0, 0)),
            vspec(), vspec(), vspec(), vspec(),
        ],
        out_specs=pl.BlockSpec((1, 1, ro, u1),
                               lambda bi, blk: (bi, blk, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nb, ro, u1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(keys_p, keys_p, keys_p, pts_p, pts_p, pts_p, g_p, g_p, g_p,
      w1t, a, c, mu, invsig)
    red = out.sum(axis=(0, 1))                     # [ro, u1]
    return red[0], red[1], red[2:]                 # Sdt, Sdtz, T1


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
def fused_pfn_train_rows(keys, pts_t, w1t, gamma, beta,
                         P, maxV, nx, vx, vy, x_off, y_off,
                         with_distance, occupancy, interpret):
    """Train-mode fused pillar rows with batch-stat BN (single-layer PFN).

    Returns (rows_t [B, u1(+1 occ), N], mu [u1], var [u1]) — mu/var are
    the BATCH statistics for the caller's running-stat update; their
    cotangents are ignored (flax stops gradients through running stats).
    """
    rows, mu, var, _ = _train_fwd_impl(
        keys, pts_t, w1t, gamma, beta, P, maxV, nx, vx, vy, x_off, y_off,
        with_distance, occupancy, interpret)
    return rows, mu, var


def _train_fwd_impl(keys, pts_t, w1t, gamma, beta, P, maxV, nx, vx, vy,
                    x_off, y_off, with_distance, occupancy, interpret):
    b, c_in, n = pts_t.shape
    eps = 1e-3                                   # LinearBN1DReLU default
    s1, s2, t3, sx = _pfn_stats(
        keys, pts_t, w1t, P=P, maxV=maxV, nx=nx, vx=vx, vy=vy,
        x_off=x_off, y_off=y_off, with_distance=with_distance,
        interpret=interpret)
    M = float(b * n)
    mu = s1 / M
    var = s2 / M - mu * mu
    invsig = jax.lax.rsqrt(var + eps)
    a = (gamma.astype(jnp.float32) * invsig)
    cshift = beta.astype(jnp.float32) - mu * a
    w_eff = (w1t.astype(jnp.float32) * a[:, None]).astype(w1t.dtype)
    rows = fused_pfn_rows(
        keys, pts_t, w_eff, cshift[:, None], None, None,
        n_layers=1, P=P, maxV=maxV, nx=nx, vx=vx, vy=vy, x_off=x_off,
        y_off=y_off, with_distance=with_distance, occupancy=occupancy,
        interpret=interpret)
    return rows, mu, var, (t3, sx, invsig, a)


def _train_vjp_fwd(keys, pts_t, w1t, gamma, beta, P, maxV, nx, vx, vy,
                   x_off, y_off, with_distance, occupancy, interpret):
    rows, mu, var, (t3, sx, invsig, a) = _train_fwd_impl(
        keys, pts_t, w1t, gamma, beta, P, maxV, nx, vx, vy, x_off, y_off,
        with_distance, occupancy, interpret)
    res = (keys, pts_t, w1t, mu, invsig, a,
           beta.astype(jnp.float32) - mu * a, t3, sx,
           jnp.zeros((0,), gamma.dtype), jnp.zeros((0,), beta.dtype))
    return (rows, mu, var), res


def _train_vjp_bwd(P, maxV, nx, vx, vy, x_off, y_off, with_distance,
                   occupancy, interpret, res, cots):
    (keys, pts_t, w1t, mu, invsig, a, cshift, t3, sx,
     gsent, bsent) = res
    gdtype, bdtype = gsent.dtype, bsent.dtype
    d_rows = cots[0]                             # [B, u1(+1), N']
    b, c_in, n = pts_t.shape
    u1 = w1t.shape[0]
    sdt, sdtz, t1 = _pfn_bwd(
        keys, pts_t, d_rows[:, :u1, :], w1t,
        a[:, None], cshift[:, None], mu[:, None], invsig[:, None],
        P=P, maxV=maxV, nx=nx, vx=vx, vy=vy, x_off=x_off, y_off=y_off,
        with_distance=with_distance, interpret=interpret)
    M = float(b * n)
    t2 = (t3 - sx[:, None] * mu[None, :]) * invsig[None, :]
    dw1 = a[None, :] * (t1 - sx[:, None] * (sdt / M)[None, :]
                        - t2 * (sdtz / M)[None, :])   # [C_dec, u1]
    return (np.zeros(keys.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(pts_t), dw1.T.astype(w1t.dtype),
            sdtz.astype(gdtype), sdt.astype(bdtype))


fused_pfn_train_rows.defvjp(_train_vjp_fwd, _train_vjp_bwd)
