"""Decompose the dense sorted-scatter cost: prologue (pad + block starts)
vs the pallas_call itself, at the CenterPoint shape. Diagnostic only."""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, C = 8, 250000, 64
NUM_CELLS = 512 * 512
CPB = 512


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from paddle3d_tpu.ops.pallas import sorted_scatter as ss

    rng = np.random.default_rng(0)
    keys = np.sort(
        np.concatenate([
            rng.integers(NUM_CELLS // 4, NUM_CELLS // 2,
                         size=(B, int(N * 0.6))),
            rng.integers(0, NUM_CELLS, size=(B, N - int(N * 0.6))),
        ], axis=1), axis=1).astype(np.int32)
    rows = rng.standard_normal((B, N, C)).astype(np.float32)
    keys = jax.device_put(keys)
    rows = jax.device_put(rows).astype(jnp.bfloat16)

    nblocks = NUM_CELLS // CPB
    mean_rows = -(-N // nblocks)
    W = max(128, -(-(mean_rows + mean_rows // 4) // 256) * 128)
    scap = max(128, min(W, 512))
    c_pad = 128
    npad = (-(-N // W) + 2) * W + scap
    npad = -(-npad // W) * W

    @jax.jit
    def prologue(keys, rows):
        keys_p = jnp.pad(keys, ((0, 0), (0, npad - N)),
                         constant_values=np.int32(2**31 - 1))[:, None, :]
        rows_p = jnp.pad(rows, ((0, 0), (0, npad - N), (0, c_pad - C)))
        starts = ss._block_starts(keys, nblocks, CPB)
        return keys_p, rows_p, starts

    def timeit(name, fn, *args, iters=30):
        out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a.ravel()[:4]), out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a.ravel()[:4]), out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"  {name:32s} {dt:7.2f} ms")
        return out

    kp, rp, st = timeit("prologue (pad+starts)", prologue, keys, rows)

    # kernel-only: feed pre-padded arrays, pass cpb so no re-derivation
    @functools.partial(jax.jit, static_argnames=())
    def kernel_only(starts, keys_p, rows_p):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        kspec, rspec = [], []
        for bi in range(B):
            for off in (0, 1):
                kspec.append(pl.BlockSpec(
                    (1, 1, W),
                    lambda blk, stx, bi=bi, off=off:
                        (bi, 0, stx[bi, blk] // W + off)))
                rspec.append(pl.BlockSpec(
                    (1, W, c_pad),
                    lambda blk, stx, bi=bi, off=off:
                        (bi, stx[bi, blk] // W + off, 0)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=(kspec + rspec +
                      [pl.BlockSpec(memory_space=pltpu.HBM),
                       pl.BlockSpec(memory_space=pltpu.HBM)]),
            out_specs=pl.BlockSpec((B, 1, CPB, C),
                                   lambda blk, stx: (0, blk, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, scap), jnp.int32),
                pltpu.VMEM((scap, c_pad), rows_p.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )
        out_shape = jax.ShapeDtypeStruct((B, nblocks, CPB, C), rows_p.dtype)
        views = [keys_p, keys_p] * B + [rows_p, rows_p] * B
        return pl.pallas_call(
            functools.partial(ss._kernel_bs, B, CPB, W, C, scap, False),
            out_shape=out_shape, grid_spec=grid_spec,
        )(starts, *views, keys_p, rows_p)

    timeit("kernel only (v2 body)", kernel_only, st, kp, rp)
    timeit("full v2", lambda k, r: ss._sorted_segment_sum_bs(
        k, r, NUM_CELLS, cpb=CPB), keys, rows)


if __name__ == "__main__":
    main()
