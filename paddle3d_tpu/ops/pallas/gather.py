"""Pallas row-gather kernel.

XLA on this TPU lowers batched random-access row gathers to an
O(source x count) select cascade (~330 ms for 8x1000x7-from-107k). This
kernel streams exactly the requested rows with double-buffered single-row
DMAs driven by an SMEM index vector — O(count) DMAs.

Columns are padded to the 128-lane tile before the call; the pad is a cheap
dense copy and the kernel slices it back off.

Falls back to take_along_axis on non-TPU backends.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_rows"]

_LANES = 128


def _gather_kernel(idx_ref, src_ref, out_ref):
    k = out_ref.shape[0]
    ring = 16

    def body(sems):
        def get_dma(i):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[i], 1), :],
                out_ref.at[pl.ds(i, 1), :],
                sems.at[i % ring],
            )

        # warm up the ring
        def warm(i, _):
            @pl.when(i < k)
            def _():
                get_dma(i).start()
            return 0

        jax.lax.fori_loop(0, ring, warm, 0)

        def loop(i, _):
            get_dma(i).wait()

            @pl.when(i + ring < k)
            def _():
                get_dma(i + ring).start()
            return 0

        jax.lax.fori_loop(0, k, loop, 0)

    pl.run_scoped(body, sems=pltpu.SemaphoreType.DMA((ring,)))


@functools.partial(jax.jit, static_argnames=())
def _pallas_gather(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    b, a, c = src.shape
    k = idx.shape[1]
    kpad = (-k) % 8
    src128 = jnp.pad(src, ((0, 0), (0, 0), (0, _LANES - c)))
    idx_p = jnp.pad(idx, ((0, 0), (0, kpad)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    )

    def kernel(idx_all, src_ref, out_ref):
        bi = pl.program_id(0)
        _gather_kernel(idx_all.at[bi], src_ref.at[bi], out_ref.at[bi])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, k + kpad, _LANES), src.dtype),
        grid_spec=grid_spec,
    )(idx_p.astype(jnp.int32), src128)
    return out[:, :k, :c]


def gather_rows(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """src [B, A, C] x idx [B, K] -> [B, K, C]."""
    if jax.default_backend() in ("cpu",):
        return jnp.take_along_axis(src, idx[..., None], axis=1)
    return _pallas_gather(src, idx)
