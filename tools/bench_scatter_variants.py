"""Micro-bench the sorted-scatter kernel variants at the CenterPoint shape
(8 x 250k sorted rows -> 512^2 cells x 64 bf16). Diagnostic only."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, C = 8, 250000, 64
NUM_CELLS = 512 * 512


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from paddle3d_tpu.ops.pallas.sorted_scatter import (
        _sorted_segment_sum_bs, _sorted_segment_sum_pallas)

    rng = np.random.default_rng(0)
    # clustered-ish keys: mixture of dense-near + uniform tail, sorted
    keys = np.sort(
        np.concatenate([
            rng.integers(NUM_CELLS // 4, NUM_CELLS // 2,
                         size=(B, int(N * 0.6))),
            rng.integers(0, NUM_CELLS, size=(B, N - int(N * 0.6))),
        ], axis=1), axis=1).astype(np.int32)
    rows = rng.standard_normal((B, N, C)).astype(np.float32)
    keys = jax.device_put(keys)
    rows = jax.device_put(rows).astype(jnp.bfloat16)

    def timeit(name, fn, iters=30):
        try:
            out = fn(keys, rows)
            out = out[0] if isinstance(out, tuple) else out
            np.asarray(out[0, :8, :4])  # fetch-sync
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(keys, rows)
                out = out[0] if isinstance(out, tuple) else out
            np.asarray(out[0, :8, :4])
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"  {name:28s} {dt:7.2f} ms")
            return out
        except Exception as e:  # noqa: BLE001
            print(f"  {name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            return None

    ref = None
    for cpb in (1024, 512, 256, 128):
        for wmult in (None,):
            out = timeit(f"v2 bs cpb={cpb}",
                         lambda k, r, cpb=cpb: _sorted_segment_sum_bs(
                             k, r, NUM_CELLS, cpb=cpb))
            if out is not None and ref is None:
                ref = np.asarray(out.astype(jnp.float32))
            elif out is not None:
                got = np.asarray(out.astype(jnp.float32))
                md = np.abs(got - ref).max()
                if md > 1e-2:
                    print(f"    ^ MISMATCH maxdiff={md}")
    timeit("v1 slots", lambda k, r: _sorted_segment_sum_pallas(
        k, r, NUM_CELLS))


if __name__ == "__main__":
    main()

def main_cm():
    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from paddle3d_tpu.ops.pallas.sorted_scatter import (
        _sorted_segment_sum_cm, _sorted_segment_sum_bs, _cm_geometry)

    rng = np.random.default_rng(0)
    keys = np.sort(
        np.concatenate([
            rng.integers(NUM_CELLS // 4, NUM_CELLS // 2,
                         size=(B, int(N * 0.6))),
            rng.integers(0, NUM_CELLS, size=(B, N - int(N * 0.6))),
        ], axis=1), axis=1).astype(np.int32)
    rows = rng.standard_normal((B, N, C)).astype(np.float32)
    rows_cm = np.ascontiguousarray(np.swapaxes(rows, 1, 2))
    keys = jax.device_put(keys)
    rows = jax.device_put(rows).astype(jnp.bfloat16)
    rows_cm = jax.device_put(rows_cm).astype(jnp.bfloat16)

    def timeit(name, fn, iters=30):
        try:
            out = fn()
            out = out[0] if isinstance(out, tuple) else out
            np.asarray(out[0, :8, :4])
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
                out = out[0] if isinstance(out, tuple) else out
            np.asarray(out[0, :8, :4])
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"  {name:34s} {dt:7.2f} ms")
            return out
        except Exception as e:  # noqa: BLE001
            print(f"  {name:34s} FAILED: {type(e).__name__}: {str(e)[:160]}")
            return None

    ref = None
    out = timeit("v2 bs cpb=512 (baseline)",
                 lambda: _sorted_segment_sum_bs(keys, rows, NUM_CELLS,
                                                cpb=512))
    if out is not None:
        ref = np.asarray(out.astype(jnp.float32))
    import itertools
    sweep = [(512, 2), (512, 3), (1024, 2)]
    for cpb, nv in sweep:
        if True:
            W, scap, npad = _cm_geometry(N, NUM_CELLS, cpb, None, nv)
            # pre-padded rows (producer-side padding is free in production)
            rp = jnp.pad(rows_cm, ((0, 0), (0, 0), (0, npad - N)))
            rp = jax.device_put(rp)
            out = timeit(
                f"v3 cm cpb={cpb} nv={nv} W={W}",
                lambda rp=rp, cpb=cpb, nv=nv: _sorted_segment_sum_cm(
                    keys, rp, C, NUM_CELLS, cpb=cpb, nviews=nv))
            if out is not None and ref is not None:
                got = np.asarray(out.astype(jnp.float32))
                md = np.abs(got - ref).max()
                if md > 1e-2:
                    print(f"    ^ MISMATCH maxdiff={md}")


if __name__ == "__main__":
    import sys as _s
    main_cm() if "--cm" in _s.argv else main()
