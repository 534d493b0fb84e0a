"""On-chip micro-bench: v3 cell-major vs v4 row-window sorted scatter at the
CenterPoint dense shape (8 x 250k channel-major rows -> 512^2 cells x 64).
Diagnostic only."""
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
        _sorted_segment_sum_cm, _sorted_segment_sum_rw)

    rng = np.random.default_rng(0)
    keys = np.sort(
        np.concatenate([
            rng.integers(NUM_CELLS // 4, NUM_CELLS // 2,
                         size=(B, int(N * 0.6))),
            rng.integers(0, NUM_CELLS, size=(B, N - int(N * 0.6))),
        ], axis=1), axis=1).astype(np.int32)
    rows_cm = rng.standard_normal((B, C, N)).astype(np.float32)
    keys = jax.device_put(keys)
    rows_cm = jax.device_put(rows_cm).astype(jnp.bfloat16)

    def timeit(name, fn, iters=30):
        try:
            out = fn(keys, rows_cm)
            np.asarray(out[0, :8, :4])
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(keys, rows_cm)
            np.asarray(out[0, :8, :4])
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"  {name:36s} {dt:7.2f} ms")
            return out
        except Exception as e:  # noqa: BLE001
            print(f"  {name:36s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            return None

    ref = timeit("v3 cm (round-3 dense pick)",
                 lambda k, r: _sorted_segment_sum_cm(
                     k, r, C, NUM_CELLS, cpb=512, nviews=3))
    ref_np = np.asarray(ref.astype(jnp.float32)) if ref is not None else None
    for wrows in (512, 1024, 2048):
        for ch in (512, 1024, 2048):
            out = timeit(f"v4 rw W={wrows} CH={ch}",
                         lambda k, r, w=wrows, c2=ch: _sorted_segment_sum_rw(
                             k, r, C, NUM_CELLS, wrows=w, chunk_cells=c2))
            if out is not None and ref_np is not None:
                got = np.asarray(out.astype(jnp.float32))
                md = np.abs(got - ref_np).max()
                flag = "" if md <= 0.25 else "  ^ MISMATCH"
                print(f"    maxdiff={md:.4f}{flag}")


if __name__ == "__main__":
    main()
