"""Sub-stage timing for the PRODUCTION (Pallas) CenterPoint extract path.

Decomposes fused_pillar_canvas's eval path into its three programs —
multi-operand sort, fused PFN kernel, channel-major sorted scatter — each
timed as its own jit. Diagnostic only (bench.py is the driver bench).
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N = 8, 250000
NY = NX = 512
NUM_CELLS = NY * NX
VOXEL = (0.2, 0.2, 8.0)
PC_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
MAXP = 20
MAXV = 60000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    rng = np.random.default_rng(0)
    lo = np.array([-51.2, -51.2, -5, 0, 0], np.float32)
    hi = np.array([51.2, 51.2, 3, 1, 0.45], np.float32)
    pts = jax.device_put(
        rng.uniform(lo, hi, size=(B, N, 5)).astype(np.float32)
        .astype(jnp.bfloat16))

    def timeit(name, fn, *xs):
        y = fn(*xs)
        np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:1].astype(jnp.float32))
        for _ in range(3):
            y = fn(*xs)
        np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:1].astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = fn(*xs)
        np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:1].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"  {name:12s} {dt:8.2f} ms/iter", flush=True)
        return y

    from paddle3d_tpu.ops.pillar_ops import sort_points_by_cell
    from paddle3d_tpu.ops.pallas.fused_pfn import fused_pfn_rows
    from paddle3d_tpu.ops.pallas.sorted_scatter import sorted_segment_sum_cm

    sort_fn = jax.jit(jax.vmap(functools.partial(
        sort_points_by_cell, voxel_size=VOXEL, point_cloud_range=PC_RANGE)))
    keys, pts_t = timeit("sort", sort_fn, pts)

    u1 = 64
    w1t = jax.device_put(rng.normal(0, .1, (u1, 10)).astype(jnp.bfloat16))
    b1 = jax.device_put(np.zeros((u1, 1), np.float32))
    w2t = jax.device_put(rng.normal(0, .1, (u1, 2 * u1)).astype(jnp.bfloat16))
    b2 = jax.device_put(np.zeros((u1, 1), np.float32))

    pfn_fn = jax.jit(functools.partial(
        fused_pfn_rows, n_layers=2, P=MAXP, maxV=MAXV, nx=NX,
        vx=VOXEL[0], vy=VOXEL[1],
        x_off=VOXEL[0] / 2 + PC_RANGE[0], y_off=VOXEL[1] / 2 + PC_RANGE[1],
        padded_out=True))
    rows_t = timeit("fused_pfn", pfn_fn, keys, pts_t, w1t, b1, w2t, b2)

    scat_fn = jax.jit(
        lambda k, r: sorted_segment_sum_cm(k, r, NUM_CELLS))
    timeit("scatter_cm", scat_fn, keys, rows_t)

    # whole extract as one program (fusion effects)
    def whole(points):
        k, pt = jax.vmap(functools.partial(
            sort_points_by_cell, voxel_size=VOXEL,
            point_cloud_range=PC_RANGE))(points)
        r = fused_pfn_rows(
            k, pt, w1t, b1, w2t, b2, n_layers=2, P=MAXP, maxV=MAXV, nx=NX,
            vx=VOXEL[0], vy=VOXEL[1],
            x_off=VOXEL[0] / 2 + PC_RANGE[0],
            y_off=VOXEL[1] / 2 + PC_RANGE[1], padded_out=True)
        return sorted_segment_sum_cm(k, r, NUM_CELLS)

    timeit("whole", jax.jit(whole), pts)


if __name__ == "__main__":
    main()
