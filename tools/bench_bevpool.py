"""On-chip micro-bench: bev_pool (lift-splat pooling) variants at the
RTEBev shape (6 cams x D=118 x 16x44 pixels -> 128^2 BEV, C=80).

Variants:
  scatter   — current ops/scatter.bev_pool (XLA at[idx].add)
  sortseg   — argsort ranks -> row gather -> Pallas sorted_segment_sum
  tablegather — sort (rank, pixel, depth) only; rebuild rows from the
               small per-pixel feature table by XLA gather; Pallas
               sorted_segment_sum
Diagnostic only.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cams", type=int, default=6)
    p.add_argument("--depth", type=int, default=118)
    p.add_argument("--hw", type=int, default=16 * 44)
    p.add_argument("--channels", type=int, default=80)
    p.add_argument("--cells", type=int, default=128 * 128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from paddle3d_tpu.ops.scatter import bev_pool
    from paddle3d_tpu.ops.pallas.sorted_scatter import sorted_segment_sum

    n = args.cams * args.depth * args.hw
    c = args.channels
    rng = np.random.default_rng(0)
    # clustered ranks like a real rig (rays sweep lines): random walk
    base = rng.integers(0, args.cells, size=(args.cams, 1, args.hw))
    drift = np.cumsum(rng.integers(-2, 3, size=(args.cams, args.depth,
                                                args.hw)), axis=1)
    ranks = ((base + drift) % args.cells).astype(np.int32).reshape(-1)
    valid = rng.uniform(size=n) < 0.9
    depth_w = rng.uniform(0, 1, size=n).astype(np.float32)
    feat_tab = rng.standard_normal(
        (args.cams * args.hw, c)).astype(np.float32)
    # per-row pixel index (cam, hw)
    pix = (np.arange(args.cams)[:, None, None] * args.hw +
           np.arange(args.hw)[None, None, :] +
           np.zeros((1, args.depth, 1), np.int64)).astype(np.int32)
    pix = pix.reshape(-1)

    j_ranks = jax.device_put(jnp.asarray(ranks))
    j_valid = jax.device_put(jnp.asarray(valid))
    j_depth = jax.device_put(jnp.asarray(depth_w))
    j_tab = jax.device_put(jnp.asarray(feat_tab, jnp.bfloat16))
    j_pix = jax.device_put(jnp.asarray(pix))
    rows = (j_tab[j_pix] * j_depth[:, None].astype(jnp.bfloat16))
    rows = jax.device_put(np.asarray(rows.astype(jnp.float32))
                          .astype(np.float32))
    j_rows = jax.device_put(jnp.asarray(np.asarray(rows), jnp.bfloat16))

    @jax.jit
    def v_scatter(rows_, ranks_, valid_):
        return bev_pool(rows_, ranks_, valid_, args.cells)

    @jax.jit
    def v_sortseg(rows_, ranks_, valid_):
        key = jnp.where(valid_, ranks_, jnp.int32(2**31 - 1))
        order = jnp.argsort(key)
        skey = key[order]
        srows = rows_[order]
        return sorted_segment_sum(skey[None], srows[None], args.cells)[0]

    @jax.jit
    def v_tablegather(tab, pix_, depth_, ranks_, valid_):
        key = jnp.where(valid_, ranks_, jnp.int32(2**31 - 1))
        s = jax.lax.sort([key, pix_, depth_], num_keys=1, is_stable=False)
        skey, spix, sdepth = s
        srows = tab[spix] * sdepth[:, None].astype(tab.dtype)
        return sorted_segment_sum(skey[None], srows[None], args.cells)[0]

    def run(name, f, *a):
        out = f(*a)
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1]
                   .astype(jnp.float32))
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = f(*a)
        np.asarray(jax.tree.leaves(o)[0].reshape(-1)[:1]
                   .astype(jnp.float32))
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:12s} {dt:9.2f} ms", flush=True)
        return o

    o1 = run("scatter", v_scatter, j_rows, j_ranks, j_valid)
    o2 = run("sortseg", v_sortseg, j_rows, j_ranks, j_valid)
    o3 = run("tablegather", v_tablegather, j_tab, j_pix, j_depth,
             j_ranks, j_valid)
    a1 = np.asarray(o1, np.float32)
    for nm, o in (("sortseg", o2), ("tablegather", o3)):
        d = np.abs(np.asarray(o, np.float32) - a1).max()
        print(f"{nm} max|diff| vs scatter: {d:.4f} "
              f"(mag {np.abs(a1).max():.1f})")


if __name__ == "__main__":
    main()
