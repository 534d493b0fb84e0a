"""On-chip micro-bench: packed vs unpacked sorted-window sparse conv at the
SparseResNet3D stage shapes of centerpoint_voxels (grid 1440x1440x41,
capacities 160k/80k/40k/20k, channels 16/32/64/128). Diagnostic only."""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, vq, vin, cin, cout, stride_note)
STAGES = [
    ("stem  subm 16->16  V160k", 160000, 160000, 16, 16),
    ("down2 s2   16->32  V80k ", 80000, 160000, 16, 32),
    ("blk2  subm 32->32  V80k ", 80000, 80000, 32, 32),
    ("down3 s2   32->64  V40k ", 40000, 80000, 32, 64),
    ("blk3  subm 64->64  V40k ", 40000, 40000, 64, 64),
    ("down4 s2   64->128 V20k ", 20000, 40000, 64, 128),
    ("blk4  subm 128->128 V20k", 20000, 20000, 128, 128),
]
D, H, W = 41, 1440, 1440
B = 4


def make_keys(rng, b, v, grid_hw, stride=1):
    """Clustered surface-like sorted unique keys."""
    d, h, w = 41 // stride or 1, grid_hw // stride, grid_hw // stride
    total = d * h * w
    keys = np.empty((b, v), np.int64)
    for i in range(b):
        # surface band: most voxels near one z-slab, xy clustered
        n_cl = int(v * 1.5)
        z = np.clip(rng.normal(d * 0.3, d * 0.15, n_cl), 0, d - 1).astype(int)
        y = np.clip((rng.normal(0.5, 0.22, n_cl) * h), 0, h - 1).astype(int)
        x = np.clip((rng.normal(0.5, 0.22, n_cl) * w), 0, w - 1).astype(int)
        k = np.unique(z * (h * w) + y * w + x)
        if len(k) < v:
            extra = rng.choice(total, size=v - len(k) + 64, replace=False)
            k = np.unique(np.concatenate([k, extra]))
        keys[i] = np.sort(k[:v])
    return keys.astype(np.int32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from paddle3d_tpu.ops.pallas.sparse_conv import sparse_conv3d_win

    rng = np.random.default_rng(0)
    for name, vq, vin, cin, cout in STAGES:
        stride = int(round((vin / 160000) ** -0.0)) or 1  # grid per stage
        # grid shrinks with stage; approximate strides by capacity ratio
        sratio = int(round((160000 / vin) ** 0.5))
        h = max(H // max(sratio, 1), 8)
        in_keys = make_keys(rng, B, vin, h)
        if vq == vin:
            qbase = in_keys
        else:
            qs = np.sort(rng.choice(vin, size=vq, replace=False))
            qbase = np.stack([np.sort(in_keys[i][qs]) for i in range(B)])
        feats = rng.standard_normal((B, vin, cin)).astype(np.float32)
        wts = rng.standard_normal((27 * cin, cout)).astype(np.float32) * 0.05

        qb = jax.device_put(jnp.asarray(qbase))
        ik = jax.device_put(jnp.asarray(in_keys))
        ft = jax.device_put(jnp.asarray(feats).astype(jnp.bfloat16))
        wt = jax.device_put(jnp.asarray(wts))

        for impl in (("unpacked", "packed") if cin <= 64 else ("unpacked",)):
            try:
                f = lambda: sparse_conv3d_win(qb, ik, ft, wt, D, h, h,
                                              kernel_size=3, impl=impl)
                out = f()
                np.asarray(out[0, :1, :1])
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = f()
                np.asarray(out[0, :1, :1])
                dt = (time.perf_counter() - t0) / args.iters * 1e3
                print(f"{name}  {impl:9s} {dt:8.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name}  {impl:9s} FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
