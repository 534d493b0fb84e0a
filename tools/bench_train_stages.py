"""Train-step stage timing on the chip (VERDICT r1 item 2: trace-backed
train breakdown). Times, as separately jitted programs:

  fwd        — train_forward loss only
  fwd+bwd    — value_and_grad (no optimizer)
  full step  — value_and_grad + grad clip + AdamW (pipeline.make_train_step)

Differences give the backward and optimizer shares. Also reports achieved
FLOP/s for the full step from XLA's cost analysis.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "."))

from bench import MODELS, make_gt, make_scans  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pointpillars", choices=sorted(MODELS))
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from paddle3d_tpu.apis import Config
    from paddle3d_tpu.apis.pipeline import make_train_step

    config_path, npts, (lo, hi), _ = MODELS[args.model]
    cfg = Config(path=config_path)
    model = cfg.model
    model.train()
    optimizer = nnx.Optimizer(model, optax.adamw(1e-4), wrt=nnx.Param)

    rng = np.random.default_rng(0)
    pts = jax.device_put(
        make_scans(rng, args.batch, npts, lo, hi, "clustered"))
    boxes, labels = make_gt(rng, args.batch, args.model)
    batch = {"data": pts, "gt_boxes": jax.device_put(boxes),
             "gt_labels": jax.device_put(labels)}

    graphdef, state = nnx.split(model)

    def loss_only(state, batch):
        m = nnx.merge(graphdef, state)
        out = m.train_forward(batch)
        return out["loss"]

    def fwd_bwd(state, batch):
        return jax.value_and_grad(lambda s: loss_only(s, batch))(state)

    step = make_train_step(grad_clip_norm=10.0, amp_level="O2")

    def fetch(o):
        leaf = jax.tree.leaves(o)[0]
        return np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))

    def timeit(fn, *fargs):
        out = fn(*fargs)
        fetch(out)
        for _ in range(3):
            fetch(fn(*fargs))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(*fargs)
        fetch(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    t_fwd = timeit(jax.jit(loss_only), state, batch)
    t_fb = timeit(jax.jit(fwd_bwd), state, batch)
    t_full = timeit(lambda b: step(model, optimizer, b), batch)

    flops = None
    try:
        gd, st = nnx.split((model, optimizer))

        def pure(st, b):
            mo = nnx.merge(gd, st)
            return step(mo[0], mo[1], b)
        ca = jax.jit(pure).lower(st, batch).compile().cost_analysis()
        if ca:
            flops = float((ca[0] if isinstance(ca, (list, tuple))
                           else ca).get("flops", 0.0)) or None
    except Exception:
        pass

    print("== {} train step, batch {} ==".format(args.model, args.batch))
    print("  fwd (loss only)        {:8.2f} ms".format(t_fwd))
    print("  fwd+bwd (grad)         {:8.2f} ms  (bwd ~{:.2f})".format(
        t_fb, t_fb - t_fwd))
    print("  full step (+clip+adam) {:8.2f} ms  (opt ~{:.2f})".format(
        t_full, t_full - t_fb))
    if flops:
        print("  XLA-counted {:.1f} GFLOP -> {:.1f} TFLOP/s achieved "
              "({:.1f}% of 197 bf16 peak)".format(
                  flops / 1e9, flops / t_full / 1e9,
                  100 * flops / t_full / 1e9 / 197))
    print("  {:.1f} scans/s".format(args.batch * 1e3 / t_full))


if __name__ == "__main__":
    main()
