"""Jitted step functions (reference: paddle3d/apis/pipeline.py:26,47,119).

`training_step`/`validation_step` become builders returning nnx.jit-compiled
pure steps. Differences from the reference by design:
  * gradient sync is implicit (replicated params + data-sharded batch under
    SPMD jit — XLA inserts the all-reduces), so there is no no_sync /
    fused_allreduce path;
  * AMP: parameters stay fp32, compute can run bf16 — no GradScaler needed
    on TPU (bf16 has fp32-range exponent);
  * EMA update is fused into the jitted step (reference keeps a separate
    ModelEMA object, utils/ema.py:45).
"""
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import nnx

__all__ = ["parse_losses", "make_train_step", "make_eval_step", "EMAState"]


def parse_losses(losses) -> jnp.ndarray:
    """dict|array -> total scalar (reference: pipeline.py:26)."""
    if isinstance(losses, dict):
        if "loss" in losses:
            return losses["loss"]
        return sum(v for v in losses.values())
    return losses


class EMAState(nnx.Variable):
    """Shadow parameters tracked alongside the optimizer."""


def init_ema(model) -> nnx.State:
    params = nnx.state(model, nnx.Param)
    return jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                        params)


def make_train_step(grad_clip_norm: Optional[float] = None,
                    ema_decay: Optional[float] = None,
                    amp_level: Optional[str] = None) -> Callable:
    """Build the jitted train step.

    Signature of the returned step:
        step(model, optimizer, ema_params_or_None, batch) -> loss_dict
    The model/optimizer are nnx objects mutated in place (nnx.jit semantics);
    ema_params is an nnx.State pytree updated functionally and returned.

    amp_level 'O2' = bf16 compute with fp32 master params (reference
    amp_cfg; no GradScaler needed — bf16 keeps the fp32 exponent range).
    Under O2 the forward runs on a functional bf16 copy; its BatchStat
    updates are merged back into the live model after the step so BN
    running averages keep training.
    """
    use_amp = amp_level in ("O1", "O2")

    @nnx.jit
    def train_step(model, optimizer, batch):
        def loss_fn(m):
            if use_amp:
                gd, params, rest = nnx.split(m, nnx.Param, ...)
                bf16 = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x, params)
                m = nnx.merge(gd, bf16, rest)
                batch_ = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x, batch)
            else:
                batch_ = batch
            losses = m.train_forward(batch_)
            losses = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") else x, losses)
            new_stats = (nnx.state(m, nnx.BatchStat)
                         if use_amp else None)
            return parse_losses(losses), (losses, new_stats)

        (loss, (losses, new_stats)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        if new_stats is not None:
            # BN running stats updated on the bf16 copy -> live model
            # (restore fp32 storage)
            new_stats = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
                new_stats)
            nnx.update(model, new_stats)
        if grad_clip_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        optimizer.update(model, grads)
        return losses

    if ema_decay is None:
        return train_step

    @nnx.jit
    def train_step_ema(model, optimizer, ema_params, batch, decay=None):
        losses = train_step(model, optimizer, batch)
        params = nnx.state(model, nnx.Param)
        # decay may be a traced per-iteration scalar (reference ModelEMA
        # threshold/exponential schedules, utils/ema.py:118-121)
        d = ema_decay if decay is None else decay
        new_ema = jax.tree.map(
            lambda e, p: d * e + (1.0 - d) * p, ema_params, params)
        return losses, new_ema

    return train_step_ema


def make_eval_step() -> Callable:
    """step(model, batch) -> fixed-shape predictions
    (reference: pipeline.py:119 validation_step)."""

    @nnx.jit
    def eval_step(model, batch):
        return model.test_forward(batch)

    return eval_step
