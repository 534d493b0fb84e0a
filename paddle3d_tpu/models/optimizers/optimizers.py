"""Optimizer & LR-schedule factories
(reference: paddle3d/models/optimizers/optimizers.py:27,133 and
lr_schedulers.py:34,106,149, momentum_schedulers.py:26).

Registered factories return optax GradientTransformations / schedules so the
YAML surface stays declarative. The reference's OneCycleAdam (per-param-group
LR + momentum cycling with before/after_iter hooks) maps onto a single optax
chain with joint lr/beta1 schedules — no hook machinery needed.
"""
import math

import optax

from ...apis import manager

__all__ = [
    "AdamW", "Adam", "Momentum", "SGD", "OneCycleAdam", "OneCycle",
    "OneCycleWarmupDecayLr", "CosineAnnealingDecayByEpoch", "LinearWarmup",
    "PiecewiseDecay", "CosineDecay",
]


def _as_schedule(learning_rate):
    if callable(learning_rate):
        return learning_rate
    return optax.constant_schedule(float(learning_rate))


@manager.OPTIMIZERS.add_component
def ClipGradByGlobalNorm(clip_norm: float):
    """paddle-parity grad-clip component for the nested
    grad_clip: {type: ClipGradByGlobalNorm, clip_norm: N} YAML form."""
    return optax.clip_by_global_norm(float(clip_norm))


def _clip_tx(grad_clip_norm, grad_clip):
    """Accept grad_clip_norm=float, a pre-built GradientTransformation
    (from the registered ClipGradByGlobalNorm), or a raw dict."""
    if grad_clip_norm is not None:
        return optax.clip_by_global_norm(float(grad_clip_norm))
    if grad_clip is None:
        return None
    if isinstance(grad_clip, dict):
        return optax.clip_by_global_norm(float(grad_clip["clip_norm"]))
    return grad_clip


# ------------------------------------------------------------- lr schedules
@manager.LR_SCHEDULERS.add_component
def OneCycle(learning_rate: float = None, total_step: int = None,
             pct_start: float = 0.4, div_factor: float = 10.0,
             final_div_factor: float = 1e4, lr_max: float = None,
             moms=None):
    """One-cycle: warmup to peak then anneal (reference: lr_schedulers.py
    OneCycle). Accepts both this repo's (learning_rate, ...) form and the
    reference YAML's (total_step, lr_max, moms, div_factor, pct_start)
    form — iassd_kitti.yaml:47 names the peak `lr_max`; `moms` (the cycled
    betas) is carried by OneCycleAdam, accepted here for schema parity."""
    del moms
    peak = float(lr_max if lr_max is not None else learning_rate)
    # optax already defines final_value = (peak/div_factor)/final_div_factor,
    # so the factors pass through unchanged.
    return optax.cosine_onecycle_schedule(
        transition_steps=total_step, peak_value=peak,
        pct_start=pct_start, div_factor=div_factor,
        final_div_factor=final_div_factor)


@manager.LR_SCHEDULERS.add_component
def CosineAnnealingDecay(learning_rate: float, T_max: int,
                         eta_min: float = 0.0, **kwargs):
    """paddle.optimizer.lr.CosineAnnealingDecay: cosine from learning_rate
    to eta_min over T_max steps, clamped thereafter (used by the
    petr/cape/paconv/bev_lanedet reference configs, wrapped in
    LinearWarmup)."""
    base = optax.cosine_decay_schedule(
        learning_rate, max(int(T_max), 1),
        alpha=eta_min / max(learning_rate, 1e-12))

    def schedule(step):
        import jax.numpy as jnp
        return base(jnp.minimum(step, T_max))
    return schedule


@manager.LR_SCHEDULERS.add_component
def ExponentialDecay(learning_rate: float, gamma: float):
    """paddle.optimizer.lr.ExponentialDecay: lr * gamma**step (squeezesegv3
    reference configs, wrapped in LinearWarmup)."""
    return optax.exponential_decay(
        init_value=learning_rate, transition_steps=1, decay_rate=gamma)


@manager.OPTIMIZERS.add_component
class OneCycleDecayWarmupMomentum:
    """Cycled-momentum spec fed as OneCycleAdam's `beta1`
    (reference: momentum_schedulers.py OneCycleDecayWarmupMomentum):
    momentum anneals peak->trough over the LR warmup phase
    (step_ratio_peak), then back to peak."""

    def __init__(self, momentum_peak: float = 0.95,
                 momentum_trough: float = 0.85,
                 step_ratio_peak: float = 0.4):
        self.momentum_peak = float(momentum_peak)
        self.momentum_trough = float(momentum_trough)
        self.step_ratio_peak = float(step_ratio_peak)

    def schedule(self, total_step):
        peak, trough = self.momentum_peak, self.momentum_trough
        ratio = self.step_ratio_peak

        def b1(step):
            import jax.numpy as jnp
            if total_step is None:
                return peak
            split = ratio * total_step
            up = peak - (peak - trough) * jnp.clip(step / split, 0., 1.)
            down = trough + (peak - trough) * jnp.clip(
                (step - split) / jnp.maximum(total_step - split, 1), 0., 1.)
            return jnp.where(step < split, up, down)
        return b1


@manager.LR_SCHEDULERS.add_component
def OneCycleWarmupDecayLr(base_learning_rate: float, lr_ratio_peak: float = 10,
                          lr_ratio_trough: float = 0.0001,
                          step_ratio_peak: float = 0.4,
                          total_step: int = 100000):
    """(reference: lr_schedulers.py:34)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=total_step,
        peak_value=base_learning_rate * lr_ratio_peak,
        pct_start=step_ratio_peak,
        div_factor=lr_ratio_peak,
        final_div_factor=1.0 / lr_ratio_trough)


@manager.LR_SCHEDULERS.add_component
def CosineAnnealingDecayByEpoch(learning_rate: float, T_max: int,
                                iters_per_epoch: int = 1,
                                eta_min: float = 0.0):
    """(reference: lr_schedulers.py:149) — epoch-stepped cosine."""
    def schedule(step):
        epoch = step // iters_per_epoch
        import jax.numpy as jnp
        cos = (1 + jnp.cos(jnp.pi * jnp.minimum(epoch, T_max) / T_max)) / 2
        return eta_min + (learning_rate - eta_min) * cos

    return schedule


@manager.LR_SCHEDULERS.add_component
def LinearWarmup(learning_rate, warmup_steps: int = 1000,
                 start_lr: float = 0., end_lr: float = None):
    base = _as_schedule(learning_rate if end_lr is None else end_lr)
    peak = base(0) if end_lr is None else end_lr

    def schedule(step):
        import jax.numpy as jnp
        frac = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        warm = start_lr + (peak - start_lr) * frac
        return jnp.where(step < warmup_steps, warm, base(step))

    return schedule


@manager.LR_SCHEDULERS.add_component
def PiecewiseDecay(boundaries, values):
    return optax.piecewise_constant_schedule(
        init_value=values[0],
        boundaries_and_scales={
            int(b): values[i + 1] / values[i]
            for i, b in enumerate(boundaries)
        })


@manager.LR_SCHEDULERS.add_component
def MultiStepDecay(learning_rate: float, milestones, gamma: float = 0.1):
    """paddle.optimizer.lr.MultiStepDecay (used by the reference's
    configs/quant/smoke_kitti.yml finetune schedule)."""
    return optax.piecewise_constant_schedule(
        init_value=learning_rate,
        boundaries_and_scales={int(m): gamma for m in milestones})


@manager.LR_SCHEDULERS.add_component
def CosineDecay(learning_rate: float, total_step: int, eta_min: float = 0.0):
    return optax.cosine_decay_schedule(
        learning_rate, total_step, alpha=eta_min / max(learning_rate, 1e-12))


# ---------------------------------------------------------------- optimizers
@manager.OPTIMIZERS.add_component
def AdamW(learning_rate=1e-3, weight_decay: float = 0.01, beta1: float = 0.9,
          beta2: float = 0.999, epsilon: float = 1e-8,
          grad_clip_norm: float = None, grad_clip: dict = None):
    tx = optax.adamw(_as_schedule(learning_rate), b1=beta1, b2=beta2,
                     eps=epsilon, weight_decay=weight_decay)
    clip = _clip_tx(grad_clip_norm, grad_clip)
    if clip is not None:
        tx = optax.chain(clip, tx)
    return tx


@manager.OPTIMIZERS.add_component
def Adam(learning_rate=1e-3, beta1: float = 0.9, beta2: float = 0.999,
         epsilon: float = 1e-8, weight_decay: float = 0.0,
         grad_clip_norm: float = None, grad_clip: dict = None):
    if weight_decay:
        # paddle Adam with weight_decay is decoupled-decay adamw
        tx = optax.adamw(_as_schedule(learning_rate), b1=beta1, b2=beta2,
                         eps=epsilon, weight_decay=weight_decay)
    else:
        tx = optax.adam(_as_schedule(learning_rate), b1=beta1, b2=beta2,
                        eps=epsilon)
    clip = _clip_tx(grad_clip_norm, grad_clip)
    if clip is not None:
        tx = optax.chain(clip, tx)
    return tx


@manager.LR_SCHEDULERS.add_component
def StepDecay(learning_rate: float, step_size: int, gamma: float = 0.1):
    """LR *= gamma every step_size iterations (paddle StepDecay parity)."""
    def schedule(step):
        import jax.numpy as jnp
        return learning_rate * jnp.power(gamma, step // step_size)

    return schedule


@manager.OPTIMIZERS.add_component
def Momentum(learning_rate=1e-3, momentum: float = 0.9,
             weight_decay: float = 0.0, grad_clip_norm: float = None):
    txs = []
    if grad_clip_norm is not None:
        txs.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.sgd(_as_schedule(learning_rate), momentum=momentum))
    return optax.chain(*txs)


@manager.OPTIMIZERS.add_component
def SGD(learning_rate=1e-3, grad_clip_norm: float = None):
    tx = optax.sgd(_as_schedule(learning_rate))
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx


@manager.OPTIMIZERS.add_component
def OneCycleAdam(learning_rate, total_step: int = None, beta1_peak: float = 0.95,
                 beta1_trough: float = 0.85, beta2: float = 0.99,
                 weight_decay: float = 0.01, grad_clip_norm: float = 10.0,
                 beta1=None, grad_clip=None, **kwargs):
    """One-cycle Adam with cycled beta1 (reference: optimizers.py:27
    OneCycleAdam + OneCycleDecayWarmupMomentum): momentum runs inverse to LR.
    `beta1` accepts the reference YAML's nested
    {type: OneCycleDecayWarmupMomentum, ...} object (or a plain float)."""
    lr_sched = _as_schedule(learning_rate)

    if isinstance(beta1, OneCycleDecayWarmupMomentum):
        b1_sched = beta1.schedule(total_step)
    elif isinstance(beta1, (int, float)):
        b1_const = float(beta1)

        def b1_sched(step):
            return b1_const
    else:
        def b1_sched(step):
            import jax.numpy as jnp
            if total_step is None:
                return beta1_peak
            frac = jnp.clip(step / total_step, 0., 1.)
            # high momentum at the ends, low at peak LR (standard one-cycle)
            tri = 1.0 - jnp.abs(2 * frac - 1.0)
            return beta1_peak - (beta1_peak - beta1_trough) * tri

    txs = []
    # an explicit grad_clip object (the reference YAML's nested
    # ClipGradByGlobalNorm) wins over the default grad_clip_norm
    clip = _clip_tx(None if grad_clip is not None else grad_clip_norm,
                    grad_clip)
    if clip is not None:
        txs.append(clip)
    txs.append(
        optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adamw(
                learning_rate, b1=b1, b2=beta2, weight_decay=weight_decay))(
                    learning_rate=lr_sched, b1=b1_sched))
    return optax.chain(*txs)


@manager.OPTIMIZERS.add_component
def AdamWOnecycle(learning_rate, total_step: int = None,
                  weight_decay: float = 0.01, grad_clip_norm: float = 10.0,
                  **kwargs):
    """(reference: optimizers.py:133)."""
    return OneCycleAdam(learning_rate, total_step=total_step,
                        weight_decay=weight_decay,
                        grad_clip_norm=grad_clip_norm, **kwargs)
