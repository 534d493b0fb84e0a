"""Training runtime (reference: paddle3d/apis/trainer.py:110).

Same surface — Trainer(model, optimizer, ...).train()/evaluate(), rolling
checkpoints, interval scheduler, EMA, resume — rebuilt around SPMD jit:

  * the train step is one nnx.jit program; data parallelism comes from a
    `data` mesh axis (replicated params + batch-sharded inputs), replacing
    paddle.DataParallel/NCCL (reference: trainer.py:299-303);
  * loss "all-reduce for logging" (reference: pipeline.py:107-114) is free —
    the SPMD loss is already the global mean;
  * evaluation streams fixed-shape predictions back to host and feeds the
    dataset metric, matching trainer.py:461-488;
  * EMA is a parameter-pytree shadow updated inside the jitted step
    (reference: utils/ema.py ModelEMA).
"""
import os
import time
from typing import Optional

import jax
import numpy as np
import optax
from flax import nnx

from ..parallel import mesh as mesh_lib
from ..utils.logger import logger
from ..utils.summary import ScalarWriter
from ..utils.timer import Timer
from .checkpoint import Checkpoint
from .dataloader import DataLoader
from .pipeline import make_eval_step, make_train_step, parse_losses
from .scheduler import Scheduler

__all__ = ["Trainer"]


class Trainer:
    def __init__(self,
                 model,
                 optimizer,
                 iters: Optional[int] = None,
                 epochs: Optional[int] = None,
                 train_dataset=None,
                 val_dataset=None,
                 batch_size: int = 1,
                 save_dir: str = "output",
                 keep_checkpoint_max: int = 5,
                 save_interval: int = 1000,
                 log_interval: int = 10,
                 do_eval: bool = False,
                 resume: bool = False,
                 ema_decay: Optional[float] = None,
                 ema_cfg: Optional[dict] = None,
                 grad_clip_norm: Optional[float] = None,
                 amp_cfg: Optional[dict] = None,
                 dataloader_fn: Optional[dict] = None,
                 seed: int = 0,
                 profiler_options: Optional[str] = None,
                 mesh=None):
        self.model = model
        self.tx = optimizer
        self.profiler_options = profiler_options
        self.optimizer = nnx.Optimizer(model, optimizer, wrt=nnx.Param)
        self.batch_size = batch_size
        self.save_dir = save_dir
        # reference ModelEMA surface (utils/ema.py:45): decay schedule
        # type, cycle reset, start step — ema_cfg takes precedence
        ema_cfg = dict(ema_cfg or {})
        if ema_cfg and ema_decay is None:
            ema_decay = float(ema_cfg.get("decay", 0.9998))
        self.ema_decay = ema_decay
        self.ema_decay_type = ema_cfg.get("ema_decay_type", "threshold")
        self.ema_cycle_epoch = int(ema_cfg.get("cycle_epoch", -1))
        self.ema_step = int(ema_cfg.get("step", 0))

        self.mesh = mesh if mesh is not None else mesh_lib.default_mesh()
        mesh_lib.replicate_module(self.model, self.mesh)
        mesh_lib.replicate_module(self.optimizer, self.mesh)

        dl_kwargs = dict(dataloader_fn or {})
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        if train_dataset is not None:
            self.train_dataloader = DataLoader(
                train_dataset, batch_size=batch_size, shuffle=True,
                drop_last=True, seed=seed,
                num_shards=jax.process_count(),
                shard_index=jax.process_index(), **dl_kwargs)
            iters_per_epoch = max(1, len(self.train_dataloader))
        else:
            self.train_dataloader = None
            iters_per_epoch = 1

        self.train_by_epoch = epochs is not None
        if epochs is not None:
            self.iters = epochs * iters_per_epoch
        else:
            self.iters = iters or 0
        self.cur_iter = 0

        self.scheduler = Scheduler(
            save_interval=save_interval, log_interval=log_interval,
            do_eval=do_eval, train_by_epoch=self.train_by_epoch,
            iters_per_epoch=iters_per_epoch)
        self.checkpoint = Checkpoint(
            save_dir=os.path.join(save_dir, "checkpoints"),
            keep_checkpoint_max=keep_checkpoint_max)
        self.summary = (ScalarWriter(os.path.join(save_dir, "logs"))
                        if jax.process_index() == 0 else None)

        self.ema_params = None
        if ema_decay is not None:
            self.ema_params = nnx.state(self.model, nnx.Param)

        amp_cfg = dict(amp_cfg or {})
        amp_level = amp_cfg.get("level") if amp_cfg.get("use_amp") else None
        self._train_step = make_train_step(
            grad_clip_norm=grad_clip_norm, ema_decay=ema_decay,
            amp_level=amp_level)
        self._eval_step = make_eval_step()

        if resume and not self.checkpoint.empty:
            self._resume()

    # ---------------------------------------------------------------- resume
    def _resume(self):
        params_t = jax.device_get(nnx.state(self.model, nnx.Param))
        opt_t = jax.device_get(nnx.state(self.optimizer))
        ema_t = (jax.device_get(self.ema_params)
                 if self.ema_params is not None else None)
        params, opt, ema = self.checkpoint.get(
            params_template=params_t, opt_template=opt_t, ema_template=ema_t)
        if params is not None:
            nnx.update(self.model, params)
            mesh_lib.replicate_module(self.model, self.mesh)
        if opt is not None:
            nnx.update(self.optimizer, opt)
            mesh_lib.replicate_module(self.optimizer, self.mesh)
        if ema is not None:
            self.ema_params = jax.tree.map(
                lambda x: jax.device_put(x, mesh_lib.replicated(self.mesh)),
                ema)
        # reference contract (apis/trainer.py:217-221): refuse to resume a
        # run whose epoch/iter training mode differs from the checkpoint's
        saved_mode = self.checkpoint.get_record("train_by_epoch", None)
        if saved_mode is not None and bool(saved_mode) != self.train_by_epoch:
            raise RuntimeError(
                "Unable to resume: checkpoint was trained by {} but this "
                "run trains by {} (reference trainer.py:217-221)".format(
                    "epoch" if saved_mode else "iter",
                    "epoch" if self.train_by_epoch else "iter"))
        self.cur_iter = int(self.checkpoint.get_record("iters", 0))
        self.scheduler.cur_iter = self.cur_iter
        self.ema_step = int(self.checkpoint.get_record("ema_step",
                                                       self.cur_iter))
        # summary continuity (reference trainer.py:234,242: the vdl file
        # name persists in checkpoint meta so scalars append across resume)
        if self.summary is not None:
            logdir = self.checkpoint.get_record("summary_dir", None)
            if logdir and os.path.isdir(logdir):
                self.summary = ScalarWriter(logdir)
        logger.info("Resumed from iteration {}".format(self.cur_iter))

    # ----------------------------------------------------------------- train
    def train(self):
        if self.train_dataloader is None:
            raise RuntimeError("No train_dataset provided")
        timer = Timer(iters=self.iters)
        losses_acc = {}
        while self.cur_iter < self.iters:
            for batch, metas in self.train_dataloader:
                if self.cur_iter >= self.iters:
                    break
                timer.before_reader()
                dev_batch = mesh_lib.shard_batch(batch, self.mesh)
                timer.after_reader()

                if self.ema_decay is not None:
                    losses, self.ema_params = self._train_step(
                        self.model, self.optimizer, self.ema_params,
                        dev_batch, self._ema_decay_now())
                else:
                    losses = self._train_step(self.model, self.optimizer,
                                              dev_batch)
                self.cur_iter += 1
                timer.step(self.batch_size * jax.process_count())
                status = self.scheduler.step()

                # jax trace window over batch_range (reference wires
                # add_profiler_step per iteration, apis/trainer.py:349)
                if self.profiler_options is not None:
                    from ..utils.profiler import add_profiler_step
                    add_profiler_step(self.profiler_options)

                if status.do_log:
                    host_losses = {
                        k: float(v) for k, v in losses.items()
                    }
                    if self.summary is not None:
                        for k, v in host_losses.items():
                            self.summary.add_scalar(
                                "train/{}".format(k), v, self.cur_iter)
                        self.summary.add_scalar("train/ips", timer.ips,
                                                self.cur_iter)
                    # device memory telemetry (reference logs
                    # max_memory_reserved/allocated, trainer.py:384-388)
                    try:
                        stats = jax.local_devices()[0].memory_stats() or {}
                        used = stats.get("bytes_in_use")
                        if used is not None:
                            logger.info(
                                "[MEM] device bytes_in_use={:.1f}MB "
                                "peak={:.1f}MB".format(
                                    used / 2 ** 20,
                                    stats.get("peak_bytes_in_use", 0) /
                                    2 ** 20))
                    except Exception:
                        pass
                    msg = " ".join("{}={:.4f}".format(k, v)
                                   for k, v in sorted(host_losses.items()))
                    logger.info(
                        "[TRAIN] iter={}/{} {} ips={:.2f} eta={}".format(
                            self.cur_iter, self.iters, msg, timer.ips,
                            timer.eta))

                if status.save_checkpoint:
                    self._save_checkpoint()
                    if status.do_eval and self.val_dataset is not None:
                        metrics = self.evaluate(use_ema=True)
                        logger.info("[EVAL] iter={} {}".format(
                            self.cur_iter, metrics))
                        if self.summary is not None:
                            for k, v in metrics.items():
                                if isinstance(v, (int, float)):
                                    self.summary.add_scalar(
                                        "eval/{}".format(k), v,
                                        self.cur_iter)
        # final checkpoint
        self._save_checkpoint()

    def _save_checkpoint(self):
        tag = "iter_{}".format(self.cur_iter)
        self.checkpoint.record("iters", self.cur_iter)
        self.checkpoint.record("train_by_epoch", self.train_by_epoch)
        self.checkpoint.record("ema_step", self.ema_step)
        if self.summary is not None:
            self.checkpoint.record("summary_dir",
                                   os.path.join(self.save_dir, "logs"))
        self.checkpoint.push(
            tag,
            nnx.state(self.model, nnx.Param),
            opt_state=nnx.state(self.optimizer),
            ema_state=self.ema_params)
        logger.info("Saved checkpoint {}".format(tag))

    # ------------------------------------------------------------------ eval
    @staticmethod
    def pad_batch(batch: dict, batch_size: int) -> dict:
        """Zero-pad every leading-batch-dim array to the fixed batch size.

        Model-agnostic (camera batches carry img/lidar2imgs/rots/... keys,
        reference eval is likewise generic: apis/trainer.py:461-488). Zeros —
        not NaN — so padded samples cannot poison batch statistics; eval runs
        with use_running_average=True anyway (see evaluate()).
        """
        n = None
        for v in batch.values():
            if isinstance(v, np.ndarray) and v.ndim >= 1:
                n = v.shape[0]
                break
        if n is None or n >= batch_size:
            return batch

        def _pad(x):
            if not isinstance(x, np.ndarray) or x.ndim == 0 \
                    or x.shape[0] != n:
                return x
            width = [(0, batch_size - n)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, width)

        return {k: _pad(v) for k, v in batch.items()}

    def _ema_decay_now(self) -> float:
        """Per-iteration decay per the reference schedule
        (utils/ema.py:118-121) + cycle reset (apply(): epoch == cycle)."""
        import math
        step = self.ema_step
        self.ema_step += 1
        if self.ema_cycle_epoch > 0:
            iters_per_cycle = (self.scheduler.iters_per_epoch *
                               self.ema_cycle_epoch)
            if step and step % iters_per_cycle == 0:
                # cycle reset: restart the average from the live params
                self.ema_params = nnx.state(self.model, nnx.Param)
                self.ema_step = 1
                step = 0
        if self.ema_decay_type == "threshold":
            return min(self.ema_decay, (1 + step) / (10 + step))
        if self.ema_decay_type == "exponential":
            return self.ema_decay * (1 - math.exp(-(step + 1) / 2000))
        return self.ema_decay

    def evaluate(self, use_ema: bool = False) -> dict:
        if self.val_dataset is None:
            raise RuntimeError("No val_dataset provided")
        loader = DataLoader(
            self.val_dataset, batch_size=self.batch_size, shuffle=False,
            drop_last=False)
        metric_obj = self.val_dataset.metric

        backup = None
        if use_ema and self.ema_params is not None:
            backup = nnx.state(self.model, nnx.Param)
            nnx.update(self.model, self.ema_params)

        # BN must normalize with trained running averages, not per-batch
        # stats (reference calls model.eval(); deploy/python/infer.py does
        # too — evaluate and deploy must agree on the same checkpoint).
        self.model.eval()
        try:
            for batch, metas in loader:
                # pad partial batches to the fixed batch size so the eval
                # program compiles once (shapes never change)
                n = len(metas)
                batch = self.pad_batch(batch, self.batch_size)
                dev_batch = mesh_lib.shard_batch(batch, self.mesh)
                outputs = self._eval_step(self.model, dev_batch)
                outputs = jax.device_get(outputs)
                outputs = jax.tree.map(
                    lambda v: v[:n] if hasattr(v, "ndim") and v.ndim else v,
                    outputs)
                samples = self.model.postprocess_to_samples(outputs, metas)
                metric_obj.update(samples)
        finally:
            self.model.train()
            if backup is not None:
                nnx.update(self.model, backup)
        return metric_obj.compute(verbose=True)
