"""Model EMA (reference: paddle3d/utils/ema.py:45 ModelEMA, :168
SimpleModelEMA).

The hot-path EMA update is fused into the jitted train step
(apis/pipeline.make_train_step); these wrappers provide the reference's
object API (decay schedules, cycle reset, apply/restore) on top of
parameter pytrees for checkpoint/eval tooling.
"""
import jax
from flax import nnx

__all__ = ["SimpleModelEMA", "ModelEMA"]


class SimpleModelEMA:
    """Fixed-decay EMA (reference: ema.py:168)."""

    def __init__(self, model, decay: float = 0.9996):
        self.decay = decay
        self.state = jax.tree.map(lambda x: x, nnx.state(model, nnx.Param))

    def update(self, model, decay: float = None):
        d = self.decay if decay is None else decay
        params = nnx.state(model, nnx.Param)
        self.state = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                                  self.state, params)

    def apply_to(self, model):
        """Swap EMA weights in; returns the backup for restore()."""
        backup = nnx.state(model, nnx.Param)
        nnx.update(model, self.state)
        return backup

    @staticmethod
    def restore(model, backup):
        nnx.update(model, backup)


class ModelEMA(SimpleModelEMA):
    """Step-dependent decay ramp (reference: ema.py:45 'threshold' mode:
    decay = min(decay, (1 + step) / (10 + step)))."""

    def __init__(self, model, decay: float = 0.9996, mode: str = "threshold"):
        super().__init__(model, decay)
        self.mode = mode
        self.step = 0

    def update(self, model, decay: float = None):
        if decay is None:
            if self.mode == "threshold":
                decay = min(self.decay,
                            (1 + self.step) / (10 + self.step))
            elif self.mode == "exponential":
                decay = self.decay * (1 - pow(2.718281828,
                                              -(self.step + 1) / 2000))
            else:
                decay = self.decay
        super().update(model, decay)
        self.step += 1
