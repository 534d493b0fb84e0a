"""Training scalar logging (reference: VisualDL LogWriter usage,
paddle3d/apis/trainer.py:240-243,370-395).

Writes JSONL scalars (always) and TensorBoard events when a TB backend
(torch.utils.tensorboard / tensorboardX) is importable.
"""
import json
import os
import time

__all__ = ["ScalarWriter"]


class ScalarWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        for mod in ("torch.utils.tensorboard", "tensorboardX"):
            try:
                import importlib
                tb = importlib.import_module(mod)
                self._tb = tb.SummaryWriter(logdir)
                break
            except Exception:
                continue

    def add_scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "ts": time.time()}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
