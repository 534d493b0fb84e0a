"""Rolling-queue checkpoint store (reference: paddle3d/apis/checkpoint.py:83).

Same contract as the reference: per-tag directories in a bounded queue
(`keep_checkpoint_max` eviction), `meta.yaml` for bookkeeping under a lock
file, `push/pop/get/record`, and rank-0-only writes. Payloads are nnx/optax
pytrees serialized with flax msgpack instead of .pdparams.
"""
import contextlib
import os
import shutil
import time
from typing import Optional

import jax
import yaml
from flax import serialization


def _to_pure(tree):
    """nnx.State -> nested plain dict (msgpack-serializable); other pytrees
    pass through."""
    if hasattr(tree, "to_pure_dict"):
        return tree.to_pure_dict()
    return tree


def _from_pure(template, pure):
    """Restore loaded pure data into an nnx.State template (in place) or
    return the plain pytree."""
    if hasattr(template, "replace_by_pure_dict"):
        template.replace_by_pure_dict(pure)
        return template
    return pure

__all__ = ["Checkpoint"]


@contextlib.contextmanager
def _file_lock(path: str, timeout: float = 60.0, stale_age: float = 300.0):
    """Tiny cross-process lock via atomic O_EXCL create
    (replaces the reference's `filelock` dependency).

    A lock is only stolen when its file is older than `stale_age` (a live
    writer refreshes nothing, but 5 min far exceeds any meta write); stealing
    removes the stale file and re-creates the lock atomically, and the
    finally-clause removes the lock only if this process created it."""
    lock = path + ".lock"
    deadline = time.time() + timeout
    acquired = False
    while not acquired:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            acquired = True
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(lock)
            except OSError:
                continue  # holder released between open and stat — retry
            if age > stale_age:
                # stale: remove and retry the atomic create (another waiter
                # may win the race; that's fine)
                try:
                    os.remove(lock)
                except FileNotFoundError:
                    pass
                continue
            if time.time() > deadline:
                raise TimeoutError(
                    "could not acquire checkpoint lock {} within {}s "
                    "(held by a live process)".format(lock, timeout))
            time.sleep(0.05)
    try:
        yield
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


class Checkpoint:
    PARAMS_FILE = "model.msgpack"
    OPT_FILE = "optimizer.msgpack"
    EMA_FILE = "model_ema.msgpack"
    META_FILE = "meta.yaml"

    def __init__(self, save_dir: str, keep_checkpoint_max: int = 5):
        self.save_dir = save_dir
        self.keep_checkpoint_max = max(1, int(keep_checkpoint_max))
        self._meta_path = os.path.join(save_dir, self.META_FILE)
        if self._rank0:
            os.makedirs(save_dir, exist_ok=True)
        self._meta = self._load_meta()
        self._meta.setdefault("queue", [])
        self._meta.setdefault("records", {})

    @property
    def _rank0(self) -> bool:
        return jax.process_index() == 0

    def _load_meta(self) -> dict:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return yaml.safe_load(f) or {}
        return {}

    def _save_meta(self):
        with _file_lock(self._meta_path):
            with open(self._meta_path, "w") as f:
                yaml.safe_dump(self._meta, f)

    @property
    def empty(self) -> bool:
        return len(self._meta["queue"]) == 0

    @property
    def queue(self):
        return list(self._meta["queue"])

    def have(self, tag: str) -> bool:
        return tag in self._meta["queue"]

    def record(self, key: str, value):
        """Arbitrary KV persisted in meta (reference: checkpoint.py:238)."""
        self._meta["records"][key] = value
        if self._rank0:
            self._save_meta()

    def get_record(self, key: str, default=None):
        return self._meta["records"].get(key, default)

    def push(self, tag: str, params_state, opt_state=None, ema_state=None):
        """Save a checkpoint and evict beyond keep_checkpoint_max
        (reference: checkpoint.py:148)."""
        if not self._rank0:
            return
        tag = str(tag)
        tag_dir = os.path.join(self.save_dir, tag)
        os.makedirs(tag_dir, exist_ok=True)
        params_state = jax.device_get(_to_pure(params_state))
        with open(os.path.join(tag_dir, self.PARAMS_FILE), "wb") as f:
            f.write(serialization.to_bytes(params_state))
        if opt_state is not None:
            with open(os.path.join(tag_dir, self.OPT_FILE), "wb") as f:
                f.write(serialization.to_bytes(
                    jax.device_get(_to_pure(opt_state))))
        if ema_state is not None:
            with open(os.path.join(tag_dir, self.EMA_FILE), "wb") as f:
                f.write(serialization.to_bytes(
                    jax.device_get(_to_pure(ema_state))))

        if tag in self._meta["queue"]:
            self._meta["queue"].remove(tag)
        self._meta["queue"].append(tag)
        while len(self._meta["queue"]) > self.keep_checkpoint_max:
            evict = self._meta["queue"].pop(0)
            shutil.rmtree(os.path.join(self.save_dir, evict),
                          ignore_errors=True)
        # "best_model" mirrors the latest, matching the reference's admitted
        # latest-as-best behavior (checkpoint.py:179-195).
        best = os.path.join(self.save_dir, "best_model")
        if os.path.islink(best) or os.path.exists(best):
            try:
                os.remove(best)
            except IsADirectoryError:
                shutil.rmtree(best)
        os.symlink(tag, best)
        self._save_meta()

    def pop(self) -> Optional[str]:
        """Drop the oldest checkpoint (reference: checkpoint.py:214)."""
        if self.empty:
            return None
        evict = self._meta["queue"].pop(0)
        if self._rank0:
            shutil.rmtree(os.path.join(self.save_dir, evict),
                          ignore_errors=True)
            self._save_meta()
        return evict

    def get(self, tag: str = None, params_template=None, opt_template=None,
            ema_template=None):
        """Load (params, opt, ema) states; tag defaults to the newest.
        Templates are pytrees with the target structure
        (flax msgpack needs them)."""
        if tag is None:
            if self.empty:
                raise RuntimeError("Checkpoint queue is empty")
            tag = self._meta["queue"][-1]
        tag_dir = os.path.join(self.save_dir, str(tag))

        def _load(fname, template):
            path = os.path.join(tag_dir, fname)
            if not os.path.exists(path) or template is None:
                return None
            with open(path, "rb") as f:
                pure = serialization.from_bytes(_to_pure(template), f.read())
            return _from_pure(template, pure)

        return (_load(self.PARAMS_FILE, params_template),
                _load(self.OPT_FILE, opt_template),
                _load(self.EMA_FILE, ema_template))
