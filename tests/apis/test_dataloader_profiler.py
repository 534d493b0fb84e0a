"""Multi-worker DataLoader ordering/parallelism + profiler trace smoke
(reference: apis/trainer.py:35-82 worker processes; utils/profiler.py +
trainer.py:349 add_profiler_step)."""
import os
import threading
import time

import numpy as np
import pytest


class SlowDataset:
    """50 items, each __getitem__ sleeps; records concurrent readers."""

    def __init__(self):
        self.max_concurrent = 0
        self._active = 0
        self._lock = threading.Lock()

    def __len__(self):
        return 50

    def __getitem__(self, i):
        with self._lock:
            self._active += 1
            self.max_concurrent = max(self.max_concurrent, self._active)
        time.sleep(0.01)
        with self._lock:
            self._active -= 1
        return i

    def collate_fn(self, samples):
        return np.asarray(samples), [{"id": s} for s in samples]


def test_loader_multiworker_order_and_parallelism():
    from paddle3d_tpu.apis.dataloader import DataLoader

    ds = SlowDataset()
    loader = DataLoader(ds, batch_size=5, shuffle=False, num_workers=4,
                        prefetch=8)
    got = [batch for batch, metas in loader]
    flat = np.concatenate(got)
    np.testing.assert_array_equal(flat, np.arange(50))
    assert ds.max_concurrent > 1, "workers must overlap"


def test_loader_single_worker_still_works():
    from paddle3d_tpu.apis.dataloader import DataLoader

    ds = SlowDataset()
    loader = DataLoader(ds, batch_size=5, shuffle=False, num_workers=1)
    flat = np.concatenate([b for b, _ in loader])
    np.testing.assert_array_equal(flat, np.arange(50))


def test_profiler_trace_window(tmp_path):
    """add_profiler_step opens/closes a jax trace over batch_range and
    writes trace files."""
    import paddle3d_tpu.utils.profiler as prof

    # reset module state (it is process-global by design)
    prof._profiler_options = None
    prof._profiler_step = 0
    prof._tracing = False

    out = str(tmp_path / "traces")
    opts = "batch_range=[1,3];output_dir={};exit_on_finished=no".format(out)
    import jax
    import jax.numpy as jnp
    for _ in range(5):
        _ = jnp.sum(jnp.ones((8, 8))).block_until_ready()
        prof.add_profiler_step(opts)
    assert not prof._tracing
    files = []
    for root, _, names in os.walk(out):
        files += names
    assert files, "profiler produced no trace files"


def test_amp_o2_updates_bn_stats(rng):
    """Under AMP-O2 the bf16 forward copy's BatchNorm running stats must
    merge back into the live model (they were silently discarded before)."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from paddle3d_tpu.apis.pipeline import make_train_step

    class Tiny(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            self.lin = nnx.Linear(4, 4, rngs=r)
            self.bn = nnx.BatchNorm(4, use_running_average=False,
                                    momentum=0.5, rngs=r)

        def train_forward(self, batch):
            y = self.bn(self.lin(batch["data"]))
            return {"loss": jnp.mean((y - batch["target"]) ** 2)}

    model = Tiny()
    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)
    step = make_train_step(amp_level="O2")
    batch = {
        "data": jnp.asarray(rng.normal(3.0, 2.0, (16, 4)), jnp.float32),
        "target": jnp.zeros((16, 4), jnp.float32),
    }
    mean_before = np.array(model.bn.mean[...])
    step(model, optimizer, batch)
    mean_after = np.array(model.bn.mean[...])
    assert not np.allclose(mean_before, mean_after), \
        "BN running mean did not update under AMP-O2"
    assert mean_after.dtype == np.float32
