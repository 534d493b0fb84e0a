import numpy as np

from paddle3d_tpu.apis import Checkpoint


def _state(v):
    return {"w": np.full((3,), v, np.float32), "b": np.float32(v)}


def test_push_evict_and_get(tmp_path):
    ckpt = Checkpoint(str(tmp_path / "ck"), keep_checkpoint_max=2)
    for i in range(4):
        ckpt.push("iter_{}".format(i), _state(i))
    assert ckpt.queue == ["iter_2", "iter_3"]
    params, opt, ema = ckpt.get(params_template=_state(0))
    np.testing.assert_allclose(params["w"], 3)
    # evicted checkpoints are deleted
    assert not (tmp_path / "ck" / "iter_0").exists()
    # best_model symlink points at latest
    assert (tmp_path / "ck" / "best_model").exists()


def test_records_and_reload(tmp_path):
    ckpt = Checkpoint(str(tmp_path / "ck"), keep_checkpoint_max=3)
    ckpt.record("iters", 123)
    ckpt.push("iter_123", _state(1), opt_state={"m": np.zeros(2)})
    # a new Checkpoint object over the same dir sees everything
    ckpt2 = Checkpoint(str(tmp_path / "ck"), keep_checkpoint_max=3)
    assert ckpt2.get_record("iters") == 123
    assert ckpt2.have("iter_123")
    params, opt, _ = ckpt2.get(
        params_template=_state(0), opt_template={"m": np.ones(2)})
    np.testing.assert_allclose(opt["m"], 0)


def test_pop(tmp_path):
    ckpt = Checkpoint(str(tmp_path / "ck"), keep_checkpoint_max=5)
    ckpt.push("a", _state(1))
    ckpt.push("b", _state(2))
    assert ckpt.pop() == "a"
    assert ckpt.queue == ["b"]
