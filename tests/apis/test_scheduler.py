from paddle3d_tpu.apis import Scheduler


def test_scheduler_by_iter():
    s = Scheduler(save_interval=4, log_interval=2, do_eval=True)
    flags = [s.step() for _ in range(8)]
    assert [f.do_log for f in flags] == [False, True] * 4
    assert [f.save_checkpoint for f in flags] == [False] * 3 + [True] + \
        [False] * 3 + [True]
    assert [f.do_eval for f in flags] == [f.save_checkpoint for f in flags]


def test_scheduler_by_epoch():
    s = Scheduler(save_interval=2, log_interval=0, do_eval=False,
                  train_by_epoch=True, iters_per_epoch=3)
    saves = [s.step().save_checkpoint for _ in range(12)]
    # epochs end at iters 3,6,9,12; save every 2 epochs -> iters 6 and 12
    assert [i + 1 for i, v in enumerate(saves) if v] == [6, 12]


def test_scheduler_disabled_intervals():
    s = Scheduler(save_interval=0, log_interval=0)
    f = s.step()
    assert not f.do_log and not f.save_checkpoint
