"""The driver contract: entry() compile-checks and dryrun_multichip runs a
sharded train step on the fake 8-device CPU mesh."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_traces():
    import jax

    import __graft_entry__ as ge
    fn, (state, pts) = ge.entry()
    # trace + lower only (full KITTI-scale compile is exercised on TPU by the
    # driver; on CPU we check the program is well-formed)
    lowered = jax.jit(fn).lower(state, pts)
    text = lowered.as_text()
    assert "stablehlo" in text or "func.func" in text
