"""Profiler hooks (reference: paddle3d/utils/profiler.py:26,82).

Same CLI surface — `--profiler_options "batch_range=[10,20];..."` — driving
`jax.profiler` trace windows instead of paddle.utils.profiler.
"""
import jax

__all__ = ["ProfilerOptions", "add_profiler_step"]


class ProfilerOptions:
    """Parse 'key=value;key=value' option strings
    (reference: profiler.py:26-80)."""

    def __init__(self, options_str: str = None):
        self._options = {
            "batch_range": [10, 20],
            "output_dir": "profiler_output",
            "exit_on_finished": False,
        }
        if options_str:
            self._parse(options_str)

    def _parse(self, options_str: str):
        for kv in options_str.replace(" ", "").split(";"):
            if "=" not in kv:
                continue
            key, value = kv.split("=", 1)
            if key == "batch_range":
                vals = value.replace("[", "").replace("]", "").split(",")
                vals = [int(v) for v in vals]
                if len(vals) == 2 and 0 <= vals[0] < vals[1]:
                    self._options[key] = vals
            elif key == "exit_on_finished":
                self._options[key] = value.lower() in ("yes", "true", "1")
            elif key == "output_dir":
                self._options[key] = value

    def __getitem__(self, name):
        return self._options[name]


_profiler_options = None
_profiler_step = 0
_tracing = False


def add_profiler_step(options_str: str = None):
    """Call once per training iteration (reference: profiler.py:82-110 /
    apis/trainer.py:349); starts/stops a jax trace over batch_range."""
    global _profiler_options, _profiler_step, _tracing
    if options_str is None:
        return
    if _profiler_options is None:
        _profiler_options = ProfilerOptions(options_str)
    lo, hi = _profiler_options["batch_range"]
    if _profiler_step == lo and not _tracing:
        jax.profiler.start_trace(_profiler_options["output_dir"])
        _tracing = True
    elif _profiler_step == hi and _tracing:
        jax.profiler.stop_trace()
        _tracing = False
        if _profiler_options["exit_on_finished"]:
            raise SystemExit(0)
    _profiler_step += 1


def device_memory_stats() -> dict:
    """Max/used device memory (reference logs max_memory_reserved/allocated,
    trainer.py:384-388)."""
    stats = {}
    for dev in jax.local_devices():
        s = dev.memory_stats() or {}
        stats[str(dev)] = {
            "bytes_in_use": s.get("bytes_in_use"),
            "peak_bytes_in_use": s.get("peak_bytes_in_use"),
        }
    return stats
