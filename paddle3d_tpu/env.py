"""Environment info and home dirs (reference: paddle3d/env.py)."""
import os
import platform
import subprocess
import sys

__all__ = ["HOME", "PRETRAINED_HOME", "TMP_HOME", "get_env_info", "nranks",
           "local_rank"]

HOME = os.path.expanduser("~/.paddle3d_tpu")
PRETRAINED_HOME = os.path.join(HOME, "pretrained")
TMP_HOME = os.path.join(HOME, "tmp")


def _ensure_dirs():
    for d in (HOME, PRETRAINED_HOME, TMP_HOME):
        os.makedirs(d, exist_ok=True)


def nranks() -> int:
    import jax
    return jax.process_count()


def local_rank() -> int:
    import jax
    return jax.process_index()


def get_env_info() -> dict:
    """Diagnostics (reference: env.py:105)."""
    import jax
    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "process_count": jax.process_count(),
    }
    try:
        import flax
        info["flax"] = flax.__version__
    except ImportError:
        pass
    return info
