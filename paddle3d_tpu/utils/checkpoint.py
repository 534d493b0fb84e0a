"""Pretrained-weight loading (reference: paddle3d/utils/checkpoint.py:28-101).

Loads msgpack weight files into an nnx model with name/shape-mismatch
filtering, optionally from a URL (cached under ~/.paddle3d_tpu/pretrained).
"""
import os
from typing import Union

from .logger import logger

__all__ = ["load_pretrained_model"]


def _flatten(d, prefix=()):
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def load_pretrained_model(model, path_or_url: str):
    """Load weights; skips keys whose name or shape mismatch
    (reference: checkpoint.py:64-86 filtering behavior)."""
    import jax
    from flax import nnx, serialization

    path = path_or_url
    if path.startswith(("http://", "https://")):
        from .download import download_with_cache
        path = download_with_cache(path)
    if os.path.isdir(path):
        path = os.path.join(path, "model.msgpack")
    if not os.path.exists(path):
        raise FileNotFoundError(path)

    state = nnx.state(model, nnx.Param)
    template = state.to_pure_dict()
    with open(path, "rb") as f:
        loaded = serialization.from_bytes(None, f.read())

    tmpl_flat = _flatten(template)
    load_flat = _flatten(loaded)
    matched, skipped = {}, []
    for key, val in tmpl_flat.items():
        # msgpack dict keys may be strings
        lkey = tuple(str(k) for k in key)
        cand = load_flat.get(key) or load_flat.get(lkey)
        if cand is not None and tuple(cand.shape) == tuple(val.shape):
            matched[key] = cand
        else:
            skipped.append("/".join(map(str, key)))
            matched[key] = val

    # rebuild nested dict
    nested = {}
    for key, val in matched.items():
        cur = nested
        for k in key[:-1]:
            cur = cur.setdefault(k, {})
        cur[key[-1]] = val
    state.replace_by_pure_dict(jax.tree.map(lambda x: x, nested))
    nnx.update(model, state)
    n_total = len(tmpl_flat)
    logger.info("Loaded {}/{} params from {}".format(
        n_total - len(skipped), n_total, path_or_url))
    if skipped:
        logger.warning("Skipped (missing/shape-mismatch): {}".format(
            ", ".join(skipped[:10]) +
            (" ..." if len(skipped) > 10 else "")))
    return model
