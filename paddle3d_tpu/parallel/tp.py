"""Tensor parallelism for the transformer stack (NEW capability — the
reference is data-parallel only, SURVEY.md §2.2).

Megatron-style sharding over a `model` mesh axis, expressed entirely as
GSPMD sharding annotations — no manual collectives:

  * attention q/k/v projections split by HEAD (kernel [D, H, dh] sharded on
    H), the output projection consumes the head shards (kernel [H, dh, D]
    sharded on H) — XLA inserts the one all-reduce after it;
  * FFN fc1 column-parallel ([D, F] sharded on F), fc2 row-parallel
    ([F, D] sharded on F) — again one all-reduce after fc2;
  * everything else (norms, embeddings, biases of row-parallel layers)
    replicated.

Usage:
    mesh = make_mesh(axes=("data", "model"), shape=(d, m))
    tp_shard_module(petr_head, mesh)          # in place
    out = jax.jit(fn)(...)                    # GSPMD partitions the math

Composes with the `data` axis: batch stays sharded over `data`, params
over `model`.
"""
from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_shard_module", "tp_spec_for_path"]


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        else:
            names.append(str(p))
    return tuple(names)


def tp_spec_for_path(path, leaf, axis: str = "model"):
    """Sharding rule for one parameter leaf, by its state path + rank.

    Returns a PartitionSpec (replicated by default)."""
    names = _path_names(path)
    ndim = getattr(leaf, "ndim", 0)

    def has(*keys):
        return any(k in names for k in keys)

    # nnx.MultiHeadAttention: q/k/v kernels [D, H, dh] / biases [H, dh];
    # out kernel [H, dh, D], out bias [D] (replicated — row-parallel output)
    if has("query", "key", "value") and ndim == 3:
        return P(None, axis, None)
    if has("query", "key", "value") and ndim == 2:
        return P(axis, None)
    if has("out") and ndim == 3:
        return P(axis, None, None)
    # FFN: fc1 column-parallel, fc2 row-parallel
    if has("fc1") and ndim == 2:
        return P(None, axis)
    if has("fc1") and ndim == 1:
        return P(axis)
    if has("fc2") and ndim == 2:
        return P(axis, None)
    return P()


def tp_shard_module(module, mesh: Mesh, axis: str = "model"):
    """Apply tensor-parallel placement to an nnx module's params in place.

    Parameters matching the attention/FFN rules are sharded over `axis`;
    the rest are replicated over the whole mesh. Dimensions not divisible
    by the axis size fall back to replication (with the head/FFN widths
    used here that only happens on degenerate configs)."""
    from flax import nnx

    naxis = mesh.shape[axis]
    state = nnx.state(module)

    def place(path, x):
        if not hasattr(x, "shape"):
            return x
        spec = tp_spec_for_path(path, x, axis)
        for dim, name in enumerate(spec):
            if name is not None and x.shape[dim] % naxis != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    state = jax.tree_util.tree_map_with_path(place, state)
    nnx.update(module, state)
    return module
