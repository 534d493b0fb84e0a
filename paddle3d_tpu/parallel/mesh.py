"""Device mesh and sharding helpers.

TPU-native replacement for the reference's NCCL/DataParallel stack
(reference: paddle3d/apis/trainer.py:299-303, env.py:216-217,
utils/tensor_fusion_utils.py): one `jax.sharding.Mesh`, replicated params,
batch sharded over the `data` axis — XLA inserts and overlaps the gradient
all-reduces over ICI, so the reference's fused/bucketed allreduce machinery
has no equivalent here by design.

The mesh may have more axes than `data` (model/tensor axes for future
sharded models); everything here only assumes a `data` axis exists.
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "data_sharding", "replicated", "shard_batch",
    "replicate_module", "nranks", "local_rank"
]

_DEFAULT_MESH: Optional[Mesh] = None


def make_mesh(axes: Sequence[str] = ("data",),
              shape: Sequence[int] = None,
              devices=None) -> Mesh:
    """Build a mesh over all (or given) devices.

    Default: 1-D `data` mesh over every addressable device — the TPU
    equivalent of the reference's data-parallel process group.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axes))


def default_mesh() -> Mesh:
    global _DEFAULT_MESH
    if _DEFAULT_MESH is None:
        _DEFAULT_MESH = make_mesh()
    return _DEFAULT_MESH


def set_default_mesh(mesh: Mesh):
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch-axis sharded.

    Arrays whose leading dim is not divisible by the data-axis size are
    replicated instead (e.g. tiny debug batches on a big mesh)."""
    ndata = mesh.shape["data"]
    sharded = data_sharding(mesh)
    repl = replicated(mesh)

    def place(x):
        if hasattr(x, "shape") and x.ndim > 0 and x.shape[0] % ndata == 0:
            return jax.device_put(x, sharded)
        return jax.device_put(x, repl)

    return jax.tree.map(place, batch)


def replicate_module(module, mesh: Mesh):
    """Replicate an nnx module's state across the mesh in place."""
    from flax import nnx
    state = nnx.state(module)
    state = jax.tree.map(
        lambda x: jax.device_put(x, replicated(mesh))
        if hasattr(x, "shape") else x, state)
    nnx.update(module, state)
    return module


def nranks() -> int:
    """Process count (reference: env.py:216)."""
    return jax.process_count()


def local_rank() -> int:
    """Process index (reference: env.py:217)."""
    return jax.process_index()
