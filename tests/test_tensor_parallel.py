"""Tensor-parallel transformer sharding (parallel/tp.py) on the fake
8-device CPU mesh: numeric parity vs replicated execution, real shard
placement, and composition with the data axis."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from paddle3d_tpu.models.transformers.transformer_layers import \
    BaseTransformerLayer, MultiHeadAttention
from paddle3d_tpu.parallel import make_mesh, shard_batch, tp_shard_module
from paddle3d_tpu.parallel.tp import tp_spec_for_path


def _layer(rngs=None):
    rngs = rngs or nnx.Rngs(0)
    return BaseTransformerLayer(
        attns=[MultiHeadAttention(64, 8, rngs=rngs),
               MultiHeadAttention(64, 8, rngs=rngs)],
        embed_dims=64, feedforward_channels=128, rngs=rngs)


def test_tp_forward_matches_replicated(rng):
    layer = _layer()
    q = jnp.asarray(rng.normal(size=(2, 12, 64)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, 20, 64)).astype(np.float32))
    ref = np.asarray(layer(q, key=kv, value=kv))

    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    tp_shard_module(layer, mesh)
    graphdef, state = nnx.split(layer)

    @jax.jit
    def fwd(state, q, kv):
        m = nnx.merge(graphdef, state)
        return m(q, key=kv, value=kv)

    out = np.asarray(fwd(state, q, kv))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_tp_params_actually_sharded():
    layer = _layer()
    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    tp_shard_module(layer, mesh)
    state = nnx.state(layer)
    sharded = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        if not hasattr(leaf, "sharding"):
            continue
        spec = leaf.sharding.spec
        if any(s is not None for s in spec):
            sharded += 1
            # the addressable shard really is smaller along the model axis
            shard_shape = leaf.addressable_shards[0].data.shape
            assert np.prod(shard_shape) == np.prod(leaf.shape) // 4
    # qkv x2 attns (3 kernels + 3 biases each) + out kernels + fc1 k/b + fc2 k
    assert sharded >= 10


def test_tp_composes_with_data_axis(rng):
    layer = _layer()
    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    tp_shard_module(layer, mesh)
    graphdef, state = nnx.split(layer)
    q = rng.normal(size=(4, 12, 64)).astype(np.float32)
    ref_in = jnp.asarray(q)
    ref = np.asarray(nnx.merge(graphdef, state)(ref_in))
    batch = shard_batch({"q": q}, mesh)

    @jax.jit
    def fwd(state, q):
        m = nnx.merge(graphdef, state)
        return m(q)

    out = np.asarray(fwd(state, batch["q"]))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_tp_spec_rules():
    class L:  # minimal leaf stub
        def __init__(self, ndim):
            self.ndim = ndim

    class K:
        def __init__(self, key):
            self.key = key

    assert tp_spec_for_path((K("attn"), K("query"), K("kernel")), L(3)) == \
        jax.sharding.PartitionSpec(None, "model", None)
    assert tp_spec_for_path((K("ffn"), K("fc1"), K("kernel")), L(2)) == \
        jax.sharding.PartitionSpec(None, "model")
    assert tp_spec_for_path((K("norms"), K("0"), K("scale")), L(1)) == \
        jax.sharding.PartitionSpec()
