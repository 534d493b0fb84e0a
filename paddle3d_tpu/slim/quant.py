"""Quantization-aware training (reference: paddle3d/slim/quant.py:18 QAT over
paddleslim; here a self-contained fake-quant pass over nnx modules).

`get_qat_config` + `QAT.quantize(model)` mirror the reference surface
(tools/train.py --quant_config): wraps Conv/Linear kernels with
symmetric-per-tensor fake quantization (quantize-dequantize with a
straight-through estimator via stop_gradient).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["get_qat_config", "QAT", "fake_quant"]


def get_qat_config(weight_bits: int = 8, activation_bits: int = 8,
                   quantizable_layer_type: Sequence[str] = ("Conv",
                                                            "Linear")):
    return {
        "weight_bits": weight_bits,
        "activation_bits": activation_bits,
        "quantizable_layer_type": tuple(quantizable_layer_type),
    }


def fake_quant(x: jnp.ndarray, bits: int = 8) -> jnp.ndarray:
    """Symmetric per-tensor fake quantization with STE."""
    qmax = 2.0 ** (bits - 1) - 1
    scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / qmax
    q = jnp.round(x / scale) * scale
    # straight-through: forward quantized, backward identity
    return x + jax.lax.stop_gradient(q - x)


class _QuantConv(nnx.Module):
    """Fake-quantized wrapper: weights at weight_bits, inputs at
    activation_bits. The inner layer is never mutated — the quantized kernel
    lives on a functional clone, so tracing/jit see a pure computation."""

    def __init__(self, inner, weight_bits, activation_bits):
        self.inner = inner
        self.weight_bits = weight_bits
        self.activation_bits = activation_bits

    def __call__(self, x, *args, **kwargs):
        graphdef, state = nnx.split(self.inner)
        state = jax.tree_util.tree_map_with_path(
            lambda path, v: fake_quant(v, self.weight_bits)
            if any(getattr(p, "key", getattr(p, "name", None)) == "kernel"
                   for p in path) else v,
            state)
        m = nnx.merge(graphdef, state)
        return m(fake_quant(x, self.activation_bits), *args, **kwargs)


class QAT:
    """(reference: slim/quant.py:18) — wrap quantizable layers in place."""

    def __init__(self, quant_config: dict):
        self.config = quant_config

    def quantize(self, model):
        types = self.config["quantizable_layer_type"]
        wbits = self.config["weight_bits"]
        abits = self.config.get("activation_bits", wbits)

        def wrap(mod):
            for name, attr in list(vars(mod).items()):
                if isinstance(attr, (nnx.Conv, nnx.Linear)) and \
                        type(attr).__name__ in types:
                    setattr(mod, name, _QuantConv(attr, wbits, abits))
                elif isinstance(attr, nnx.Module):
                    wrap(attr)
                elif isinstance(attr, (nnx.List,)):
                    for item in attr:
                        if isinstance(item, nnx.Module):
                            wrap(item)
        wrap(model)
        return model
