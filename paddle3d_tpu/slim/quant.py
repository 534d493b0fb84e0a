"""Quantization-aware training with the reference's paddleslim schema.

Mirrors the reference surface (reference: paddle3d/slim/__init__.py:19
``get_qat_config``, paddle3d/slim/quant.py:18 ``QAT``, wired from
tools/train.py:206-209) as a self-contained fake-quant pass over nnx
modules — the reference delegates to paddleslim's graph passes; here the
same quantizer semantics are implemented directly:

* ``weight_quantize_type``: ``abs_max`` (per-tensor) or
  ``channel_wise_abs_max`` (per-output-channel scales — paddleslim's
  default for conv/linear weights, configs/quant/*.yml:4).
* ``activation_quantize_type``: ``abs_max`` (current-batch range) or
  ``moving_average_abs_max`` (EMA range tracked as nnx state with
  ``moving_rate``; eval uses the frozen running range, matching
  paddle's MovingAverageAbsMaxScale observer).
* ``activation_preprocess_type: PACT`` — learnable symmetric clip
  ``x <- x - relu(x - a) + relu(-a - x)`` with per-layer parameter ``a``
  (reference configs/quant/bevformer_PACT.yml:5; PACT a trains jointly
  with the network and bounds the activation range before fake-quant).

All quantizers use straight-through estimation (forward rounds, backward
identity) so finetuning gradients flow.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["get_qat_config", "normalize_quant_config", "update_dic", "QAT",
           "fake_quant"]

_DEFAULTS = {
    "weight_quantize_type": "abs_max",
    "activation_quantize_type": "abs_max",
    "activation_preprocess_type": None,
    "weight_bits": 8,
    "activation_bits": 8,
    "dtype": "int8",
    "window_size": 10000,
    "moving_rate": 0.9,
    "quantizable_layer_type": ("Conv2D", "Linear"),
}

# paddle layer type names -> nnx module classes
_LAYER_TYPES = {
    "Conv2D": nnx.Conv,
    "Conv": nnx.Conv,
    "Linear": nnx.Linear,
}


def get_qat_config(qat_config_path: str = None, **kwargs):
    """Reference contract (slim/__init__.py:19): load a quant YAML and
    return the full slim dict (``slim_type``/``quant_config``/
    ``finetune_config``). Kwargs form (legacy round-1 surface) builds a
    bare normalized quant_config instead."""
    if qat_config_path is not None:
        import yaml
        with open(qat_config_path, encoding="utf-8") as f:
            slim_dic = yaml.safe_load(f)
        slim_type = slim_dic.get("slim_type")
        if slim_type != "QAT":
            raise ValueError(
                "slim method `{}` is not supported yet".format(slim_type))
        slim_dic["quant_config"] = normalize_quant_config(
            slim_dic.get("quant_config", {}))
        return slim_dic
    return normalize_quant_config(kwargs)


def normalize_quant_config(dic: dict) -> dict:
    """Validate + default a reference quant_config dict."""
    cfg = dict(_DEFAULTS)
    unknown = set(dic) - set(_DEFAULTS)
    if unknown:
        raise ValueError("unknown quant_config keys: {}".format(
            sorted(unknown)))
    cfg.update(dic)
    if cfg["weight_quantize_type"] not in ("abs_max",
                                           "channel_wise_abs_max"):
        raise ValueError("unsupported weight_quantize_type: {}".format(
            cfg["weight_quantize_type"]))
    if cfg["activation_quantize_type"] not in ("abs_max",
                                               "moving_average_abs_max"):
        raise ValueError("unsupported activation_quantize_type: {}".format(
            cfg["activation_quantize_type"]))
    if cfg["activation_preprocess_type"] not in (None, "PACT"):
        raise ValueError("unsupported activation_preprocess_type: {}".format(
            cfg["activation_preprocess_type"]))
    bad = [t for t in cfg["quantizable_layer_type"] if t not in _LAYER_TYPES]
    if bad:
        raise ValueError("unsupported quantizable_layer_type: {}".format(bad))
    cfg["quantizable_layer_type"] = tuple(cfg["quantizable_layer_type"])
    return cfg


def update_dic(dic, another_dic):
    """Recursive dict update (reference slim/__init__.py:30) — merges
    finetune_config into the training config."""
    for k in another_dic:
        if (k in dic and isinstance(dic[k], dict)
                and isinstance(another_dic[k], dict)):
            update_dic(dic[k], another_dic[k])
        else:
            dic[k] = another_dic[k]
    return dic


def fake_quant(x: jnp.ndarray, bits: int = 8, axis=None) -> jnp.ndarray:
    """Abs-max fake quantization with STE.

    axis=None: per-tensor. axis=k: per-channel scales along axis k
    (channel_wise_abs_max), reduced over all other axes."""
    qmax = 2.0 ** (bits - 1) - 1
    if axis is None:
        amax = jnp.max(jnp.abs(x))
    else:
        red = tuple(i for i in range(x.ndim) if i != axis % x.ndim)
        amax = jnp.max(jnp.abs(x), axis=red, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / qmax
    q = jnp.round(x / scale) * scale
    # straight-through: forward quantized, backward identity
    return x + jax.lax.stop_gradient(q - x)


def _fake_quant_with_scale(x: jnp.ndarray, scale: jnp.ndarray,
                           bits: int) -> jnp.ndarray:
    """Quantize-dequantize at a given abs-max range (STE), clipping to the
    representable window as the int8 runtime would."""
    qmax = 2.0 ** (bits - 1) - 1
    s = jnp.maximum(scale, 1e-8) / qmax
    q = jnp.clip(jnp.round(x / s), -qmax, qmax) * s
    return x + jax.lax.stop_gradient(q - x)


class _QuantWrapper(nnx.Module):
    """Fake-quantized layer wrapper.

    The inner layer is never mutated — the quantized kernel lives on a
    functional clone, so tracing/jit see a pure computation. Activation
    observers (moving-average range, PACT clip) live on the wrapper as
    nnx state/params so the train step carries them like BN stats."""

    def __init__(self, inner, cfg: dict):
        self.inner = inner
        self.weight_bits = int(cfg["weight_bits"])
        self.activation_bits = int(cfg["activation_bits"])
        self.weight_channel_wise = (
            cfg["weight_quantize_type"] == "channel_wise_abs_max")
        self.act_moving_average = (
            cfg["activation_quantize_type"] == "moving_average_abs_max")
        self.moving_rate = float(cfg["moving_rate"])
        # model.train()/eval() toggles this recursively (nnx
        # set_attributes), same flag BatchNorm uses
        self.use_running_average = True
        if self.act_moving_average:
            self.act_absmax = nnx.BatchStat(jnp.zeros((), jnp.float32))
            self.act_initialized = nnx.BatchStat(jnp.zeros((), jnp.bool_))
        if cfg["activation_preprocess_type"] == "PACT":
            # paddleslim PACT default init 20.0; trains jointly
            self.pact_alpha = nnx.Param(jnp.asarray(20.0, jnp.float32))
        else:
            self.pact_alpha = None

    def _quant_input(self, x):
        if self.pact_alpha is not None:
            a = jnp.abs(self.pact_alpha.value).astype(x.dtype)
            # symmetric learnable clip; gradients flow to alpha through
            # the relu terms exactly where clipping is active
            x = x - jax.nn.relu(x - a) + jax.nn.relu(-a - x)
        cur = jnp.max(jnp.abs(x)).astype(jnp.float32)
        if not self.act_moving_average:
            return _fake_quant_with_scale(x, cur.astype(x.dtype),
                                          self.activation_bits)
        if not self.use_running_average:
            init = self.act_initialized.value
            new = jnp.where(init,
                            self.act_absmax.value * self.moving_rate
                            + cur * (1.0 - self.moving_rate),
                            cur)
            self.act_absmax.value = new
            self.act_initialized.value = jnp.ones((), jnp.bool_)
            scale = new
        else:
            # frozen running range; fall back to the batch range if the
            # observer never saw data (export-before-train path)
            scale = jnp.where(self.act_initialized.value,
                              self.act_absmax.value, cur)
        return _fake_quant_with_scale(x, scale.astype(x.dtype),
                                      self.activation_bits)

    def __getattr__(self, name):
        # introspection passthrough (kernel/bias/in_features/...): model
        # code that reaches into a layer's attributes keeps working on the
        # wrapped layer. Only consulted when normal lookup fails.
        if name.startswith("_") or name == "inner":
            raise AttributeError(name)
        return getattr(vars(self)["inner"], name)

    def __call__(self, x, *args, **kwargs):
        axis = -1 if self.weight_channel_wise else None
        graphdef, state = nnx.split(self.inner)
        state = jax.tree_util.tree_map_with_path(
            lambda path, v: fake_quant(v, self.weight_bits, axis=axis)
            if any(getattr(p, "key", getattr(p, "name", None)) == "kernel"
                   for p in path) else v,
            state)
        m = nnx.merge(graphdef, state)
        return m(self._quant_input(x), *args, **kwargs)


# legacy name kept for round-1 callers/tests
_QuantConv = _QuantWrapper


class QAT:
    """(reference: slim/quant.py:18) — wrap quantizable layers in place."""

    def __init__(self, quant_config: dict):
        # accept either a full slim dict or a bare quant_config
        if "quant_config" in quant_config:
            quant_config = quant_config["quant_config"]
        self.config = normalize_quant_config(quant_config)

    def quantize(self, model):
        types = tuple(_LAYER_TYPES[t]
                      for t in self.config["quantizable_layer_type"])
        cfg = self.config

        def wrap(mod):
            for name, attr in list(vars(mod).items()):
                if isinstance(attr, types):
                    setattr(mod, name, _QuantWrapper(attr, cfg))
                elif isinstance(attr, nnx.Module):
                    wrap(attr)
                elif isinstance(attr, (nnx.List, list, tuple)):
                    for item in attr:
                        if isinstance(item, nnx.Module):
                            wrap(item)
        wrap(model)
        return model

    __call__ = quantize
