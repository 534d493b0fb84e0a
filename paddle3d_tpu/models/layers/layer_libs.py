"""Shared layer building blocks (reference: paddle3d/models/layers/layer_libs.py
and param_init.py, models/voxel_encoders/pillar_encoder.py:40-61 builders).

nnx modules, NHWC layout (TPU-preferred), initializers matching the
reference's paddle defaults (uniform ±1/sqrt(fan_in)).
"""
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = [
    "uniform_init", "ConvBNReLU", "DeconvBNReLU", "LinearBN1DReLU",
    "heatmap_nms", "gather_topk_feat",
]


def uniform_init(scale_axis: str = "fan_in"):
    """paddle-default uniform(-1/sqrt(fan), 1/sqrt(fan)) initializer."""
    # variance_scaling uniform draws from ±sqrt(3*scale/fan);
    # scale=1/3 gives ±1/sqrt(fan).
    return jax.nn.initializers.variance_scaling(1. / 3., scale_axis, "uniform")


def uniform_bias_init(fan_in: int):
    """Bias initializer uniform(±1/sqrt(fan_in)) with explicit fan
    (bias tensors are 1-D, so fan can't be inferred)."""
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvBNReLU(nnx.Module):
    """Conv2D (no bias) -> BatchNorm(eps 1e-3, momentum .99) -> ReLU."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int,
                 stride: int = 1, *, rngs: nnx.Rngs,
                 eps: float = 1e-3, momentum: float = 0.99):
        self.conv = nnx.Conv(
            in_channels, out_channels,
            kernel_size=(kernel_size, kernel_size),
            strides=(stride, stride), padding="SAME", use_bias=False,
            kernel_init=uniform_init(), rngs=rngs)
        self.bn = nnx.BatchNorm(
            out_channels, epsilon=eps, momentum=momentum,
            use_running_average=False, rngs=rngs)

    def __call__(self, x):
        return nnx.relu(self.bn(self.conv(x)))


class DeconvBNReLU(nnx.Module):
    """ConvTranspose2D (no bias) -> BatchNorm -> ReLU (the reference's
    SecondFPN deblock, necks/second_fpn.py:113-133)."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int,
                 stride: int, *, rngs: nnx.Rngs,
                 eps: float = 1e-3, momentum: float = 0.99):
        self.deconv = nnx.ConvTranspose(
            in_channels, out_channels,
            kernel_size=(kernel_size, kernel_size),
            strides=(stride, stride), padding="VALID", use_bias=False,
            kernel_init=uniform_init(), rngs=rngs)
        self.bn = nnx.BatchNorm(
            out_channels, epsilon=eps, momentum=momentum,
            use_running_average=False, rngs=rngs)

    def __call__(self, x):
        return nnx.relu(self.bn(self.deconv(x)))


class LinearBN1DReLU(nnx.Module):
    """Linear (no bias) -> BatchNorm over last axis -> ReLU
    (the reference PFNLayer core, voxel_encoders/pillar_encoder.py:64)."""

    def __init__(self, in_features: int, out_features: int, *, rngs: nnx.Rngs,
                 eps: float = 1e-3, momentum: float = 0.99):
        self.linear = nnx.Linear(
            in_features, out_features, use_bias=False,
            kernel_init=uniform_init(), rngs=rngs)
        self.bn = nnx.BatchNorm(
            out_features, epsilon=eps, momentum=momentum,
            use_running_average=False, rngs=rngs)

    def __call__(self, x):
        return nnx.relu(self.bn(self.linear(x)))


def heatmap_nms(heatmap: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep local maxima of an NHWC heatmap (maxpool trick,
    reference: models/layers/layer_libs.py:46)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heatmap, -jnp.inf, jax.lax.max, (1, kernel, kernel, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return jnp.where(hmax == heatmap, heatmap, 0.)


def gather_topk_feat(feat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of [B, N, C] by [B, K] indices
    (reference: models/layers/layer_libs.py:119-163)."""
    return jnp.take_along_axis(feat, idx[..., None], axis=1)
