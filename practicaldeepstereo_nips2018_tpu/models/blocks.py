"""Primitive network blocks: convs, instance norm, residual blocks.

Functional re-design of the reference's ``network_blocks.py``. Every block is
an ``init_*`` function returning a parameter pytree plus an ``apply``-style
pure function; there are no module objects and no hidden state, so everything
composes under ``jax.jit`` / ``pjit`` and ``jax.grad``.

Semantics pinned to the reference:

* Block pattern is **Conv -> LeakyReLU(0.1) -> InstanceNorm(affine)** — the
  norm comes AFTER the activation (reference ``network_blocks.py:47-58`` for
  2D, ``:61-72`` for 3D, ``:75-85`` for transposed-3D).
* "Raw" convs (no activation/norm): 3x3 2D and 3x3x3 3D
  (reference ``network_blocks.py:19-24,9-16``).
* Instance norm: per-sample, per-channel moments over the spatial dims with
  biased variance and eps=1e-5 inside the sqrt (PyTorch ``InstanceNorm``
  semantics, which the reference uses throughout).
* Explicit torch-style symmetric padding ``(k//2, k//2)`` on every conv. This
  matters: XLA's ``SAME`` padding puts the extra pad pixel on the high side
  for even-sized outputs of stride-2 convs, which would shift every window by
  one pixel relative to the reference.
* Residual block = two 3x3 conv blocks plus identity
  (reference ``network_blocks.py:134-144``).

Layouts are channels-last: NHWC / HWIO in 2D, NDHWC / DHWIO in 3D — the TPU
native layout (feature dim on the 128-wide lane dimension).

Initialization replicates PyTorch's Conv defaults (kaiming-uniform with
a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias)
so training dynamics are comparable to the reference.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

LEAKY_RELU_SLOPE = 0.1
INSTANCE_NORM_EPS = 1e-5

_DIMENSION_NUMBERS = {
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


def _as_tuple(value, n: int) -> tuple:
    if isinstance(value, (tuple, list)):
        assert len(value) == n
        return tuple(value)
    return (value,) * n


# ---------------------------------------------------------------------------
# Initializers (PyTorch Conv default: kaiming_uniform(a=sqrt(5)))
# ---------------------------------------------------------------------------


def init_conv(key, kernel_size, in_features: int, out_features: int,
              spatial_dims: int = 2, dtype=jnp.float32) -> dict:
    """Conv parameters {'w': [*k, in, out], 'b': [out]} with torch-like init."""
    kernel_size = _as_tuple(kernel_size, spatial_dims)
    fan_in = in_features * math.prod(kernel_size)
    bound = 1.0 / math.sqrt(fan_in)
    w_key, b_key = jax.random.split(key)
    w = jax.random.uniform(
        w_key, kernel_size + (in_features, out_features),
        minval=-bound, maxval=bound, dtype=dtype)
    b = jax.random.uniform(
        b_key, (out_features,), minval=-bound, maxval=bound, dtype=dtype)
    return {"w": w, "b": b}


def init_conv_transpose(key, kernel_size, in_features: int, out_features: int,
                        spatial_dims: int = 3, dtype=jnp.float32) -> dict:
    """Transposed-conv parameters; weight layout [*k, in, out] (lax order).

    PyTorch computes the init fan-in of a transposed conv from
    ``out_features * prod(kernel)``; replicated here for matching variance.
    """
    kernel_size = _as_tuple(kernel_size, spatial_dims)
    fan_in = out_features * math.prod(kernel_size)
    bound = 1.0 / math.sqrt(fan_in)
    w_key, b_key = jax.random.split(key)
    w = jax.random.uniform(
        w_key, kernel_size + (in_features, out_features),
        minval=-bound, maxval=bound, dtype=dtype)
    b = jax.random.uniform(
        b_key, (out_features,), minval=-bound, maxval=bound, dtype=dtype)
    return {"w": w, "b": b}


def init_instance_norm(out_features: int, dtype=jnp.float32) -> dict:
    """Affine instance-norm parameters (scale=1, bias=0 like PyTorch)."""
    return {
        "scale": jnp.ones((out_features,), dtype),
        "bias": jnp.zeros((out_features,), dtype),
    }


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------


def conv(params: dict, x: jnp.ndarray, stride=1,
         padding: Sequence | int | None = None) -> jnp.ndarray:
    """Channels-last convolution with explicit torch-style padding.

    Args:
        params: {'w': [*k, in, out], 'b': [out]}.
        x: [N, *spatial, C] input.
        stride: int or per-dim tuple.
        padding: int or per-dim tuple of symmetric pad; default k//2.
    """
    w = params["w"]
    spatial_dims = w.ndim - 2
    kernel_size = w.shape[:spatial_dims]
    stride = _as_tuple(stride, spatial_dims)
    if padding is None:
        padding = tuple(k // 2 for k in kernel_size)
    else:
        padding = _as_tuple(padding, spatial_dims)
    pad_config = [(p, p) for p in padding]
    # No ``preferred_element_type``: the MXU accumulates bf16 convolutions in
    # float32 regardless, and a float32-output conv of bf16 operands makes
    # the kernel-gradient convolution mixed-dtype (bf16 lhs x f32 cotangent),
    # which lax rejects — it broke the whole bfloat16 training path.
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=pad_config,
        dimension_numbers=_DIMENSION_NUMBERS[spatial_dims])
    return (out + params["b"]).astype(x.dtype)


def conv_transpose(params: dict, x: jnp.ndarray, stride,
                   padding) -> jnp.ndarray:
    """Channels-last transposed convolution, torch output-size semantics.

    Implemented as an input-dilated convolution:
    ``out = (in - 1) * stride - 2 * padding + kernel`` per spatial dim —
    identical to PyTorch's ``ConvTranspose`` shape rule. (The stored kernel is
    in lax gather order; importing a torch checkpoint requires a spatial flip
    + in/out transpose, handled by the checkpoint import tool.)
    """
    w = params["w"]
    spatial_dims = w.ndim - 2
    kernel_size = w.shape[:spatial_dims]
    stride = _as_tuple(stride, spatial_dims)
    padding = _as_tuple(padding, spatial_dims)
    pad_config = [(k - 1 - p, k - 1 - p)
                  for k, p in zip(kernel_size, padding)]
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,) * spatial_dims,
        padding=pad_config, lhs_dilation=stride,
        dimension_numbers=_DIMENSION_NUMBERS[spatial_dims])
    return (out + params["b"]).astype(x.dtype)


def instance_norm(x: jnp.ndarray, params: dict | None = None,
                  eps: float = INSTANCE_NORM_EPS) -> jnp.ndarray:
    """Instance normalization over all spatial dims of a channels-last array.

    Normalizes each (sample, channel) slice to zero mean / unit variance
    (biased variance, eps inside the sqrt — PyTorch semantics). Per-sample
    normalization means batching is semantically transparent: a data-parallel
    batch of B images produces bit-identical results to B separate runs,
    which is what makes DP training numerically faithful to the reference's
    batch-size-1 loop.

    Moments are accumulated in float32 EXPLICITLY (converted on the fly from
    the stored activation): bf16 accumulation over ~1e5 elements is lossy,
    and leaving the choice to XLA makes it keep the upstream conv's f32
    accumulator alive as a second full-size buffer (profiled: the whole
    matching tail silently ran in f32, 2x HBM traffic).

    Args:
        x: [N, *spatial, C].
        params: optional {'scale': [C], 'bias': [C]} for the affine variant.
    """
    spatial_axes = tuple(range(1, x.ndim - 1))
    statistics_dtype = jnp.promote_types(x.dtype, jnp.float32)
    x32 = x.astype(statistics_dtype)
    mean = jnp.mean(x32, axis=spatial_axes, keepdims=True)
    variance = jnp.mean(jnp.square(x32), axis=spatial_axes,
                        keepdims=True) - jnp.square(mean)
    scale = lax.rsqrt(variance + eps)
    offset = -mean * scale
    if params is not None:
        scale = scale * params["scale"]
        offset = offset * params["scale"] + params["bias"]
    return (x32 * scale + offset).astype(x.dtype)


def leaky_relu(x: jnp.ndarray,
               negative_slope: float = LEAKY_RELU_SLOPE) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


# ---------------------------------------------------------------------------
# Composite blocks: conv -> leaky_relu -> instance_norm
# ---------------------------------------------------------------------------


def init_conv_block(key, kernel_size, in_features: int, out_features: int,
                    spatial_dims: int = 2, dtype=jnp.float32) -> dict:
    """Conv + affine-instance-norm block parameters."""
    return {
        "conv": init_conv(key, kernel_size, in_features, out_features,
                          spatial_dims, dtype),
        "norm": init_instance_norm(out_features, dtype),
    }


def conv_block(params: dict, x: jnp.ndarray, stride=1) -> jnp.ndarray:
    """Conv -> LeakyReLU(0.1) -> affine InstanceNorm (act BEFORE norm)."""
    return instance_norm(leaky_relu(conv(params["conv"], x, stride)),
                         params["norm"])


def init_conv_transpose_block(key, kernel_size, in_features: int,
                              out_features: int, spatial_dims: int = 3,
                              dtype=jnp.float32) -> dict:
    return {
        "conv": init_conv_transpose(key, kernel_size, in_features,
                                    out_features, spatial_dims, dtype),
        "norm": init_instance_norm(out_features, dtype),
    }


def conv_transpose_block(params: dict, x: jnp.ndarray, stride,
                         padding) -> jnp.ndarray:
    """TransposedConv -> LeakyReLU(0.1) -> affine InstanceNorm."""
    return instance_norm(
        leaky_relu(conv_transpose(params["conv"], x, stride, padding)),
        params["norm"])


def init_residual_block(key, number_of_features: int, spatial_dims: int = 2,
                        dtype=jnp.float32) -> dict:
    """Two 3x3 conv blocks + identity (reference network_blocks.py:134-144)."""
    key1, key2 = jax.random.split(key)
    return {
        "block1": init_conv_block(key1, 3, number_of_features,
                                  number_of_features, spatial_dims, dtype),
        "block2": init_conv_block(key2, 3, number_of_features,
                                  number_of_features, spatial_dims, dtype),
    }


def residual_block(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return conv_block(params["block2"], conv_block(params["block1"], x)) + x
