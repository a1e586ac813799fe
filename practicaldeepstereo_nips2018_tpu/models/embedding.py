"""Embedding tower: shared-weight image descriptor network.

Functional re-design of the reference's ``embedding.py:11-65``. The tower is
run with the SAME parameters on both images (the reference shares weights by
calling one module twice, ``network.py:39-40``; here sharing is just calling
:func:`apply` twice with one params pytree).

Architecture (reference ``embedding.py:31-44``):
    InstanceNorm(3, no affine)
    -> 5x5 stride-2 conv block (3 -> 64)      # /2
    -> 5x5 stride-2 conv block (64 -> 64)     # /4
    -> 2 x ResidualBlock(64)
    => descriptor [B, H/4, W/4, 64]
    shortcut head: 3x3 conv block (64 -> 8) => [B, H/4, W/4, 8]
(the shortcut is only consumed for the LEFT image, by the regularization
hourglass; reference ``network.py:39-40``, ``regularization.py:114-119``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from practicaldeepstereo_nips2018_tpu.models import blocks


def init(key,
         number_of_input_features: int = 3,
         number_of_embedding_features: int = 64,
         number_of_shortcut_features: int = 8,
         number_of_residual_blocks: int = 2,
         dtype=jnp.float32) -> dict:
    """Returns the embedding parameter pytree."""
    keys = jax.random.split(key, number_of_residual_blocks + 3)
    params = {
        "conv1": blocks.init_conv_block(
            keys[0], 5, number_of_input_features,
            number_of_embedding_features, dtype=dtype),
        "conv2": blocks.init_conv_block(
            keys[1], 5, number_of_embedding_features,
            number_of_embedding_features, dtype=dtype),
        "shortcut": blocks.init_conv_block(
            keys[2], 3, number_of_embedding_features,
            number_of_shortcut_features, dtype=dtype),
    }
    for i in range(number_of_residual_blocks):
        params[f"residual{i + 1}"] = blocks.init_residual_block(
            keys[3 + i], number_of_embedding_features, dtype=dtype)
    return params


def apply(params: dict, image: jnp.ndarray, s2d_front: bool = False):
    """Returns (descriptor [B, H/4, W/4, 64], shortcut [B, H/4, W/4, 8]).

    Args:
        image: [B, H, W, 3] image, raw 0..255 floats (the input instance norm
            standardizes each channel per sample, reference
            ``embedding.py:33``).
        s2d_front: execute the first 5x5-stride-2 conv in its exact
            space-to-depth form (``ops/spacetodepth.py``) — the full-
            resolution 3-channel image is 42x lane-padded on TPU, the
            half-resolution 12-channel phase image only 10.7x.
    """
    x = blocks.instance_norm(image)
    x = _tower(params, x, s2d_front)
    return x, blocks.conv_block(params["shortcut"], x)


def _tower(params: dict, x: jnp.ndarray, s2d_front: bool = False
           ) -> jnp.ndarray:
    if s2d_front:
        from practicaldeepstereo_nips2018_tpu.ops import spacetodepth
        conv1 = params["conv1"]
        phases = spacetodepth.space_to_depth(x)
        kernel = spacetodepth.embed_conv5_kernel(conv1["conv"]["w"])
        x = lax.conv_general_dilated(
            phases, kernel.astype(phases.dtype), window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + conv1["conv"]["b"].astype(x.dtype)
        x = blocks.instance_norm(blocks.leaky_relu(x), conv1["norm"])
    else:
        x = blocks.conv_block(params["conv1"], x, stride=2)
    x = blocks.conv_block(params["conv2"], x, stride=2)
    residual_count = sum(1 for name in params if name.startswith("residual"))
    for i in range(residual_count):
        x = blocks.residual_block(params[f"residual{i + 1}"], x)
    return x


def _normalize_padded(image: jnp.ndarray, pad_height: int,
                      pad_width: int) -> jnp.ndarray:
    """Input instance norm of the top/left zero-PADDED image, fused.

    Semantics are the reference's order — SizeAdapter.pad THEN
    InstanceNorm(3) (``network.py:45-48``, ``embedding.py:33``): the moments
    include the pad zeros, and pad pixels normalize to ``-mean/std``, not 0.
    Executed TPU-efficiently: a [.., 3]-channel image tensor is physically
    padded to 128 lanes (42x), so every elementwise pass over it costs ~50x
    its logical bytes — this formulation reads the UNPADDED image once for
    the moments (adjusting for the zero pixels in closed form: they add
    count but no sum) and materializes the padded+normalized result in ONE
    fused pad+affine pass, instead of pad, cast, and multi-pass norm each
    touching the padded tensor.
    """
    statistics_dtype = jnp.promote_types(image.dtype, jnp.float32)
    x = image.astype(statistics_dtype)
    height, width = image.shape[1], image.shape[2]
    padded_count = (height + pad_height) * (width + pad_width)
    total = jnp.sum(x, axis=(1, 2), keepdims=True)
    total_squares = jnp.sum(jnp.square(x), axis=(1, 2), keepdims=True)
    mean = total / padded_count
    variance = total_squares / padded_count - jnp.square(mean)
    inverse = lax.rsqrt(variance + blocks.INSTANCE_NORM_EPS)
    padded = jnp.pad(image, ((0, 0), (pad_height, 0), (pad_width, 0),
                             (0, 0)))
    return (padded * inverse - mean * inverse).astype(image.dtype)


def apply_pair(params: dict, left: jnp.ndarray, right: jnp.ndarray,
               pad_height: int = 0, pad_width: int = 0):
    """Shared-weight tower on both images as ONE batched call, with the
    input padding + instance norm fused (:func:`_normalize_padded`).

    Returns (left_descriptor, right_descriptor, left_shortcut) at the
    padded quarter resolution. Equivalent to ``apply(pad(left))`` /
    ``apply(pad(right))`` with the right image's unused shortcut head
    skipped (reference computes and discards it, ``network.py:39-40``).

    MEASURED NEGATIVE RESULT (r3, ``scripts/ab_embedding_frontend.py``):
    4.55 ms vs 2.38 ms for the plain per-image pad->cast->norm->tower on
    v5e at 960x540 — the batch-axis concat of two physically lane-padded
    image tensors materializes copies, while XLA already fuses the plain
    front-end into the first conv. Not used by ``models.network``; kept
    (with its equivalence test) as the documented measurement.
    """
    batch = left.shape[0]
    both = jnp.concatenate([left, right], axis=0)
    x = _normalize_padded(both, pad_height, pad_width)
    x = _tower(params, x)
    left_descriptor = x[:batch]
    shortcut = blocks.conv_block(params["shortcut"], left_descriptor)
    return left_descriptor, x[batch:], shortcut
