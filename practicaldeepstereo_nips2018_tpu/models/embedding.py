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


def apply(params: dict, image: jnp.ndarray):
    """Returns (descriptor [B, H/4, W/4, 64], shortcut [B, H/4, W/4, 8]).

    Args:
        image: [B, H, W, 3] image, raw 0..255 floats (the input instance norm
            standardizes each channel per sample, reference
            ``embedding.py:33``).
    """
    x = blocks.instance_norm(image)
    x = blocks.conv_block(params["conv1"], x, stride=2)
    x = blocks.conv_block(params["conv2"], x, stride=2)
    residual_count = sum(1 for name in params if name.startswith("residual"))
    for i in range(residual_count):
        x = blocks.residual_block(params[f"residual{i + 1}"], x)
    return x, blocks.conv_block(params["shortcut"], x)
