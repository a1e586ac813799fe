"""Matching stage: disparity-batched siamese head over the cost volume.

Functional re-design of the reference's ``matching.py``. The reference runs a
Python loop over disparities, each iteration applying the full
``MatchingOperation`` CNN (raw 3x3 conv 128->64, two residual blocks, raw 3x3
conv 64->8; reference ``matching.py:81-95``) to a shifted concatenation — the
hottest loop in the network.

TPU-native formulation, in two moves:

1. The 128-input head conv is *linearity-factored* into two 64-input convs
   computed ONCE, plus zero-cost column-shift adds (see
   ``ops/costvolume.py``) — exact reference semantics, ~D-fold fewer head
   FLOPs.
2. The rest of the head (residual blocks + 64->8 tail) is weight-shared
   across disparities, so it runs as ONE batched convolution with the
   disparity axis folded into the batch dimension. Instance norm inside the
   residual blocks normalizes per (batch*disparity, channel) over H,W —
   identical to the reference running each disparity as its own forward pass.

Output layout: [B, D+1, H/4, W/4, 8] (channels last; the reference's is
[B, 8, D+1, H/4, W/4]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from practicaldeepstereo_nips2018_tpu.models import blocks
from practicaldeepstereo_nips2018_tpu.ops import costvolume


def init(key,
         number_of_concatenated_descriptor_features: int = 128,
         number_of_features: int = 64,
         number_of_compact_matching_signature_features: int = 8,
         number_of_residual_blocks: int = 2,
         dtype=jnp.float32) -> dict:
    """Returns MatchingOperation parameters (reference ``matching.py:69-95``).

    The head conv keeps the reference's single [3, 3, 128, 64] kernel layout
    (it is sliced into left/right halves at apply time), so checkpoints map
    1:1 onto the reference's parameterization.
    """
    keys = jax.random.split(key, number_of_residual_blocks + 2)
    params = {
        "head": blocks.init_conv(
            keys[0], 3, number_of_concatenated_descriptor_features,
            number_of_features, dtype=dtype),
        "tail": blocks.init_conv(
            keys[1], 3, number_of_features,
            number_of_compact_matching_signature_features, dtype=dtype),
    }
    for i in range(number_of_residual_blocks):
        params[f"residual{i + 1}"] = blocks.init_residual_block(
            keys[2 + i], number_of_features, dtype=dtype)
    return params


def _operation_tail(params: dict, volume: jnp.ndarray) -> jnp.ndarray:
    """Applies the post-head matching operation, disparity folded into batch.

    Args:
        volume: [B, D, H, W, F] head-conv outputs.
    Returns:
        [B, D, H, W, S] compact matching signatures.
    """
    batch, disparities, height, width, features = volume.shape
    x = volume.reshape(batch * disparities, height, width, features)
    residual_count = sum(1 for name in params if name.startswith("residual"))
    for i in range(residual_count):
        x = blocks.residual_block(params[f"residual{i + 1}"], x)
    x = blocks.conv(params["tail"], x)
    return x.reshape(batch, disparities, height, width, x.shape[-1])


def apply(params: dict,
          left_descriptor: jnp.ndarray,
          right_descriptor: jnp.ndarray,
          maximum_disparity: int) -> jnp.ndarray:
    """Returns compact matching signatures for every disparity.

    Args:
        left_descriptor, right_descriptor: [B, H/4, W/4, 64] embeddings.
        maximum_disparity: largest disparity index (inclusive) at the
            descriptor resolution — ``(max_disparity+1)/4 - 1`` of the image-
            space range (reference ``network.py:26-36``).

    Returns:
        [B, maximum_disparity+1, H/4, W/4, 8] cost volume.
    """
    volume = costvolume.build_cost_volume(params["head"], left_descriptor,
                                          right_descriptor,
                                          maximum_disparity)
    return _operation_tail(params, volume)
