"""Space-to-depth execution of the embedding's first convolution.

The tower's first layer is a 5x5 stride-2 pad-2 convolution with cin=3
(reference ``embedding.py:36-38``). On TPU an [B, H, W, 3] tensor is
physically padded to 128 lanes — every read of the full-resolution image
costs ~42x its logical bytes. Space-to-depth trades resolution for lanes:

    s2d(2x2): [B, H, W, 3] -> [B, H/2, W/2, 12]

and the 5x5 stride-2 conv becomes EXACTLY a 3x3 stride-1 conv on the phase
image, with the 5x5 taps scattered into a [3, 3, 12, cout] kernel by their
(phase, offset) decomposition: input row index 2y + dy - 2 lands in phase
``dy % 2`` of phase-grid row ``y + (dy - 2 - (dy % 2)) // 2``, giving
dy -> (phase, tap): {0: (0,0), 1: (1,0), 2: (0,1), 3: (1,1), 4: (0,2)}.
The stride-2 pad-2 boundary semantics map 1:1 onto pad-1 of the phase grid
because the pad is even, so the equivalence is exact at the borders too
(verified to float noise in ``tests/test_blocks.py``).

The kernel embedding happens at APPLY time from the unchanged [5, 5, 3, 64]
parameters, so checkpoints and the torch import are untouched; the flag
only selects the execution form.

Requires even H, W — guaranteed inside the network, which pads to
multiples of 64 first (``ops/pad.py``).

MEASURED NEGATIVE RESULT on v5e (r4, ``scripts/microbench_r4_candidates.py
--s2d`` + composed ``ab_eval_configs.py``): the conv itself halves (0.511
-> 0.245 ms at 576x960) but the phase relayout costs ~0.8 ms — it reads
the 42x-lane-padded image AND writes a 10.7x-padded phase tensor, while
XLA otherwise fuses pad+cast+input-norm directly into the first conv's
passes. Composed eval: 20.44 ms vs 20.03 baseline. Kept as an exact,
tested opt-in (``PDSConfig.embedding_s2d``) for front-ends that cannot
fuse (e.g. when the image arrives pre-normalized from another program).
"""

from __future__ import annotations

import jax.numpy as jnp

# dy -> (input phase, 3x3 tap index) for kernel size 5, stride 2, pad 2.
_PHASE_TAPS = ((0, 0), (1, 0), (0, 1), (1, 1), (0, 2))


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4*C]; lane order (py, px, c)."""
    batch, height, width, channels = x.shape
    phases = x.reshape(batch, height // 2, 2, width // 2, 2, channels)
    phases = jnp.transpose(phases, (0, 1, 3, 2, 4, 5))
    return phases.reshape(batch, height // 2, width // 2, 4 * channels)


def embed_conv5_kernel(weight: jnp.ndarray) -> jnp.ndarray:
    """[5, 5, cin, cout] stride-2 pad-2 kernel -> [3, 3, 4*cin, cout]
    stride-1 pad-1 kernel over the space-to-depth phase image."""
    if weight.shape[:2] != (5, 5):
        raise ValueError(f"expected a 5x5 kernel, got {weight.shape}")
    cin, cout = weight.shape[2], weight.shape[3]
    embedded = jnp.zeros((3, 3, 4 * cin, cout), weight.dtype)
    for dy in range(5):
        phase_y, tap_y = _PHASE_TAPS[dy]
        for dx in range(5):
            phase_x, tap_x = _PHASE_TAPS[dx]
            lane = (phase_y * 2 + phase_x) * cin
            embedded = embedded.at[tap_y, tap_x, lane:lane + cin, :].set(
                weight[dy, dx])
    return embedded
