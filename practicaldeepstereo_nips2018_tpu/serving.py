"""Inference serving session: pre-compiled disparity prediction.

The reference has no deployment surface — users call the torch module in
eval mode (reference ``network.py:50-52``). On TPU the equivalent needs
three things a naive ``models.infer`` call leaves to the user:

* ONE jit specialization per input shape, compiled (and persistently
  cached) up front — a cold compile through a TPU relay costs minutes and
  must never land inside a serving request;
* the checkpoint -> params plumbing (network-only restore);
* host numpy in/out with the batch contract spelled out.

:class:`InferenceSession` packages exactly that and nothing more — it is
a thin, stateless-per-request wrapper over the same ``models.infer`` the
benchmark CLI and trainer use, so its numerics are covered by the parity
suite; the session itself is tested in ``tests/test_serving.py``.

Example:
    session = InferenceSession.from_checkpoint(
        "experiments/flyingthings3d/010_checkpoint.npz",
        models.PDSConfig(maximum_disparity=191))
    session.warmup(height=540, width=960)          # compile once
    disparity = session.predict(left, right)        # [B, H, W] float32

Throughput note (measured, ``bench.py`` r4): the forward is HBM-bound at
full resolution — batch 2/4 serve FEWER images/s (46.0/42.1) than batch-1
latency mode (50.3). Default to batch 1 unless your inputs are small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from practicaldeepstereo_nips2018_tpu import models
from practicaldeepstereo_nips2018_tpu.training import checkpoint as ckpt


class InferenceSession:
    """Pre-compiled PDS disparity inference over fixed input shapes."""

    def __init__(self,
                 params: dict,
                 config: models.PDSConfig = models.PDSConfig(),
                 compute_dtype=jnp.bfloat16):
        """Args:
            params: network parameter pytree (:func:`models.init` or
                :meth:`from_checkpoint`).
            config: static network configuration (the disparity range
                selects a jit specialization, exactly like the reference's
                ``set_maximum_disparity`` re-configured its module).
            compute_dtype: on-device compute dtype; bfloat16 is the
                measured-fastest exact-protocol choice on TPU.
        """
        self._params = params
        self._config = config
        self._compute_dtype = compute_dtype
        self._infer = jax.jit(functools.partial(
            models.infer, config=config, compute_dtype=compute_dtype))

    @classmethod
    def from_checkpoint(cls, filename: str,
                        config: models.PDSConfig = models.PDSConfig(),
                        compute_dtype=jnp.bfloat16) -> "InferenceSession":
        """Builds a session from a training checkpoint (network-only
        restore — optimizer state in the file is ignored)."""
        template = models.init(jax.random.PRNGKey(0), config)
        trees, _ = ckpt.load_checkpoint(filename, {"params": template})
        return cls(trees["params"], config, compute_dtype)

    def warmup(self, height: int, width: int, batch: int = 1) -> None:
        """Compiles (or loads from the persistent cache) the
        specialization for ``[batch, height, width, 3]`` inputs. Call once
        per served shape before taking traffic."""
        zeros = jnp.zeros((batch, height, width, 3), jnp.float32)
        jax.block_until_ready(self._infer(self._params, zeros, zeros))

    def predict(self, left_image, right_image) -> np.ndarray:
        """Returns the sub-pixel disparity map [B, H, W] float32.

        Args:
            left_image, right_image: [B, H, W, 3] RGB images, 0..255
                floats (any H, W — padded internally per the 64-rule).
                An un-warmed shape compiles on first use.
        """
        disparity = self._infer(self._params, jnp.asarray(left_image),
                                jnp.asarray(right_image))
        return np.asarray(jax.block_until_ready(disparity))

    @property
    def config(self) -> models.PDSConfig:
        return self._config
