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

Batched serving (root-caused r5, artifacts ``EVAL_BATCH_r05.json`` /
``EVAL_BATCH_COST_r05.json`` / ``EVAL_BATCH_MAP_r05.json``): naively
batching the forward REGRESSES — XLA fully fuses the batch-1 program
(embedding runs with ZERO temp bytes) but at batch >= 2 materializes
layout copies, tripling embedding's bytes-accessed per image; per-image
flops stay flat, so it is a compiled-program artifact, not a hardware
ceiling. The session therefore serves batch > 1 as N independent copies
of the batch-1 program in one jit (a fully-unrolled ``lax.scan``,
``batched_mode="unroll"``, the default): each copy keeps batch-1's
perfect fusion. Measured INTERLEAVED at 960x540 D=191 on a v5e chip
(per-image ms at batch 4, same window: the shared chip's absolute
throughput drifts ~15% over tens of minutes, so only interleaved A/Bs
are comparable): unroll 20.8 ≈ batch-1's 20.5; direct (r4 behavior)
24.6 (-18%); ``lax.map`` sits between (its scan body re-materializes
loop state). So batching HOLDS per-image throughput instead of losing a
fifth of it — batch for dispatch amortization, not for kernel speedups.
Unrolling's price is compile time and executable size growing with batch
(~1 GB cached executable at batch 4 for this shape) — ``warmup`` once
per served shape; use ``batched_mode="map"`` when compile cost matters.
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
                 compute_dtype=jnp.bfloat16,
                 batched_mode: str = "unroll"):
        """Args:
            params: network parameter pytree (:func:`models.init` or
                :meth:`from_checkpoint`).
            config: static network configuration (the disparity range
                selects a jit specialization, exactly like the reference's
                ``set_maximum_disparity`` re-configured its module).
            compute_dtype: on-device compute dtype; bfloat16 is the
                measured-fastest exact-protocol choice on TPU.
            batched_mode: how batch > 1 requests execute —
                ``"unroll"`` (default; N independent copies of the batch-1
                program in one jit — holds batch-1 per-image throughput,
                see module docstring), ``"map"`` (one jitted ``lax.map``
                over the batch-1 program: cheaper compile, ~10% slower),
                or ``"direct"`` (one batched program; the r4 behavior,
                kept for A/B — slowest, measured layout-copy regression).
        """
        if batched_mode not in ("unroll", "map", "direct"):
            raise ValueError(
                f'"batched_mode" must be "unroll", "map" or "direct", '
                f"got {batched_mode!r}")
        # Weights stay jit ARGUMENTS (an interleaved A/B measured closing
        # them over as compile-time constants consistently ~3-5% SLOWER on
        # v5e; an earlier sequential A/B said the opposite and was a
        # time-drift artifact of the shared chip — see bench.py's drift
        # note), but they are jnp-ified ONCE here: numpy arrays from a
        # checkpoint restore would otherwise re-transfer host->device on
        # every predict call.
        self._params = jax.tree.map(jnp.asarray, params)
        self._config = config
        self._compute_dtype = compute_dtype
        self._batched_mode = batched_mode
        self._infer_direct = jax.jit(functools.partial(
            models.infer, config=config, compute_dtype=compute_dtype))
        self._infer_looped = jax.jit(self._looped_infer)

    def _one_image(self, params, pair):
        one_left, one_right = pair
        return models.infer(params, one_left[None], one_right[None],
                            self._config,
                            compute_dtype=self._compute_dtype)[0]

    def _looped_infer(self, params, left, right):
        if self._batched_mode == "unroll":
            def body(carry, pair):
                return carry, self._one_image(params, pair)
            return jax.lax.scan(body, jnp.zeros(()), (left, right),
                                unroll=True)[1]
        return jax.lax.map(functools.partial(self._one_image, params),
                           (left, right))

    def _infer(self, left, right):
        if left.shape[0] > 1 and self._batched_mode != "direct":
            return self._infer_looped(self._params, left, right)
        return self._infer_direct(self._params, left, right)

    @classmethod
    def from_checkpoint(cls, filename: str,
                        config: models.PDSConfig = models.PDSConfig(),
                        compute_dtype=jnp.bfloat16,
                        batched_mode: str = "unroll") -> "InferenceSession":
        """Builds a session from a training checkpoint (network-only
        restore — optimizer state in the file is ignored)."""
        template = models.init(jax.random.PRNGKey(0), config)
        trees, _ = ckpt.load_checkpoint(filename, {"params": template})
        return cls(trees["params"], config, compute_dtype, batched_mode)

    def warmup(self, height: int, width: int, batch: int = 1) -> None:
        """Compiles (or loads from the persistent cache) the
        specialization for ``[batch, height, width, 3]`` inputs. Call once
        per served shape before taking traffic."""
        zeros = jnp.zeros((batch, height, width, 3), jnp.float32)
        jax.block_until_ready(self._infer(zeros, zeros))

    def predict(self, left_image, right_image) -> np.ndarray:
        """Returns the sub-pixel disparity map [B, H, W] float32.

        Args:
            left_image, right_image: [B, H, W, 3] RGB images, 0..255
                floats (any H, W — padded internally per the 64-rule).
                An un-warmed shape compiles on first use.
        """
        disparity = self._infer(jnp.asarray(left_image),
                                jnp.asarray(right_image))
        return np.asarray(jax.block_until_ready(disparity))

    @property
    def config(self) -> models.PDSConfig:
        return self._config
