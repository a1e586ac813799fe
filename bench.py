#!/usr/bin/env python
"""Headline benchmark: PDS eval time-per-image on one TPU chip.

Protocol mirrors the reference's published timing (BASELINE.md): full-size
960x540 stereo pair, maximum disparity 191, eval-mode forward pass (network +
sub-pixel MAP estimator) — the reference measures 0.62 s/image on an
unspecified GPU (``/root/reference/README.md:37-39``, timing loop at
``trainer.py:141-148``).

Measurement method: the forward pass runs inside a single jitted
``lax.fori_loop`` with a carried dependency (so XLA cannot hoist it) and a
scalar output (so completion is forced by the host fetch). The per-image
time is the slope between two loop lengths, which cancels the fixed
dispatch/fetch overhead of the device transport. The loop length is a
runtime argument — one compilation total.

Prints ONE JSON line:
    {"metric": "time_per_image", "value": <sec>, "unit": "s",
     "vs_baseline": <0.62 / sec>, ...}
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from practicaldeepstereo_nips2018_tpu import models  # noqa: E402

BASELINE_SECONDS = 0.62
HEIGHT, WIDTH = 540, 960
MAXIMUM_DISPARITY = 191
SHORT_ITERATIONS = 2
LONG_ITERATIONS = 10
REPEATS = 3


def main():
    config = models.PDSConfig(maximum_disparity=MAXIMUM_DISPARITY)
    params = models.init(jax.random.PRNGKey(0), config)

    key_left, key_right = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.uniform(key_left, (1, HEIGHT, WIDTH, 3),
                              jnp.float32) * 255.0
    right = jax.random.uniform(key_right, (1, HEIGHT, WIDTH, 3),
                               jnp.float32) * 255.0

    @jax.jit
    def run(params, left, right, iterations):
        def body(_, carry):
            # Carried dependency: perturb the input by a term that is zero
            # in value but data-dependent, so the loop body cannot be
            # hoisted or CSE'd away.
            perturbed_left = left + carry * 1e-30
            disparity = models.infer(params, perturbed_left, right, config,
                                     compute_dtype=jnp.bfloat16)
            return jnp.mean(disparity)

        return jax.lax.fori_loop(0, iterations, body,
                                 jnp.float32(0.0))

    # Warmup / compile.
    float(run(params, left, right, 1))

    def timed(iterations: int) -> float:
        start = time.perf_counter()
        float(run(params, left, right, iterations))
        return time.perf_counter() - start

    slopes = []
    for _ in range(REPEATS):
        short = timed(SHORT_ITERATIONS)
        long = timed(LONG_ITERATIONS)
        slopes.append((long - short) / (LONG_ITERATIONS - SHORT_ITERATIONS))

    seconds = statistics.median(slopes)
    print(json.dumps({
        "metric": "time_per_image",
        "value": round(seconds, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / seconds, 2),
        "detail": {
            "shape": [HEIGHT, WIDTH],
            "maximum_disparity": MAXIMUM_DISPARITY,
            "compute_dtype": "bfloat16",
            "device": str(jax.devices()[0]),
            "frames_per_second": round(1.0 / seconds, 2),
            "slope_samples_s": [round(s, 5) for s in slopes],
            "baseline_seconds": BASELINE_SECONDS,
        },
    }))


if __name__ == "__main__":
    main()
