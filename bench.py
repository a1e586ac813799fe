#!/usr/bin/env python
"""Headline benchmark: PDS eval time-per-image on one TPU chip.

Protocol mirrors the reference's published timing (BASELINE.md): full-size
960x540 stereo pair, maximum disparity 191, eval-mode forward pass (network +
sub-pixel MAP estimator) — the reference measures 0.62 s/image on an
unspecified GPU (``/root/reference/README.md:37-39``, timing loop at
``trainer.py:141-148``).

Measurement method: the forward pass runs inside a single jitted
``lax.fori_loop`` with a carried dependency (so XLA cannot hoist the body)
and a scalar output (so the host fetch forces completion). The trip count is
a RUNTIME argument — one compilation total — and the per-image time is the
slope between two trip counts, cancelling the transport's fixed
dispatch/fetch cost. A device-side loop is essential here: per-dispatch
overhead through the TPU relay is ~25 ms and does NOT pipeline, so host-side
loops overstate the time 3x (measured: 42 ms host-looped vs 13.9 ms of
actual device time in the profiler).

Prints ONE JSON line:
    {"metric": "time_per_image", "value": <sec>, "unit": "s",
     "vs_baseline": <0.62 / sec>, ...}
"""

import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

# Remote TPU compilation through the relay costs tens of minutes per
# program; persist compiled executables across runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pds_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

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
            # Carried dependency: a value-zero but data-dependent input
            # perturbation prevents loop-invariant hoisting / CSE.
            perturbed = left + carry * 1e-30
            disparity = models.infer(params, perturbed, right, config,
                                     compute_dtype=jnp.bfloat16)
            return jnp.mean(disparity)

        return jax.lax.fori_loop(0, iterations, body, jnp.float32(0.0))

    # Warmup / compile. The scalar fetch forces completion (on relayed
    # device transports block_until_ready alone can return early).
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
