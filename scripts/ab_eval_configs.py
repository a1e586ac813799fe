#!/usr/bin/env python
"""A/B the eval forward across optimization flags (regression hunt).

Times ``models.infer`` end-to-end (bench.py methodology) for named
``PDSConfig`` variants to attribute composed-program effects that per-stage
profiling cannot see — isolation microbenches LIE about composed programs
(round-3 measurements: two isolation wins each cost +2-4 ms composed).

Usage:
    python scripts/ab_eval_configs.py                    # default variants
    python scripts/ab_eval_configs.py --variants baseline s2d int8
"""

import argparse
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pds_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from practicaldeepstereo_nips2018_tpu import models  # noqa: E402

HEIGHT, WIDTH = 540, 960
SHORT, LONG, REPEATS = 5, 45, 5

# Named composed-eval variants (all exact except the int8 ones, which are
# the documented approximate inference mode).
VARIANTS = {
    "baseline": dict(folded_conv_impl="banded_slab"),
    "dense": dict(folded_conv_impl="dense"),
    "factor_conv1": dict(folded_conv_impl="banded_slab",
                         factor_tail_conv1=True),
    "s2d": dict(folded_conv_impl="banded_slab", embedding_s2d=True),
    "int8": dict(folded_conv_impl="banded_slab", matching_tail_int8=True),
    "s2d_int8": dict(folded_conv_impl="banded_slab", embedding_s2d=True,
                     matching_tail_int8=True),
}
DEFAULT_VARIANTS = ("baseline", "dense", "factor_conv1", "s2d", "int8",
                    "s2d_int8")


def timed_config(config, params, left, right):
    @jax.jit
    def run(params, left, right, iterations):
        def body(_, carry):
            disparity = models.infer(params, left + carry * 1e-30, right,
                                     config, compute_dtype=jnp.bfloat16)
            return jnp.mean(disparity)

        return jax.lax.fori_loop(0, iterations, body, jnp.float32(0.0))

    float(run(params, left, right, 1))

    def timed(iterations):
        start = time.perf_counter()
        float(run(params, left, right, iterations))
        return time.perf_counter() - start

    samples = [(timed(LONG) - timed(SHORT)) / (LONG - SHORT)
               for _ in range(REPEATS)]
    return statistics.median(samples)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--variants", nargs="*", default=DEFAULT_VARIANTS,
                        choices=sorted(VARIANTS))
    args = parser.parse_args()

    config = models.PDSConfig(maximum_disparity=191)
    params = models.init(jax.random.PRNGKey(0), config)
    key_left, key_right = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.uniform(key_left, (1, HEIGHT, WIDTH, 3)) * 255.0
    right = jax.random.uniform(key_right, (1, HEIGHT, WIDTH, 3)) * 255.0

    for name in args.variants:
        variant = models.PDSConfig(maximum_disparity=191,
                                   **VARIANTS[name])
        seconds = timed_config(variant, params, left, right)
        print(f"{name:14s} {VARIANTS[name]}: {seconds * 1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
