#!/usr/bin/env python
"""A/B the eval forward across optimization flags (regression hunt).

Times ``models.infer`` end-to-end (bench.py methodology) for each
(folded_conv_impl, factor_tail_conv1) combination to attribute composed-
program regressions that per-stage profiling cannot see.
"""

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


def timed_config(impl, factor, params, left, right):
    config = models.PDSConfig(maximum_disparity=191,
                              folded_conv_impl=impl,
                              factor_tail_conv1=factor)

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
    config = models.PDSConfig(maximum_disparity=191)
    params = models.init(jax.random.PRNGKey(0), config)
    key_left, key_right = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.uniform(key_left, (1, HEIGHT, WIDTH, 3)) * 255.0
    right = jax.random.uniform(key_right, (1, HEIGHT, WIDTH, 3)) * 255.0

    for impl in ("dense", "banded_slab"):
        for factor in (False, True):
            seconds = timed_config(impl, factor, params, left, right)
            print(f"impl={impl:12s} factor_conv1={factor}: "
                  f"{seconds * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
