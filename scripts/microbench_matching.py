#!/usr/bin/env python
"""Microbenchmark of the matching stage's internals at the benchmark shape.

Breaks the measured matching time into: factored cost-volume build, the
disparity-batched residual tail's convolutions, and its instance norms.
Not part of the public API; informs ``models/matching.py`` optimization.
"""

import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pds_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from practicaldeepstereo_nips2018_tpu.models import blocks, matching  # noqa: E402
from practicaldeepstereo_nips2018_tpu.ops import costvolume  # noqa: E402

HEIGHT, WIDTH = 144, 240  # descriptor resolution for 576x960 padded input
DISPARITIES = 48
SHORT, LONG, REPEATS = 2, 10, 3
DTYPE = jnp.bfloat16


def slope(fn, *args):
    @jax.jit
    def run(first, iterations):
        def body(_, carry):
            out = fn(first + carry * 1e-30, *args[1:])
            leaves = jax.tree.leaves(out)
            return sum(jnp.mean(leaf) for leaf in leaves).astype(first.dtype)

        return lax.fori_loop(0, iterations, body,
                             jnp.zeros((), first.dtype))

    float(run(args[0], 1))

    def timed(iters):
        start = time.perf_counter()
        float(run(args[0], iters))
        return time.perf_counter() - start

    samples = [(timed(LONG) - timed(SHORT)) / (LONG - SHORT)
               for _ in range(REPEATS)]
    return statistics.median(samples)


def main():
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(
        lambda p: p.astype(DTYPE),
        matching.init(jax.random.split(key)[0]))
    key_l, key_r, key_v = jax.random.split(jax.random.PRNGKey(1), 3)
    desc_l = jax.random.normal(key_l, (1, HEIGHT, WIDTH, 64), DTYPE)
    desc_r = jax.random.normal(key_r, (1, HEIGHT, WIDTH, 64), DTYPE)
    volume = jax.random.normal(
        key_v, (1, DISPARITIES, HEIGHT, WIDTH, 64), DTYPE)
    flat = volume.reshape(DISPARITIES, HEIGHT, WIDTH, 64)

    t_build = slope(
        lambda dl: costvolume.build_cost_volume(params["head"], dl, desc_r,
                                                DISPARITIES - 1), desc_l)
    print(f"cost-volume build:        {t_build*1e3:8.3f} ms")

    def tail_convs_only(x):
        for name in ("residual1", "residual2"):
            for block_name in ("block1", "block2"):
                x = blocks.conv(params[name][block_name]["conv"], x)
                x = blocks.leaky_relu(x)
        return blocks.conv(params["tail"], x)

    t_convs = slope(tail_convs_only, flat)
    print(f"tail convs (no norms):    {t_convs*1e3:8.3f} ms")

    def norms_only(x):
        for name in ("residual1", "residual2"):
            for block_name in ("block1", "block2"):
                x = blocks.instance_norm(x, params[name][block_name]["norm"])
        return x

    t_norms = slope(norms_only, flat)
    print(f"4 instance norms:         {t_norms*1e3:8.3f} ms")

    t_tail = slope(lambda v: matching._operation_tail(params, v), volume)
    print(f"full operation tail:      {t_tail*1e3:8.3f} ms")

    t_full = slope(
        lambda dl: matching.apply(params, dl, desc_r, DISPARITIES - 1),
        desc_l)
    print(f"full matching stage:      {t_full*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
