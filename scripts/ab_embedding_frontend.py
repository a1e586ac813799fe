#!/usr/bin/env python
"""A/B the embedding front-end formulations (regression hunt, r3).

The composed-program A/B (``ab_eval_configs.py``) showed ~+4 ms from the
round-3 front-end rework even though each piece looked layout-optimal.
This times the full two-image embedding (front-end + tower) per variant:

  r2        pad f32 -> cast bf16 -> instance_norm -> tower, per image
  castfirst cast bf16 -> pad -> instance_norm -> tower, per image
  fused     cast -> closed-form padded moments + one pad*inv-mu*inv pass
            -> tower, per image
  pair      the shipped apply_pair (fused + both images concatenated)
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

from practicaldeepstereo_nips2018_tpu.models import (  # noqa: E402
    blocks, embedding)
from practicaldeepstereo_nips2018_tpu.ops import pad as pad_ops  # noqa: E402

HEIGHT, WIDTH = 540, 960
SHORT, LONG, REPEATS = 2, 10, 3


def slope(fn, *args):
    jitted = jax.jit(fn)
    float(jnp.sum(jax.tree.leaves(jitted(*args, 1))[0]).astype(jnp.float32))

    def timed(iters):
        start = time.perf_counter()
        float(jnp.sum(jax.tree.leaves(jitted(*args, iters))[0]).astype(
            jnp.float32))
        return time.perf_counter() - start

    return statistics.median(
        [(timed(LONG) - timed(SHORT)) / (LONG - SHORT)
         for _ in range(REPEATS)])


def looped(body):
    def run(left, right, params, iters):
        def step(_, carry):
            out = body(params, left + carry * 1e-30, right)
            return sum(jnp.mean(leaf) for leaf in jax.tree.leaves(out)
                       ).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

    return run


def main():
    params = embedding.init(jax.random.PRNGKey(0))
    params_bf16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    key_l, key_r = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.uniform(key_l, (1, HEIGHT, WIDTH, 3)) * 255.0
    right = jax.random.uniform(key_r, (1, HEIGHT, WIDTH, 3)) * 255.0

    def r2(p, left, right):
        outs = []
        for image in (left, right):
            padded = pad_ops.pad_to_multiple(image, 64).astype(jnp.bfloat16)
            outs.append(embedding.apply(p, padded)[0])
        return outs

    def castfirst(p, left, right):
        outs = []
        for image in (left, right):
            padded = pad_ops.pad_to_multiple(image.astype(jnp.bfloat16), 64)
            outs.append(embedding.apply(p, padded)[0])
        return outs

    def fused(p, left, right):
        pad_h, pad_w = pad_ops.pad_amounts(HEIGHT, WIDTH, 64)
        outs = []
        for image in (left, right):
            normed = embedding._normalize_padded(
                image.astype(jnp.bfloat16), pad_h, pad_w)
            outs.append(embedding._tower(p, normed))
        return outs

    def pair(p, left, right):
        pad_h, pad_w = pad_ops.pad_amounts(HEIGHT, WIDTH, 64)
        l, r, s = embedding.apply_pair(p, left.astype(jnp.bfloat16),
                                       right.astype(jnp.bfloat16),
                                       pad_h, pad_w)
        return [l, r, s]

    for name, fn in (("r2", r2), ("castfirst", castfirst),
                     ("fused", fused), ("pair", pair)):
        seconds = slope(looped(fn), left, right, params_bf16)
        print(f"{name:10s}: {seconds * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
