#!/usr/bin/env python
"""Per-stage timing of the eval forward at the benchmark shape.

Times embedding / matching / regularization / estimator separately with the
same device-loop slope methodology as ``bench.py`` (see its docstring), so
optimization effort lands on the biggest stage. Not part of the public API.
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from practicaldeepstereo_nips2018_tpu import models, ops  # noqa: E402
from practicaldeepstereo_nips2018_tpu.models import (  # noqa: E402
    embedding, matching, regularization)
from practicaldeepstereo_nips2018_tpu.ops import pad as pad_ops  # noqa: E402

HEIGHT, WIDTH = 540, 960
MAXIMUM_DISPARITY = 191
SHORT, LONG, REPEATS = 5, 45, 5  # tight slopes; trip count is a runtime arg
DTYPE = jnp.bfloat16


def slope(fn, *args):
    fn_jitted = jax.jit(fn)
    float(jnp.sum(fn_jitted(*args, 1)).astype(jnp.float32))  # compile

    def timed(iters):
        start = time.perf_counter()
        float(jnp.sum(fn_jitted(*args, iters)).astype(jnp.float32))
        return time.perf_counter() - start

    samples = []
    for _ in range(REPEATS):
        samples.append((timed(LONG) - timed(SHORT)) / (LONG - SHORT))
    return statistics.median(samples)


def looped(body_fn):
    """Wrap a tensor->tensor fn into a fori_loop with carried perturbation."""

    def run(x, *rest):
        iters = rest[-1]
        extra = rest[:-1]

        def body(_, carry):
            out = body_fn(x + carry * 1e-30, *extra)
            leaves = jax.tree.leaves(out)
            return sum(jnp.mean(leaf) for leaf in leaves).astype(x.dtype)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), x.dtype))

    return run


def main():
    import argparse
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=1,
                        help="eval batch size (batch >1 per-stage times "
                        "localize the batched-throughput regression, "
                        "VERDICT r4 weak #2)")
    args = parser.parse_args()

    config = models.PDSConfig(maximum_disparity=MAXIMUM_DISPARITY)
    params = models.init(jax.random.PRNGKey(0), config)

    key_l, key_r = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.uniform(key_l, (args.batch, HEIGHT, WIDTH, 3)) * 255.0
    right = jax.random.uniform(key_r, (args.batch, HEIGHT, WIDTH, 3)) * 255.0
    left_p = pad_ops.pad_to_multiple(left, 64).astype(DTYPE)
    right_p = pad_ops.pad_to_multiple(right, 64).astype(DTYPE)

    emb = lambda x: embedding.apply(  # noqa: E731
        jax.tree.map(lambda p: p.astype(DTYPE), params["embedding"]), x)
    match_params = jax.tree.map(lambda p: p.astype(DTYPE),
                                params["matching"])
    reg_params = jax.tree.map(lambda p: p.astype(DTYPE),
                              params["regularization"])

    depth = config.matching_maximum_disparity + 1

    @jax.jit
    def precompute(left_p, right_p):
        desc_l, shortcut = emb(left_p)
        desc_r, _ = emb(right_p)
        folded = matching.apply_folded(match_params, desc_l, desc_r,
                                       config.matching_maximum_disparity)
        similarities = regularization.apply_folded(reg_params, folded, depth,
                                                   shortcut)
        return desc_l, desc_r, shortcut, folded, similarities

    desc_l, desc_r, shortcut, folded, similarities = jax.block_until_ready(
        precompute(left_p, right_p))

    t_emb = slope(looped(emb), left_p)
    print(f"embedding (one image): {t_emb*1e3:8.3f} ms", flush=True)
    t_match = slope(
        looped(lambda dl: matching.apply_folded(
            match_params, dl, desc_r, config.matching_maximum_disparity)),
        desc_l)
    print(f"matching (folded):     {t_match*1e3:8.3f} ms", flush=True)
    t_reg = slope(
        looped(lambda v: regularization.apply_folded(reg_params, v, depth,
                                                     shortcut)),
        folded)
    print(f"regularization:        {t_reg*1e3:8.3f} ms", flush=True)
    core = jax.jit(
        lambda v: regularization.hourglass_core(reg_params, v, depth,
                                                shortcut)[0])(folded)
    core_depth = depth  # 4 ceil-halvings then 4 doublings restore D'=48
    t_core = slope(
        looped(lambda v: regularization.hourglass_core(
            reg_params, v, depth, shortcut)[0]),
        folded)
    print(f"  hourglass core:      {t_core*1e3:8.3f} ms", flush=True)
    t_upsample = slope(
        looped(lambda v: regularization.final_upsampling(
            reg_params, v, core_depth)),
        core)
    print(f"  upsamplers:          {t_upsample*1e3:8.3f} ms", flush=True)
    # No f32 pre-cast: ``models.infer`` feeds the estimator the bf16
    # similarities directly (subpixel.py upconverts in-pass).
    t_est = slope(looped(lambda s: ops.subpixel_map(s)), similarities)
    print(f"estimator:             {t_est*1e3:8.3f} ms", flush=True)
    total = 2 * t_emb + t_match + t_reg + t_est
    print(f"sum (2x emb):          {total*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
