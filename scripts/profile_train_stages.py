#!/usr/bin/env python
"""Per-stage timing of the TRAINING step at the benchmark config.

The eval profile (``profile_stages.py``) attributes the forward; this
attributes forward+backward per stage: each stage's ``jax.value_and_grad``
(with respect to its parameters AND its activation inputs — the train step
backpropagates through both) is timed in isolation with the same device-loop
slope methodology as ``bench.py``.

Caveats, both documented in BASELINE.md's measurement notes:
* isolation breaks XLA's cross-stage fusion, so the stage sum can differ
  from the composed step (measured r3: isolation can lie by a few ms) — the
  composed full-step time is printed alongside for exactly that reason;
* stages run WITHOUT remat (store-everything): this is the decomposition of
  the ``remat=False`` step. The per-policy composed step times live in
  ``TRAIN_REMAT_r05.json`` (scripts/ab_train_remat.py).

Usage: python scripts/profile_train_stages.py [--batch 1]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from practicaldeepstereo_nips2018_tpu import models, ops  # noqa: E402
from practicaldeepstereo_nips2018_tpu.models import (  # noqa: E402
    embedding, matching, regularization)
from practicaldeepstereo_nips2018_tpu.ops import pad as pad_ops  # noqa: E402

HEIGHT, WIDTH = 540, 960
MAXIMUM_DISPARITY = 255  # the reference's training range
SHORT, LONG, REPEATS = 2, 10, 5
DTYPE = jnp.bfloat16
FOLDED_IMPL = "banded_slab"


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


def looped_grad(stage_fn):
    """fori_loop over value_and_grad of ``stage_fn(*differentiable_args)``;
    the scalarized gradient sum is carried so nothing is dead code."""

    def run(*args):
        iters = args[-1]
        inputs = args[:-1]

        def scalar_loss(*xs):
            out = stage_fn(*xs)
            return sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(out))

        grad_fn = jax.value_and_grad(scalar_loss,
                                     argnums=tuple(range(len(inputs))))

        def body(_, carry):
            perturbed = tuple(
                jax.tree.map(lambda leaf: leaf + carry.astype(leaf.dtype)
                             * 1e-30, x)
                for x in inputs)
            value, grads = grad_fn(*perturbed)
            return (value + sum(jnp.sum(leaf.astype(jnp.float32))
                                for leaf in jax.tree.leaves(grads))
                    ) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return run


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()

    config = models.PDSConfig(maximum_disparity=MAXIMUM_DISPARITY,
                              folded_conv_impl=FOLDED_IMPL)
    params = models.init(jax.random.PRNGKey(0), config)

    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    left = jax.random.uniform(
        keys[0], (args.batch, HEIGHT, WIDTH, 3)) * 255.0
    right = jax.random.uniform(
        keys[1], (args.batch, HEIGHT, WIDTH, 3)) * 255.0
    ground_truth = jax.random.uniform(
        keys[2], (args.batch, HEIGHT, WIDTH)) * 200.0
    left_p = pad_ops.pad_to_multiple(left, 64).astype(DTYPE)
    right_p = pad_ops.pad_to_multiple(right, 64).astype(DTYPE)
    gt_p = pad_ops.pad_to_multiple(ground_truth, 64)

    cast = lambda tree: jax.tree.map(  # noqa: E731
        lambda p: p.astype(DTYPE), tree)
    emb_params = cast(params["embedding"])
    match_params = cast(params["matching"])
    reg_params = cast(params["regularization"])
    depth = config.matching_maximum_disparity + 1

    @jax.jit
    def precompute(left_p, right_p):
        desc_l, shortcut = embedding.apply(emb_params, left_p)
        desc_r, _ = embedding.apply(emb_params, right_p)
        folded = matching.apply_folded(match_params, desc_l, desc_r,
                                       config.matching_maximum_disparity)
        core, core_depth = regularization.hourglass_core(
            reg_params, folded, depth, shortcut, impl=FOLDED_IMPL)
        similarities = regularization.final_upsampling(
            reg_params, core, core_depth, impl=FOLDED_IMPL)
        return desc_l, desc_r, shortcut, folded, core, similarities

    desc_l, desc_r, shortcut, folded, core, similarities = (
        jax.block_until_ready(precompute(left_p, right_p)))
    core_depth = depth  # 4 ceil-halvings then 4 doublings restore D'

    stages = {}
    stages["embedding (x2, fwd+bwd)"] = 2 * slope(
        looped_grad(lambda p: embedding.apply(p, left_p)), emb_params)
    stages["matching (fwd+bwd)"] = slope(
        looped_grad(lambda p, dl, dr: matching.apply_folded(
            p, dl, dr, config.matching_maximum_disparity)),
        match_params, desc_l, desc_r)
    stages["hourglass core (fwd+bwd)"] = slope(
        looped_grad(lambda p, v, s: regularization.hourglass_core(
            p, v, depth, s, impl=FOLDED_IMPL)[0]),
        reg_params, folded, shortcut)
    stages["upsamplers (fwd+bwd)"] = slope(
        looped_grad(lambda p, v: regularization.final_upsampling(
            p, v, core_depth, impl=FOLDED_IMPL)),
        reg_params, core)
    stages["loss (fwd+bwd)"] = slope(
        looped_grad(lambda s: ops.subpixel_cross_entropy(
            s.astype(jnp.float32), gt_p,
            disparity_step=config.disparity_step)),
        similarities)

    for name, seconds in stages.items():
        print(f"{name:28s} {seconds * 1e3:8.3f} ms", flush=True)
    print(f"{'sum':28s} {sum(stages.values()) * 1e3:8.3f} ms", flush=True)

    import bench
    composed = bench.train_step_seconds(args.batch, remat=False)
    print(f"{'composed step (remat=none)':28s} "
          f"{(composed or float('nan')) * 1e3:8.3f} ms", flush=True)
    import json
    print(json.dumps({"batch": args.batch,
                      "stages_ms": {k: round(v * 1e3, 3)
                                    for k, v in stages.items()},
                      "sum_ms": round(sum(stages.values()) * 1e3, 3),
                      "composed_remat_none_ms": (
                          None if composed is None
                          else round(composed * 1e3, 3))}))


if __name__ == "__main__":
    main()
