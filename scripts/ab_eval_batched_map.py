#!/usr/bin/env python
"""A/B: direct batched eval vs lax.map vs unrolled batch-1 programs.

``EVAL_BATCH_COST_r05.json`` shows the batched-eval regression is a
COMPILED-PROGRAM artifact: per-image flops stay flat but bytes-accessed
jumps ~3x in embedding (and ~1.9x in the upsamplers) as soon as batch > 1
— XLA fully fuses the batch-1 program (embedding temp = 0 bytes!) but
materializes layout copies at batch >= 2. If that is the whole story,
running the SAME batch-1 program N times inside one jit should serve
batch N at batch-1 per-image speed. This script measures three
formulations: ``direct`` (one batched program, the r4 serving behavior),
``mapped`` (``lax.map`` over the batch-1 program), and ``unrolled``
(fully-unrolled ``lax.scan``: N independent copies of the batch-1
program).

MEASUREMENT DISCIPLINE (the r5 lesson): the shared relay chip's absolute
throughput drifts ~15% over tens of minutes — a sequential harness that
compiles+measures variant B after variant A confounds the comparison with
whatever the chip is doing that quarter-hour (an early sequential run of
this script concluded "unrolled beats batch-1 by 10%"; interleaved, the
honest result is "unrolled HOLDS batch-1 per-image throughput while
direct loses ~18%"). So: all variants are compiled FIRST, then slope
samples are taken round-robin, and each variant's median comes from
samples spread across the same wall-clock window.

Writes EVAL_BATCH_MAP_r05.json; the unrolled formulation is the
``InferenceSession`` batched default.
"""

import argparse
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pds_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))

import profile_stages  # noqa: E402

from practicaldeepstereo_nips2018_tpu import models  # noqa: E402

DTYPE = jnp.bfloat16
SHORT, LONG, ROUNDS = 2, 10, 7


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", default="EVAL_BATCH_MAP_r05.json")
    parser.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    args = parser.parse_args()

    config = models.PDSConfig(
        maximum_disparity=profile_stages.MAXIMUM_DISPARITY)
    params = models.init(jax.random.PRNGKey(0), config)

    def infer_direct(params, left, right):
        return models.infer(params, left, right, config,
                            compute_dtype=DTYPE)

    def one_image(params, pair):
        one_left, one_right = pair
        return models.infer(params, one_left[None], one_right[None],
                            config, compute_dtype=DTYPE)[0]

    def infer_mapped(params, left, right):
        return jax.lax.map(lambda pair: one_image(params, pair),
                           (left, right))

    def infer_unrolled(params, left, right):
        def body(carry, pair):
            return carry, one_image(params, pair)
        return jax.lax.scan(body, jnp.zeros(()), (left, right),
                            unroll=True)[1]

    def looped(fn):
        @jax.jit
        def run(params, left, right, iterations):
            def body(_, carry):
                return jnp.mean(fn(params, left + carry * 1e-30, right))
            return jax.lax.fori_loop(0, iterations, body, jnp.float32(0.0))
        return run

    results = {}
    for batch in args.batches:
        key_l, key_r = jax.random.split(jax.random.PRNGKey(1))
        shape = (batch, profile_stages.HEIGHT, profile_stages.WIDTH, 3)
        left = jax.random.uniform(key_l, shape) * 255.0
        right = jax.random.uniform(key_r, shape) * 255.0

        variants = {"direct": looped(infer_direct)}
        if batch > 1:
            variants["mapped"] = looped(infer_mapped)
            variants["unrolled"] = looped(infer_unrolled)

        # Compile everything BEFORE any measurement.
        for fn in variants.values():
            float(fn(params, left, right, 1))

        def slope(fn):
            start = time.perf_counter()
            float(fn(params, left, right, SHORT))
            t_short = time.perf_counter() - start
            start = time.perf_counter()
            float(fn(params, left, right, LONG))
            t_long = time.perf_counter() - start
            return (t_long - t_short) / (LONG - SHORT)

        samples = {name: [] for name in variants}
        for _ in range(ROUNDS):  # round-robin: drift hits all equally
            for name, fn in variants.items():
                samples[name].append(slope(fn))

        results[str(batch)] = {
            name: {
                "step_ms": round(statistics.median(sample) * 1e3, 3),
                "per_image_ms": round(
                    statistics.median(sample) * 1e3 / batch, 3),
                "images_per_second": round(
                    batch / statistics.median(sample), 2),
                "per_image_ms_samples": [round(s * 1e3 / batch, 3)
                                         for s in sample],
            }
            for name, sample in samples.items()}
        print(f"batch {batch}:", json.dumps(
            {k: v["per_image_ms"] for k, v in results[str(batch)].items()}),
            flush=True)

    artifact = {
        "what": ("direct batched models.infer vs lax.map vs fully-unrolled "
                 "batch-1 programs, INTERLEAVED device-loop slopes (the "
                 "shared chip's absolute throughput drifts ~15% over tens "
                 "of minutes; round-robin sampling makes the comparison "
                 "drift-robust — only per-variant RATIOS within this "
                 "artifact are meaningful, not absolute ms vs other runs)"),
        "device": jax.devices()[0].device_kind,
        "config": {"shape": [profile_stages.HEIGHT, profile_stages.WIDTH],
                   "maximum_disparity": profile_stages.MAXIMUM_DISPARITY,
                   "compute_dtype": "bfloat16"},
        "results": results,
    }
    with open(args.output, "w") as handle:
        json.dump(artifact, handle, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
