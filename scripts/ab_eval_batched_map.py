#!/usr/bin/env python
"""A/B: direct batched eval vs lax.map over the batch-1 program.

``EVAL_BATCH_COST_r05.json`` shows the batched-eval regression is a
COMPILED-PROGRAM artifact: per-image flops stay flat but bytes-accessed
jumps ~3x in embedding (and ~1.9x in the upsamplers) as soon as batch > 1
— XLA fully fuses the batch-1 program (embedding temp = 0 bytes!) but
materializes layout copies at batch >= 2. If that is the whole story,
running the SAME batch-1 program N times inside one jitted ``lax.map``
should serve batch N at batch-1 per-image speed. This script measures it.

Writes EVAL_BATCH_MAP_r05.json; if the mapped path wins it becomes the
``InferenceSession`` batched default.
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pds_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))

import profile_stages  # noqa: E402
from profile_stages import looped, slope  # noqa: E402

from practicaldeepstereo_nips2018_tpu import models  # noqa: E402

DTYPE = jnp.bfloat16


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", default="EVAL_BATCH_MAP_r05.json")
    parser.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    args = parser.parse_args()

    config = models.PDSConfig(
        maximum_disparity=profile_stages.MAXIMUM_DISPARITY)
    params = models.init(jax.random.PRNGKey(0), config)

    def infer_direct(left, right):
        return models.infer(params, left, right, config,
                            compute_dtype=DTYPE)

    def one_image(pair):
        one_left, one_right = pair
        return models.infer(params, one_left[None], one_right[None],
                            config, compute_dtype=DTYPE)[0]

    def infer_mapped(left, right):
        return jax.lax.map(one_image, (left, right))

    def infer_unrolled(left, right):
        # Fully-unrolled scan: N independent copies of the batch-1 program
        # in one jit — tests whether the mapped path's ~4.6 ms/img gap to
        # batch-1 is scan loop-body fusion loss (an unrolled body has no
        # loop state to break fusion across).
        def body(carry, pair):
            return carry, one_image(pair)
        return jax.lax.scan(body, jnp.zeros(()), (left, right),
                            unroll=True)[1]

    results = {}
    for batch in args.batches:
        key_l, key_r = jax.random.split(jax.random.PRNGKey(1))
        shape = (batch, profile_stages.HEIGHT, profile_stages.WIDTH, 3)
        left = jax.random.uniform(key_l, shape) * 255.0
        right = jax.random.uniform(key_r, shape) * 255.0

        row = {}
        variants = [("direct", infer_direct), ("mapped", infer_mapped)]
        if batch > 1:
            variants.append(("unrolled", infer_unrolled))
        for name, fn in variants:
            seconds = slope(looped(lambda l, fn=fn: fn(l, right)), left)
            row[name] = {"step_ms": round(seconds * 1e3, 3),
                         "per_image_ms": round(seconds * 1e3 / batch, 3),
                         "images_per_second": round(batch / seconds, 2)}
        results[str(batch)] = row
        print(f"batch {batch}:", json.dumps(row), flush=True)

    artifact = {
        "what": ("direct batched models.infer vs lax.map over the batch-1 "
                 "program, device-loop slope per batch size; tests the "
                 "EVAL_BATCH_COST_r05 conclusion that the batch>=2 "
                 "slowdown is a compiled-program artifact the mapped "
                 "formulation avoids"),
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
