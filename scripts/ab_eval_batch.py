#!/usr/bin/env python
"""Root-cause the batched-eval throughput regression (VERDICT r4 weak #2).

``bench.py`` r4 measured eval images/s FALLING with batch size (50.1 at
batch 1 -> 46.1 / 42.2 at batch 2/4) and serving guidance was "default to
batch 1" with no profile behind it. This script produces the per-stage
evidence: every eval stage (embedding, matching, hourglass core,
upsamplers, estimator) is timed at batch 1/2/4 with the device-loop slope
methodology (see ``bench.py``'s docstring), normalized per image, plus the
whole ``models.infer`` composition. The stage(s) whose per-image time GROWS
with batch are the regression; stages that scale flat are exonerated.

Writes EVAL_BATCH_r05.json.

Usage (on the TPU host, chip otherwise idle):
    python scripts/ab_eval_batch.py --output EVAL_BATCH_r05.json
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
from profile_stages import DTYPE, looped, slope  # noqa: E402

from practicaldeepstereo_nips2018_tpu import models, ops  # noqa: E402
from practicaldeepstereo_nips2018_tpu.models import (  # noqa: E402
    embedding, matching, regularization)
from practicaldeepstereo_nips2018_tpu.ops import pad as pad_ops  # noqa: E402


def measure_batch(config, params, batch: int) -> dict:
    key_l, key_r = jax.random.split(jax.random.PRNGKey(1))
    left = jax.random.uniform(key_l, (batch, profile_stages.HEIGHT, profile_stages.WIDTH, 3)) * 255.0
    right = jax.random.uniform(key_r, (batch, profile_stages.HEIGHT, profile_stages.WIDTH, 3)) * 255.0
    left_p = pad_ops.pad_to_multiple(left, 64).astype(DTYPE)
    right_p = pad_ops.pad_to_multiple(right, 64).astype(DTYPE)

    cast = lambda tree: jax.tree.map(  # noqa: E731
        lambda p: p.astype(DTYPE), tree)
    emb_params = cast(params["embedding"])
    match_params = cast(params["matching"])
    reg_params = cast(params["regularization"])
    emb = lambda x: embedding.apply(emb_params, x)  # noqa: E731
    depth = config.matching_maximum_disparity + 1

    @jax.jit
    def precompute(left_p, right_p):
        desc_l, shortcut = emb(left_p)
        desc_r, _ = emb(right_p)
        folded = matching.apply_folded(match_params, desc_l, desc_r,
                                       config.matching_maximum_disparity)
        core = regularization.hourglass_core(reg_params, folded, depth,
                                             shortcut)[0]
        similarities = regularization.final_upsampling(reg_params, core,
                                                       depth)
        return desc_l, desc_r, shortcut, folded, core, similarities

    desc_l, desc_r, shortcut, folded, core, similarities = (
        jax.block_until_ready(precompute(left_p, right_p)))

    stages = {}
    stages["embedding_one_image"] = slope(looped(emb), left_p)
    stages["matching"] = slope(
        looped(lambda dl: matching.apply_folded(
            match_params, dl, desc_r, config.matching_maximum_disparity)),
        desc_l)
    stages["hourglass_core"] = slope(
        looped(lambda v: regularization.hourglass_core(
            reg_params, v, depth, shortcut)[0]),
        folded)
    stages["upsamplers"] = slope(
        looped(lambda v: regularization.final_upsampling(reg_params, v,
                                                         depth)),
        core)
    stages["estimator"] = slope(looped(lambda s: ops.subpixel_map(s)),
                                similarities)
    stages["sum_2x_embedding"] = (
        2 * stages["embedding_one_image"] + stages["matching"]
        + stages["hourglass_core"] + stages["upsamplers"]
        + stages["estimator"])
    stages["full_infer"] = slope(
        looped(lambda l: models.infer(params, l, right, config,
                                      compute_dtype=DTYPE)),
        left)
    return {name: {"step_ms": round(seconds * 1e3, 3),
                   "per_image_ms": round(seconds * 1e3 / batch, 3)}
            for name, seconds in stages.items()}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", default="EVAL_BATCH_r05.json")
    parser.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    args = parser.parse_args()

    config = models.PDSConfig(
        maximum_disparity=profile_stages.MAXIMUM_DISPARITY)
    params = models.init(jax.random.PRNGKey(0), config)

    results = {}
    for batch in args.batches:
        results[str(batch)] = measure_batch(config, params, batch)
        print(f"batch {batch}:", json.dumps(results[str(batch)], indent=2),
              flush=True)

    baseline = results[str(args.batches[0])]
    regressions = {}
    for batch in args.batches[1:]:
        rows = results[str(batch)]
        regressions[str(batch)] = {
            name: round(rows[name]["per_image_ms"]
                        / baseline[name]["per_image_ms"], 3)
            for name in rows}

    artifact = {
        "what": ("per-stage eval times at batch 1/2/4, per-image "
                 "normalized; per_image_ratio_vs_batch1 > 1 marks the "
                 "stage(s) carrying the batched-throughput regression"),
        "device": jax.devices()[0].device_kind,
        "config": {"shape": [profile_stages.HEIGHT, profile_stages.WIDTH],
                   "maximum_disparity": profile_stages.MAXIMUM_DISPARITY,
                   "compute_dtype": "bfloat16"},
        "stages_by_batch": results,
        "per_image_ratio_vs_batch1": regressions,
    }
    with open(args.output, "w") as handle:
        json.dump(artifact, handle, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
