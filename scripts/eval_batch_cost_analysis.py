#!/usr/bin/env python
"""Static XLA evidence for the batched-eval regression (VERDICT r4 weak #2).

``EVAL_BATCH_r05.json`` localizes the regression to the embedding and
upsampler stages (per-image time 1.8-2.0x at batch 2). This script asks
WHY, without timing anything: it compiles each stage at batch 1/2/4 and
reports XLA's own cost analysis (flops, bytes accessed) and memory
analysis (temp allocation) PER IMAGE. Three possible verdicts:

* bytes/image grows with batch -> the compiled program itself is worse
  (layout padding, recompute, lost fusion) — actionable;
* bytes/image is flat but measured time/image grows -> the extra time is a
  hardware effect of the larger working set (HBM locality/cache) — not a
  compiler artifact, document as the physical ceiling;
* flops/image grows -> padding to tile boundaries on the batch dim.

Writes EVAL_BATCH_COST_r05.json.
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

from practicaldeepstereo_nips2018_tpu import models  # noqa: E402
from practicaldeepstereo_nips2018_tpu.models import (  # noqa: E402
    embedding, matching, regularization)
from practicaldeepstereo_nips2018_tpu.ops import pad as pad_ops  # noqa: E402

HEIGHT, WIDTH = 540, 960
MAXIMUM_DISPARITY = 191
DTYPE = jnp.bfloat16


def analyze(fn, *args) -> dict:
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per computation
        cost = cost[0]
    memory = compiled.memory_analysis()
    return {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
        "temp_bytes": getattr(memory, "temp_size_in_bytes", None),
        "output_bytes": getattr(memory, "output_size_in_bytes", None),
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", default="EVAL_BATCH_COST_r05.json")
    parser.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    args = parser.parse_args()

    config = models.PDSConfig(maximum_disparity=MAXIMUM_DISPARITY)
    params = models.init(jax.random.PRNGKey(0), config)
    cast = lambda tree: jax.tree.map(  # noqa: E731
        lambda p: p.astype(DTYPE), tree)
    emb_params = cast(params["embedding"])
    match_params = cast(params["matching"])
    reg_params = cast(params["regularization"])
    depth = config.matching_maximum_disparity + 1

    results = {}
    for batch in args.batches:
        left = jnp.zeros((batch, HEIGHT, WIDTH, 3), jnp.float32)
        left_p = pad_ops.pad_to_multiple(left, 64).astype(DTYPE)
        height_p, width_p = left_p.shape[1], left_p.shape[2]

        desc_shape = jax.eval_shape(
            lambda x: embedding.apply(emb_params, x), left_p)
        desc = jnp.zeros(desc_shape[0].shape, DTYPE)
        shortcut = jnp.zeros(desc_shape[1].shape, DTYPE)
        folded_shape = jax.eval_shape(
            lambda l, r: matching.apply_folded(
                match_params, l, r, config.matching_maximum_disparity),
            desc, desc)
        folded = jnp.zeros(folded_shape.shape, DTYPE)
        core_shape = jax.eval_shape(
            lambda v: regularization.hourglass_core(reg_params, v, depth,
                                                    shortcut)[0], folded)
        core = jnp.zeros(core_shape.shape, DTYPE)

        rows = {
            "embedding": analyze(
                lambda x: embedding.apply(emb_params, x), left_p),
            "hourglass_core": analyze(
                lambda v: regularization.hourglass_core(
                    reg_params, v, depth, shortcut)[0], folded),
            "upsamplers": analyze(
                lambda v: regularization.final_upsampling(reg_params, v,
                                                          depth), core),
            "full_infer": analyze(
                lambda l, r: models.infer(params, l, r, config,
                                          compute_dtype=DTYPE), left, left),
        }
        for name, row in rows.items():
            row["per_image"] = {
                key: (value / batch if value else value)
                for key, value in row.items()}
        results[str(batch)] = rows
        print(f"batch {batch}:", json.dumps(rows, indent=1), flush=True)

    baseline = results[str(args.batches[0])]
    ratios = {}
    for batch in args.batches[1:]:
        ratios[str(batch)] = {
            name: {key: round(results[str(batch)][name]["per_image"][key]
                              / baseline[name]["per_image"][key], 3)
                   for key in ("flops", "bytes_accessed", "temp_bytes")
                   if baseline[name]["per_image"].get(key)}
            for name in baseline}

    artifact = {
        "what": ("XLA static cost/memory analysis of eval stages at batch "
                 "1/2/4, per-image; growth here means the COMPILED PROGRAM "
                 "degrades with batch (vs a pure working-set effect)"),
        "device": jax.devices()[0].device_kind,
        "config": {"shape": [HEIGHT, WIDTH],
                   "maximum_disparity": MAXIMUM_DISPARITY,
                   "compute_dtype": "bfloat16"},
        "stages_by_batch": results,
        "per_image_ratio_vs_batch1": ratios,
    }
    with open(args.output, "w") as handle:
        json.dump(artifact, handle, indent=2)
    print(json.dumps(artifact["per_image_ratio_vs_batch1"], indent=2))


if __name__ == "__main__":
    main()
