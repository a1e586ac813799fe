#!/usr/bin/env python
"""A/B of the remat policies on the full-resolution training step (TPU).

Measures ``bench.train_step_seconds`` (device-loop slope, 5-sample median)
for remat in {False, "selective", True} at batch 1/2/4 — the reference's
entire cost is its 160k-iteration full-size training run
(``/root/reference/train_on_flyingthings3d.py:11-14``), gated by this step.

Writes TRAIN_REMAT_r05.json at the repo root; the winner becomes
``bench.TRAIN_REMAT`` and the training CLIs' ``--remat`` default guidance.

A policy that does not fit HBM at a batch size reports null for that cell
(the OOM is the measurement — it documents why the heavier remat policy
exists).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (configures the persistent compilation cache)
from practicaldeepstereo_nips2018_tpu.utils import flops  # noqa: E402


def main():
    results = {}
    padded_height = -(-bench.HEIGHT // 64) * 64
    padded_width = -(-bench.WIDTH // 64) * 64
    for remat in (False, "selective", True):
        label = {False: "none", "selective": "selective", True: "all"}[remat]
        accounting = flops.training_macs(
            padded_height, padded_width, bench.TRAIN_MAXIMUM_DISPARITY,
            folded_impl=bench.FOLDED_IMPL, remat=remat)
        cells = {}
        for batch in (1, 2, 4):
            seconds = bench.train_step_seconds(batch, remat=remat)
            print(f"remat={label} batch={batch}: {seconds}", flush=True)
            cells[str(batch)] = (None if seconds is None else {
                "step_seconds": round(seconds, 5),
                "images_per_second": round(batch / seconds, 3),
            })
        results[label] = {
            "batches": cells,
            "executed_gmacs_per_image": accounting["executed_gmacs"],
            "recompute_overhead_pct": accounting["recompute_overhead_pct"],
        }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TRAIN_REMAT_r05.json"), "w") as f:
        json.dump({
            "config": {
                "shape": [bench.HEIGHT, bench.WIDTH],
                "maximum_disparity": bench.TRAIN_MAXIMUM_DISPARITY,
                "compute_dtype": "bfloat16",
                "folded_conv_impl": bench.FOLDED_IMPL,
            },
            "policies": results,
        }, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
