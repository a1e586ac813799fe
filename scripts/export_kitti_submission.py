#!/usr/bin/env python
"""Exports KITTI benchmark submissions (uint16 disparity PNGs).

Completes the KITTI workflow (pretrain -> ``finetune_kitti.py`` ->
SUBMIT): runs inference over a ground-truth-less KITTI benchmark set and
writes the website-format submission files — disparity * 256 as uint16
PNG, named after each example's own source file (``000000_10.png`` ...),
exactly the export the reference wires into its trainer's test loop
(reference ``pds_trainer.py`` submission branch) but never exposes as a
command.

Multi-host: the loader is host-sharded and every host writes only its own
shard's files (disjoint source-derived names), so a pod exports the set
N-fold faster with no write races.

Example:
    python scripts/export_kitti_submission.py \
        --dataset_folder datasets/kitti \
        --experiment_folder experiments/kitti_submission \
        --checkpoint_file experiments/kitti/500_checkpoint.npz \
        --benchmark 2015
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# Persistent compilation cache: full-size programs cost minutes to
# compile through a TPU relay; re-runs must be free.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pds_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from practicaldeepstereo_nips2018_tpu import models
from practicaldeepstereo_nips2018_tpu.data import Kitti, Loader
from practicaldeepstereo_nips2018_tpu.training import PDSTrainer


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_folder", default="datasets/kitti")
    parser.add_argument("--experiment_folder",
                        default="experiments/kitti_submission")
    parser.add_argument("--checkpoint_file", required=True)
    parser.add_argument("--benchmark", default="2015",
                        choices=["2012", "2015"])
    parser.add_argument("--maximum_disparity", type=int, default=255)
    parser.add_argument("--bfloat16", action="store_true")
    parser.add_argument("--num_workers", type=int, default=3)
    return parser.parse_args()


def build_benchmark_loader(dataset_folder: str, benchmark: str,
                           num_workers: int) -> Loader:
    """Batch-1 loader WITHOUT size bucketing: KITTI submissions must be at
    each example's ORIGINAL resolution (the network pads internally per
    the 64-rule and crops back), so every distinct image size gets its own
    jit specialization — real KITTI has only a handful, and the trainer's
    per-shape warm-up keeps the timing numbers honest."""
    factory = (Kitti.kitti2015_benchmark if benchmark == "2015"
               else Kitti.kitti2012_benchmark)
    benchmark_set = factory(dataset_folder)
    return Loader(benchmark_set, batch_size=1, num_workers=num_workers,
                  host_index=jax.process_index(),
                  host_count=jax.process_count())


def main():
    args = parse_arguments()
    os.makedirs(args.experiment_folder, exist_ok=True)

    config = models.PDSConfig(maximum_disparity=args.maximum_disparity)
    trainer = PDSTrainer(
        network_config=config,
        params=models.init(jax.random.PRNGKey(0), config),
        test_set_loader=build_benchmark_loader(
            args.dataset_folder, args.benchmark, args.num_workers),
        experiment_folder=os.path.abspath(args.experiment_folder),
        compute_dtype=jnp.bfloat16 if args.bfloat16 else None)
    trainer.load_checkpoint(os.path.abspath(args.checkpoint_file),
                            load_only_network=True)
    _, processing_time = trainer.test()
    submission_folder = os.path.join(args.experiment_folder, "submission")
    count = len(os.listdir(submission_folder))
    print(f"exported {count} submission PNGs to {submission_folder} "
          f"({processing_time:.3f} s/image)")


if __name__ == "__main__":
    main()
