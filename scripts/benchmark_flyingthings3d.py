#!/usr/bin/env python
"""Benchmarks PDS on the FlyingThings3D test set (PSM or CRL protocol).

TPU-native counterpart of the reference's ``benchmark_on_flyingthings3d.py``:
maximum disparity 191 on full-size 960x540 images; the PSM protocol keeps
every TEST example, the CRL protocol drops examples where more than 25% of
pixels exceed 300 px; both mask ground truth above 192 px. Reports MAE [px],
3PE [%] and synchronized time-per-image [sec].

Example:
    python scripts/benchmark_flyingthings3d.py \
        --dataset_folder datasets/flyingthings3d \
        --experiment_folder experiments/flyingthings3d_benchmark \
        --checkpoint_file experiments/flyingthings3d/010_checkpoint.npz \
        --is_psm_protocol
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
from practicaldeepstereo_nips2018_tpu.data import FlyingThings3D, Loader
from practicaldeepstereo_nips2018_tpu.training import PDSTrainer


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_folder",
                        default="datasets/flyingthings3d")
    parser.add_argument("--experiment_folder",
                        default="experiments/flyingthings3d_benchmarking")
    parser.add_argument("--checkpoint_file", required=True)
    parser.add_argument("--is_psm_protocol", action="store_true")
    parser.add_argument("--maximum_disparity", type=int, default=191)
    parser.add_argument("--bfloat16", action="store_true")
    parser.add_argument("--num_workers", type=int, default=3)
    parser.add_argument("--eval_batch_size", type=int, default=1,
                        help="examples per eval step; with --mesh_data N "
                        "a batch of N shards one example per data row "
                        "(per-example metrics are identical to the "
                        "sequential batch-1 protocol)")
    parser.add_argument("--mesh_data", type=int, default=None,
                        help="data-parallel mesh axis size (eval examples "
                        "shard across it)")
    parser.add_argument("--mesh_volume", type=int, default=1,
                        help="cost-volume W-sharding mesh axis size")
    parser.add_argument("--folded_conv_impl", default="banded_slab",
                        choices=["dense", "banded_slab",
                                 "banded_pallas"],
                        help="hourglass conv execution (exact alternatives; banded_slab measured fastest on TPU v5e)")
    parser.add_argument("--matching_tail_int8", action="store_true",
                        help="int8-quantized matching tail (APPROXIMATE "
                        "inference mode, ~2x MXU rate on the tail; "
                        "measure the accuracy delta before trusting "
                        "results)")
    return parser.parse_args()


def build_test_loader(test_set, eval_batch_size: int, num_workers: int):
    """Host-SHARDED eval loader: on a pod each host benchmarks its own
    disjoint shard and ``PDSTrainer._reduce_test_metrics`` reduces the
    per-example metrics globally — evaluating the full set on every host
    would cost N× pod time and race the submission PNG writes."""
    return Loader(test_set, batch_size=eval_batch_size,
                  num_workers=num_workers,
                  host_index=jax.process_index(),
                  host_count=jax.process_count())


def main():
    args = parse_arguments()
    os.makedirs(args.experiment_folder, exist_ok=True)

    test_set = FlyingThings3D.benchmark_dataset(
        args.dataset_folder, is_psm_protocol=args.is_psm_protocol)
    config = models.PDSConfig(
        maximum_disparity=args.maximum_disparity,
        folded_conv_impl=args.folded_conv_impl,
        matching_tail_int8=args.matching_tail_int8)
    params = models.init(jax.random.PRNGKey(0), config)

    mesh = None
    if args.mesh_data or args.mesh_volume > 1:
        from practicaldeepstereo_nips2018_tpu.parallel import make_mesh
        mesh = make_mesh(data=args.mesh_data, volume=args.mesh_volume)

    trainer = PDSTrainer(
        network_config=config,
        params=params,
        test_set_loader=build_test_loader(
            test_set, args.eval_batch_size, args.num_workers),
        experiment_folder=os.path.abspath(args.experiment_folder),
        compute_dtype=jnp.bfloat16 if args.bfloat16 else None,
        mesh=mesh)
    trainer.load_checkpoint(os.path.abspath(args.checkpoint_file),
                            load_only_network=True)
    errors, processing_time = trainer.test()
    print(f"MAE = {errors['mean_absolute_error']:.5f} [pix], "
          f"3PE = {errors['three_pixels_error']:.5f} [%], "
          f"time-per-image = {processing_time:.3f} [sec]")


if __name__ == "__main__":
    main()
