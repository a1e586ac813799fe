#!/usr/bin/env python
"""Trains PDS from scratch on FlyingThings3D.

TPU-native counterpart of the reference's ``train_on_flyingthings3d.py``:
same protocol — maximum disparity 255, full-size 960x540 images, no
augmentation, RMSprop lr 1e-2 halved per-epoch at epochs 6..10, 10 epochs,
500 examples held out for validation, artifact/disparity-range filters — with
the additions the reference never had: device-mesh data parallelism
(``--batch_size``/``--mesh_data``), cost-volume W-sharding
(``--mesh_volume``), bfloat16 compute, and per-host input sharding.

Example:
    python scripts/train_flyingthings3d.py \
        --dataset_folder datasets/flyingthings3d \
        --experiment_folder experiments/flyingthings3d \
        [--checkpoint_file experiments/flyingthings3d/001_checkpoint.npz]
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
from practicaldeepstereo_nips2018_tpu.data import transforms
from practicaldeepstereo_nips2018_tpu.parallel import make_mesh
from practicaldeepstereo_nips2018_tpu.training import PDSTrainer


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_folder",
                        default="datasets/flyingthings3d")
    parser.add_argument("--experiment_folder",
                        default="experiments/flyingthings3d")
    parser.add_argument("--checkpoint_file", default=None,
                        help="checkpoint to resume training from")
    parser.add_argument("--maximum_disparity", type=int, default=255)
    parser.add_argument("--number_of_validation_examples", type=int,
                        default=500)
    parser.add_argument("--end_epoch", type=int, default=10)
    parser.add_argument("--learning_rate", type=float, default=1e-2)
    parser.add_argument("--learning_rate_milestones", type=int, nargs="*",
                        default=None,
                        help="epochs at which the rate halves (default: "
                        "the reference's 6 7 8 9 10; pass with no values "
                        "for a constant rate)")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="per-host batch size (data parallelism)")
    parser.add_argument("--crop_height", type=int, default=None,
                        help="random-crop height for uniform batches")
    parser.add_argument("--crop_width", type=int, default=None)
    parser.add_argument("--mesh_data", type=int, default=None,
                        help="data-parallel mesh axis size")
    parser.add_argument("--mesh_volume", type=int, default=1,
                        help="cost-volume sharding mesh axis size")
    parser.add_argument("--bfloat16", action="store_true",
                        help="bfloat16 compute (params stay float32)")
    parser.add_argument("--num_workers", type=int, default=3)
    parser.add_argument("--small_split", action="store_true",
                        help="use the 3000/300-example tuning split")
    parser.add_argument("--folded_conv_impl", default="banded_slab",
                        choices=["dense", "banded_slab"],
                        help="hourglass conv execution (exact alternatives; "
                        "banded_slab measured fastest on TPU v5e; the "
                        "forward-only banded_pallas form is inference-only "
                        "and lives in benchmark_flyingthings3d.py)")
    parser.add_argument("--remat", default="none",
                        choices=["none", "selective", "all"],
                        help="activation rematerialization policy "
                        "(numerics-identical): none = store everything "
                        "(fastest when it fits — full-size batch-1 D=255 "
                        "fits a 16 GB v5e), selective = recompute only the "
                        "volume-sized stages (for larger batches/volumes), "
                        "all = blanket (maximum headroom)")
    return parser.parse_args()


REMAT_POLICIES = {"none": False, "selective": "selective", "all": True}


def build_loaders(training_set, validation_set, batch_size: int,
                  num_workers: int):
    """CLI loader wiring for (possibly multi-host) training.

    * The TRAINING loader runs in ``equal_shards`` lockstep mode: cross-
      process mesh training requires every host to execute the same number
      of collective train steps — an unequal host split (e.g. 2+1 over two
      hosts) deadlocks the lagging host's collective (``data/loader.py``).
    * The VALIDATION loader is host-SHARDED too: each host evaluates its
      own disjoint shard and ``PDSTrainer._reduce_test_metrics`` makes the
      metrics global — evaluating the full set on every host would cost
      N× pod time (and race submission PNG writes on GT-less sets).
    """
    training_loader = Loader(
        training_set, batch_size=batch_size, shuffle=True,
        num_workers=num_workers, drop_last=batch_size > 1,
        host_index=jax.process_index(), host_count=jax.process_count(),
        equal_shards=True)
    validation_loader = Loader(
        validation_set, batch_size=1, num_workers=num_workers,
        host_index=jax.process_index(), host_count=jax.process_count())
    return training_loader, validation_loader


def main():
    args = parse_arguments()
    os.makedirs(args.experiment_folder, exist_ok=True)

    if args.small_split:
        training_set, validation_set = FlyingThings3D.small_training_split(
            args.dataset_folder)
        config = models.PDSConfig(
            maximum_disparity=127,
            folded_conv_impl=args.folded_conv_impl,
            remat=REMAT_POLICIES[args.remat])
    else:
        training_set, validation_set = FlyingThings3D.training_split(
            args.dataset_folder, maximum_disparity=args.maximum_disparity,
            number_of_validation_examples=(
                args.number_of_validation_examples))
        config = models.PDSConfig(
            maximum_disparity=args.maximum_disparity,
            folded_conv_impl=args.folded_conv_impl,
            remat=REMAT_POLICIES[args.remat])

    if args.crop_height and args.crop_width:
        training_set.append_transformers(
            [transforms.RandomCrop(args.crop_height, args.crop_width)])

    mesh = None
    if args.mesh_data or args.mesh_volume > 1:
        mesh = make_mesh(data=args.mesh_data, volume=args.mesh_volume)

    training_loader, validation_loader = build_loaders(
        training_set, validation_set, args.batch_size, args.num_workers)

    params = models.init(jax.random.PRNGKey(0), config)
    trainer = PDSTrainer(
        network_config=config,
        params=params,
        training_set_loader=training_loader,
        test_set_loader=validation_loader,
        experiment_folder=os.path.abspath(args.experiment_folder),
        initial_learning_rate=args.learning_rate,
        **({} if args.learning_rate_milestones is None
           else {"learning_rate_milestones":
                 tuple(args.learning_rate_milestones)}),
        end_epoch=args.end_epoch,
        compute_dtype=jnp.bfloat16 if args.bfloat16 else None,
        mesh=mesh)
    if args.checkpoint_file:
        trainer.load_checkpoint(os.path.abspath(args.checkpoint_file))
    trainer.train()


if __name__ == "__main__":
    main()
