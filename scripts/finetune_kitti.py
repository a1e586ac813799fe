#!/usr/bin/env python
"""Fine-tunes a FlyingThings3D-pretrained PDS network on KITTI 2012+2015.

The reference repo supports KITTI via its dataset module but ships no
fine-tuning script; this provides the standard recipe (BASELINE config #3):
load pretrained weights network-only, train on the combined KITTI training
split (sparse ground truth — unknown pixels are inf and the loss masks them),
evaluate on the 58-example validation split. Images are top/left padded to a
uniform 384x1280 so batches have static shapes.

Example:
    python scripts/finetune_kitti.py \
        --dataset_folder datasets/kitti \
        --experiment_folder experiments/kitti \
        --checkpoint_file experiments/flyingthings3d/010_checkpoint.npz
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
from practicaldeepstereo_nips2018_tpu.data import Kitti, Loader, transforms
from practicaldeepstereo_nips2018_tpu.parallel import make_mesh
from practicaldeepstereo_nips2018_tpu.training import PDSTrainer


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset_folder", default="datasets/kitti")
    parser.add_argument("--experiment_folder", default="experiments/kitti")
    parser.add_argument("--checkpoint_file", default=None,
                        help="pretrained checkpoint (loaded network-only)")
    parser.add_argument("--resume_checkpoint_file", default=None,
                        help="fine-tuning checkpoint to resume from")
    parser.add_argument("--maximum_disparity", type=int, default=255,
                        help="KITTI ground truth reaches 231 px")
    parser.add_argument("--end_epoch", type=int, default=500)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--number_of_validation_examples", type=int,
                        default=58,
                        help="held-out examples (reference: seed(0), 58)")
    parser.add_argument("--pad_height", type=int, default=384)
    parser.add_argument("--pad_width", type=int, default=1280)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--mesh_data", type=int, default=None)
    parser.add_argument("--mesh_volume", type=int, default=1)
    parser.add_argument("--bfloat16", action="store_true")
    parser.add_argument("--num_workers", type=int, default=3)
    parser.add_argument("--folded_conv_impl", default="banded_slab",
                        choices=["dense", "banded_slab"],
                        help="hourglass conv execution (exact alternatives; "
                        "banded_slab measured fastest on TPU v5e; the "
                        "forward-only banded_pallas form is inference-only "
                        "and lives in benchmark_flyingthings3d.py)")
    parser.add_argument("--remat", default="none",
                        choices=["none", "selective", "all"],
                        help="activation rematerialization policy (see "
                        "train_flyingthings3d.py --remat)")
    return parser.parse_args()


def build_loaders(training_set, validation_set, batch_size: int,
                  num_workers: int):
    """Multi-host loader wiring; see train_flyingthings3d.build_loaders —
    training in equal_shards lockstep (collective-deadlock safety),
    validation host-sharded (disjoint shards, globally reduced metrics)."""
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

    training_set, validation_set = Kitti.training_split(
        args.dataset_folder,
        number_of_validation_examples=(
            args.number_of_validation_examples))
    pad = [transforms.PadToSize(args.pad_height, args.pad_width)]
    training_set.append_transformers(pad)
    validation_set.append_transformers(pad)

    config = models.PDSConfig(
        maximum_disparity=args.maximum_disparity,
        folded_conv_impl=args.folded_conv_impl,
        remat={"none": False, "selective": "selective",
               "all": True}[args.remat])
    params = models.init(jax.random.PRNGKey(0), config)

    mesh = None
    if args.mesh_data or args.mesh_volume > 1:
        mesh = make_mesh(data=args.mesh_data, volume=args.mesh_volume)

    training_loader, validation_loader = build_loaders(
        training_set, validation_set, args.batch_size, args.num_workers)
    trainer = PDSTrainer(
        network_config=config,
        params=params,
        training_set_loader=training_loader,
        test_set_loader=validation_loader,
        experiment_folder=os.path.abspath(args.experiment_folder),
        initial_learning_rate=args.learning_rate,
        learning_rate_milestones=(args.end_epoch // 2,),
        end_epoch=args.end_epoch,
        compute_dtype=jnp.bfloat16 if args.bfloat16 else None,
        mesh=mesh)
    if args.checkpoint_file:
        trainer.load_checkpoint(os.path.abspath(args.checkpoint_file),
                                load_only_network=True)
    if args.resume_checkpoint_file:
        trainer.load_checkpoint(
            os.path.abspath(args.resume_checkpoint_file))
    trainer.train()


if __name__ == "__main__":
    main()
