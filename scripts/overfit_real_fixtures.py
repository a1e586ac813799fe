#!/usr/bin/env python
"""Real-data training convergence through the ACTUAL CLIs (VERDICT r3 #5b).

Full-dataset FlyingThings3D training is impossible in this environment (the
dataset is not available); what IS possible — and what this script commits
as an artifact — is the same end-to-end path on the reference's 4 bundled
REAL Blender-rendered stereo pairs (`/root/reference/test/data/`):

1. restructure a private copy of the fixture tree so all 4 real pairs
   appear under TRAIN (for ``scripts/train_flyingthings3d.py``) AND under
   TEST (for ``scripts/benchmark_flyingthings3d.py`` — renamed scenes, so
   discovery treats them as distinct);
2. run the REAL training CLI (full-size 540x960 images, D=191, bfloat16,
   the reference's RMSprop lr schedule) until it overfits the 4 pairs;
3. run the REAL benchmark CLI (PSM protocol, D=191 — the published
   protocol) on the same pairs and record the resulting MAE/3PE — real
   images, end to end, on TPU.

An overfit run proves the whole loop learns: decoder -> loader -> padded
bf16 train step -> checkpoint -> benchmark eval. Near-zero MAE is only
reachable if gradients flow correctly through every stage at full
resolution.

Usage (on the TPU host):
    python scripts/overfit_real_fixtures.py --output OVERFIT_REAL_r04.json
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_FIXTURES = "/root/reference/test/data/flyingthings3d"


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", default="OVERFIT_REAL_r04.json")
    parser.add_argument("--end_epoch", type=int, default=250,
                        help="4 steps/epoch on the 4 bundled pairs")
    parser.add_argument("--learning_rate", type=float, default=1e-3,
                        help="constant (no milestones): the reference's "
                        "1e-2-halved-at-6..10 schedule decays to 3e-4 by "
                        "step 40 — tuned for 160k-step epochs, it stalls "
                        "a 1000-step overfit (measured: loss 3.55 at "
                        "step 88)")
    parser.add_argument("--maximum_disparity", type=int, default=191,
                        help="the published benchmark protocol range "
                        "(fixture GT tops out at 152 px)")
    parser.add_argument("--phase2_epochs", type=int, default=100,
                        help="decay phase: additional epochs at "
                        "--phase2_learning_rate (the 1e-3 plateau "
                        "oscillates — measured loss spikes at ~130 "
                        "epochs; a cold decay phase squeezes it)")
    parser.add_argument("--phase2_learning_rate", type=float, default=2e-4)
    parser.add_argument("--work_folder", default=None,
                        help="defaults to a temp dir")
    return parser.parse_args()


def build_dataset_tree(target: str) -> None:
    """All 4 fixture pairs under TRAIN and (scene-renamed) under TEST."""
    for subtree in ("frames_cleanpass", "disparity"):
        source_subtree = os.path.join(REFERENCE_FIXTURES, subtree)
        for split in ("TRAIN", "TEST"):
            for letter in sorted(os.listdir(
                    os.path.join(source_subtree, split))):
                letter_folder = os.path.join(source_subtree, split, letter)
                for scene in sorted(os.listdir(letter_folder)):
                    source = os.path.join(letter_folder, scene)
                    # As-is under its own split...
                    shutil.copytree(
                        source,
                        os.path.join(target, subtree, split, letter, scene))
                    # ...and under the OTHER split with a renamed scene
                    # ("9" prefix keeps ordering deterministic and avoids
                    # colliding with the other split's scene ids).
                    other = "TEST" if split == "TRAIN" else "TRAIN"
                    renamed = "9" + scene[1:]
                    shutil.copytree(
                        source,
                        os.path.join(target, subtree, other, letter,
                                     renamed))


def run_cli(script: str, arguments: list[str]) -> str:
    command = [sys.executable, os.path.join(REPO_ROOT, "scripts", script)]
    command += arguments
    print("+", " ".join(command), flush=True)
    result = subprocess.run(command, capture_output=True, text=True,
                            cwd=REPO_ROOT)
    sys.stdout.write(result.stdout)
    sys.stderr.write(result.stderr)
    if result.returncode != 0:
        raise RuntimeError(f"{script} failed ({result.returncode})")
    return result.stdout


def parse_losses(log_file: str) -> list[float]:
    losses = []
    with open(log_file) as handle:
        for line in handle:
            match = re.search(r"training loss = ([0-9.]+)", line)
            if match:
                losses.append(float(match.group(1)))
    return losses


def main():
    args = parse_arguments()
    work = args.work_folder or tempfile.mkdtemp(prefix="pds_overfit_real_")
    dataset = os.path.join(work, "dataset")
    experiment = os.path.join(work, "experiment")
    benchmark_folder = os.path.join(work, "benchmark")
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
    if args.phase2_epochs:
        run_cli("train_flyingthings3d.py", common + [
            "--checkpoint_file", phase1_checkpoint,
            "--end_epoch", str(final_epoch),
            "--learning_rate", str(args.phase2_learning_rate),
        ])
    checkpoint = os.path.join(experiment,
                              f"{final_epoch:03d}_checkpoint.npz")
    stdout = run_cli("benchmark_flyingthings3d.py", [
        "--dataset_folder", dataset,
        "--experiment_folder", benchmark_folder,
        "--checkpoint_file", checkpoint,
        "--is_psm_protocol",
        "--maximum_disparity", str(args.maximum_disparity),
        "--bfloat16",
        "--num_workers", "2",
    ])
    match = re.search(
        r"MAE = ([0-9.]+) \[pix\], 3PE = ([0-9.]+) \[%\], "
        r"time-per-image = ([0-9.]+)", stdout)
    if match is None:
        raise RuntimeError(f"benchmark output not parseable: {stdout!r}")

    import jax
    losses = parse_losses(os.path.join(experiment, "log.txt"))
    artifact = {
        "what": ("the real train + benchmark CLIs overfitting the "
                 "reference's 4 bundled REAL 540x960 stereo pairs "
                 "end-to-end (train_flyingthings3d.py then "
                 "benchmark_flyingthings3d.py, PSM protocol)"),
        "device": jax.devices()[0].device_kind,
        "maximum_disparity": args.maximum_disparity,
        "epochs": final_epoch,
        "steps": 4 * final_epoch,
        "learning_rate": args.learning_rate,
        "phase2": {"epochs": args.phase2_epochs,
                   "learning_rate": args.phase2_learning_rate},
        "training_loss_first": losses[0] if losses else None,
        "training_loss_last": losses[-1] if losses else None,
        "training_losses_every_10_epochs": losses[::10],
        "benchmark_mae_px": float(match.group(1)),
        "benchmark_3pe_percent": float(match.group(2)),
        "benchmark_time_per_image_s": float(match.group(3)),
        "note": ("MAE here is memorization of 4 pairs, not generalization "
                 "— the full dataset is unavailable; the artifact proves "
                 "the end-to-end CLI loop (real decode -> full-size bf16 "
                 "train -> checkpoint -> published-protocol eval) learns "
                 "on real images. benchmark_time_per_image_s is "
                 "per-dispatch host wall-clock through the TPU relay "
                 "(~25 ms/dispatch, non-pipelining) — bench.py's "
                 "device-loop slope is the timing authority"),
    }
    with open(args.output, "w") as handle:
        json.dump(artifact, handle, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
