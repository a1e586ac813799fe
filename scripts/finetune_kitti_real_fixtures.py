#!/usr/bin/env python
"""Real-data KITTI fine-tune through the ACTUAL CLI (BASELINE config #3).

The reference only *describes* the KITTI fine-tuning recipe (paper §4);
``scripts/finetune_kitti.py`` implements it. This driver proves that CLI
end-to-end on the reference's bundled REAL KITTI 2012 pairs (reflective-
GT merge, true sparse uint8 ground truth with 0=unknown -> inf masking),
on TPU:

* load FlyingThings3D-trained weights network-only (the matching weights
  are disparity-count-agnostic, so a D=191-trained checkpoint fine-tunes
  at the recipe's D=255);
* train on 3 real pairs, validate on the seed(0) held-out 4th — a
  genuine held-out-image signal exercising the reflective-GT merge,
  sparse-GT inf masking and the 384x1280 top/left PadToSize path on real
  data for the first time. (The fixture nests its KITTI-2015 portion
  under ``data_scene_flow/testing/{training,testing}`` — outside the
  layout both stacks glob — so the private copy lifts it to the standard
  ``data_scene_flow/{training,testing}`` before discovery.);
* record the per-epoch validation MAE/3PE trend.

Usage (on the TPU host):
    python scripts/finetune_kitti_real_fixtures.py \
        --pretrained_checkpoint /tmp/pds_overfit_real/experiment/350_checkpoint.npz \
        --output KITTI_REAL_r04.json
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
REFERENCE_FIXTURES = "/root/reference/test/data/kitti"


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", default="KITTI_REAL_r04.json")
    parser.add_argument("--pretrained_checkpoint", default=None,
                        help="FlyingThings3D checkpoint to start from "
                        "(network-only); omit for random init")
    parser.add_argument("--end_epoch", type=int, default=80,
                        help="3 steps/epoch on the 3 training pairs")
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--work_folder", default=None)
    return parser.parse_args()


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


def parse_validation_trend(log_file: str) -> list[dict]:
    trend = []
    pattern = re.compile(r"MAE = ([0-9.]+) \[pix\], 3PE = ([0-9.]+) \[%\]")
    with open(log_file) as handle:
        for line in handle:
            match = pattern.search(line)
            if match:
                trend.append({"mae_px": float(match.group(1)),
                              "three_pe_percent": float(match.group(2))})
    return trend


def main():
    args = parse_arguments()
    work = args.work_folder or tempfile.mkdtemp(prefix="pds_kitti_real_")
    dataset = os.path.join(work, "kitti")
    experiment = os.path.join(work, "experiment")
    if not os.path.isdir(dataset):
        shutil.copytree(REFERENCE_FIXTURES, dataset)
        # Lift the fixture's nested 2015 layout to the standard one.
        scene_flow = os.path.join(dataset, "data_scene_flow")
        nested = os.path.join(scene_flow, "testing")
        if (os.path.isdir(os.path.join(nested, "training"))
                and not os.path.isdir(os.path.join(scene_flow,
                                                   "training"))):
            staged = os.path.join(dataset, "_scene_flow_nested")
            os.rename(nested, staged)
            os.rename(os.path.join(staged, "training"),
                      os.path.join(scene_flow, "training"))
            os.rename(os.path.join(staged, "testing"),
                      os.path.join(scene_flow, "testing"))
            os.rmdir(staged)

    arguments = [
        "--dataset_folder", dataset,
        "--experiment_folder", experiment,
        "--maximum_disparity", "255",
        "--number_of_validation_examples", "1",
        "--end_epoch", str(args.end_epoch),
        "--learning_rate", str(args.learning_rate),
        "--bfloat16",
        "--num_workers", "2",
    ]
    if args.pretrained_checkpoint:
        arguments += ["--checkpoint_file",
                      os.path.abspath(args.pretrained_checkpoint)]
    final_checkpoint = os.path.join(experiment,
                                    f"{args.end_epoch:03d}_checkpoint.npz")
    if not os.path.isfile(final_checkpoint):
        run_cli("finetune_kitti.py", arguments)

    import jax
    trend = parse_validation_trend(os.path.join(experiment, "log.txt"))
    artifact = {
        "what": ("the real finetune_kitti.py CLI on the reference's 4 "
                 "bundled REAL KITTI pairs (2x 2012 with reflective-GT "
                 "merge + 2x 2015, sparse uint GT, 0->inf masking), "
                 "384x1280 pad, D=255, bf16; trained on 3 real pairs, "
                 "validated on the seed(0) held-out 4th"),
        "device": jax.devices()[0].device_kind,
        "pretrained_from": args.pretrained_checkpoint,
        "epochs": args.end_epoch,
        "steps": 3 * args.end_epoch,
        "learning_rate": args.learning_rate,
        "validation_first": trend[0] if trend else None,
        "validation_best_mae": (min(trend, key=lambda e: e["mae_px"])
                                if trend else None),
        "validation_last": trend[-1] if trend else None,
        "validation_every_10_epochs": trend[::10],
        "note": ("validation is ONE real held-out image after training "
                 "on THREE others — a transfer signal bounded by the "
                 "tiny train set, proving the 2012+2015 decode merge, "
                 "sparse-GT masking, pad path and fine-tune recipe "
                 "end-to-end on TPU; the full-dataset recipe needs the "
                 "real 394-pair KITTI set"),
    }
    with open(args.output, "w") as handle:
        json.dump(artifact, handle, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
