#!/usr/bin/env python
"""KITTI submission round-trip artifact (VERDICT r4 item #8).

Runs ``scripts/export_kitti_submission.py`` over the reference's REAL
ground-truth-less KITTI 2015 testing pairs on TPU, then decodes the
exported uint16 PNGs back and asserts the submission format is lossless to
its quantization: ``|decoded/256 - predicted| <= 1/256`` per pixel, where
``predicted`` is recomputed through the same inference path (same
checkpoint, same config, same bf16 compute). Writes
KITTI_SUBMISSION_r05.json.

The KITTI website scores submissions by decoding exactly this format
(uint16 disparity*256), so the bound proves exported files carry the
model's prediction to within the format's own resolution.

Usage (on the TPU host):
    python scripts/kitti_submission_roundtrip.py \
        --checkpoint_file <trained>.npz --output KITTI_SUBMISSION_r05.json
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_FIXTURES = "/root/reference/test/data/kitti"

sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))

from finetune_kitti_real_fixtures import run_cli  # noqa: E402


def prepare_dataset(work: str) -> str:
    """Private fixture copy with the nested 2015 layout lifted (see
    finetune_kitti_real_fixtures.py)."""
    dataset = os.path.join(work, "kitti")
    if os.path.isdir(dataset):
        return dataset
    shutil.copytree(REFERENCE_FIXTURES, dataset)
    scene_flow = os.path.join(dataset, "data_scene_flow")
    nested = os.path.join(scene_flow, "testing")
    if (os.path.isdir(os.path.join(nested, "training"))
            and not os.path.isdir(os.path.join(scene_flow, "training"))):
        staged = os.path.join(dataset, "_scene_flow_nested")
        os.rename(nested, staged)
        os.rename(os.path.join(staged, "training"),
                  os.path.join(scene_flow, "training"))
        os.rename(os.path.join(staged, "testing"),
                  os.path.join(scene_flow, "testing"))
        os.rmdir(staged)
    return dataset


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint_file", required=True)
    parser.add_argument("--output", default="KITTI_SUBMISSION_r05.json")
    parser.add_argument("--maximum_disparity", type=int, default=255)
    parser.add_argument("--work_folder", default=None)
    args = parser.parse_args()

    work = args.work_folder or tempfile.mkdtemp(prefix="pds_kitti_submit_")
    dataset = prepare_dataset(work)
    experiment = os.path.join(work, "submission_experiment")

    run_cli("export_kitti_submission.py", [
        "--dataset_folder", dataset,
        "--experiment_folder", experiment,
        "--checkpoint_file", os.path.abspath(args.checkpoint_file),
        "--benchmark", "2015",
        "--maximum_disparity", str(args.maximum_disparity),
        "--bfloat16",
        "--num_workers", "2",
    ])
    submission_folder = os.path.join(experiment, "submission")

    # Recompute the predictions through the same inference path and compare
    # with the decoded PNGs.
    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp
    from practicaldeepstereo_nips2018_tpu import models
    from practicaldeepstereo_nips2018_tpu.data import Kitti, Loader
    from practicaldeepstereo_nips2018_tpu.training import PDSTrainer

    config = models.PDSConfig(maximum_disparity=args.maximum_disparity)
    trainer = PDSTrainer(
        network_config=config,
        params=models.init(jax.random.PRNGKey(0), config),
        experiment_folder=experiment,
        compute_dtype=jnp.bfloat16)
    trainer.load_checkpoint(os.path.abspath(args.checkpoint_file),
                            load_only_network=True)

    loader = Loader(Kitti.kitti2015_benchmark(dataset), batch_size=1,
                    num_workers=1)
    tolerance = 1.0 / 256.0
    files = []
    for batch in loader:
        name = os.path.splitext(batch["names"][0])[0] + ".png"
        predicted = np.asarray(trainer._infer_step(
            trainer.params,
            jnp.asarray(batch["left"]["image"]),
            jnp.asarray(batch["right"]["image"])))[0]
        decoded = cv2.imread(os.path.join(submission_folder, name),
                             cv2.IMREAD_UNCHANGED)
        assert decoded is not None, f"missing submission PNG {name}"
        assert decoded.dtype == np.uint16, decoded.dtype
        assert decoded.shape == predicted.shape, (decoded.shape,
                                                  predicted.shape)
        # The export clips negatives to 0; apply the same clip before
        # comparing (the format cannot represent negative disparities).
        representable = np.clip(predicted, 0.0, 65535.0 / 256.0)
        max_error = float(np.abs(decoded.astype(np.float64) / 256.0
                                 - representable).max())
        assert max_error <= tolerance + 1e-9, (name, max_error)
        files.append({"name": name,
                      "shape": list(decoded.shape),
                      "max_abs_error_px": round(max_error, 6)})
    assert files, "no benchmark examples discovered"

    artifact = {
        "what": ("export_kitti_submission.py over the real GT-less KITTI "
                 "2015 testing pairs on TPU; decoded uint16 PNGs match the "
                 "recomputed predictions to the format's quantization"),
        "device": jax.devices()[0].device_kind,
        "checkpoint": os.path.abspath(args.checkpoint_file),
        "tolerance_px": tolerance,
        "files": files,
        "pass": True,
    }
    with open(args.output, "w") as handle:
        json.dump(artifact, handle, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
