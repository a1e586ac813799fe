"""End-to-end CLI smoke tests (SURVEY §1: the CLI layer is a tested
surface — the reference's scripts are exercised by its test suite only
indirectly; here the actual entry points run on the synthetic fixture
dataset).

Each CLI runs in a SUBPROCESS that pins the CPU platform before the script
imports anything (the ambient environment boots a TPU plugin via
sitecustomize and re-pins ``jax_platforms`` with ``jax.config.update``,
which overrides the env var — production scripts correctly inherit the
real TPU, tests must not)."""

import os
import subprocess
import sys

import pytest

from tests import fixtures

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(script: str, arguments: list[str]) -> str:
    driver = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys;"
        f"sys.argv = [{script!r}] + {arguments!r};"
        f"runpy.run_path({os.path.join(REPO_ROOT, script)!r},"
        "run_name='__main__')"
    )
    result = subprocess.run(
        [sys.executable, "-c", driver], capture_output=True, text=True,
        timeout=900, cwd=REPO_ROOT)
    assert result.returncode == 0, (result.stdout, result.stderr)
    return result.stdout


@pytest.mark.slow
def test_train_and_benchmark_cli_end_to_end(tmp_path):
    dataset = fixtures.make_flyingthings3d_tree(str(tmp_path / "dataset"))
    experiment = str(tmp_path / "experiment")

    _run_cli("scripts/train_flyingthings3d.py", [
        "--dataset_folder", dataset,
        "--experiment_folder", experiment,
        "--maximum_disparity", "63",
        "--number_of_validation_examples", "0",
        "--end_epoch", "1",
        "--learning_rate", "1e-3",
        "--num_workers", "1",
    ])
    assert os.path.exists(os.path.join(experiment, "001_checkpoint.npz"))
    assert os.path.exists(os.path.join(experiment, "log.txt"))

    stdout = _run_cli("scripts/benchmark_flyingthings3d.py", [
        "--dataset_folder", dataset,
        "--experiment_folder", str(tmp_path / "bench"),
        "--checkpoint_file", os.path.join(experiment, "001_checkpoint.npz"),
        "--is_psm_protocol",
        "--maximum_disparity", "63",
        "--num_workers", "1",
    ])
    assert "MAE" in stdout and "3PE" in stdout, stdout


@pytest.mark.slow
def test_import_torch_checkpoint_cli(tmp_path):
    """The published-checkpoint import path as users run it: a torch
    checkpoint in the reference trainer's on-disk format
    (``trainer.py:110-122``) -> CLI -> npz loadable with
    load_only_network."""
    import sys as sys_module

    import torch

    if "/root/reference" not in sys_module.path:
        sys_module.path.insert(0, "/root/reference")
    from practical_deep_stereo import network as reference_network

    reference = reference_network.PdsNetwork.default(63)
    torch_file = str(tmp_path / "010_checkpoint.bin")
    torch.save({"network": reference.state_dict(), "training_losses": [],
                "test_errors": []}, torch_file)

    output = str(tmp_path / "imported" / "000_checkpoint.npz")
    _run_cli("scripts/import_torch_checkpoint.py", [
        "--torch_checkpoint", torch_file, "--output", output])
    assert os.path.exists(output)

    from practicaldeepstereo_nips2018_tpu import models
    from practicaldeepstereo_nips2018_tpu.training import PDSTrainer

    config = models.PDSConfig(maximum_disparity=63)
    trainer = PDSTrainer(
        network_config=config,
        params=models.init(__import__("jax").random.PRNGKey(0), config),
        experiment_folder=str(tmp_path))
    trainer.load_checkpoint(output, load_only_network=True)


@pytest.mark.slow
def test_finetune_kitti_cli_end_to_end(tmp_path):
    dataset = fixtures.make_kitti_tree(str(tmp_path / "kitti"))
    experiment = str(tmp_path / "experiment")

    _run_cli("scripts/finetune_kitti.py", [
        "--dataset_folder", dataset,
        "--experiment_folder", experiment,
        "--maximum_disparity", "63",
        "--number_of_validation_examples", "1",
        "--end_epoch", "1",
        "--pad_height", "40",
        "--pad_width", "56",
        "--num_workers", "1",
    ])
    assert os.path.exists(os.path.join(experiment, "001_checkpoint.npz"))
    assert os.path.exists(os.path.join(experiment, "log.txt"))


@pytest.mark.slow
def test_precompute_disparity_statistics_cli(tmp_path):
    dataset = fixtures.make_flyingthings3d_tree(str(tmp_path / "dataset"))
    stdout = _run_cli("scripts/precompute_disparity_statistics.py", [
        "--dataset_folder", dataset,
    ])
    assert "scanned" in stdout, stdout
    import glob
    caches = glob.glob(os.path.join(dataset, "disparity", "**", "*.npz"),
                       recursive=True)
    assert caches, "no statistics caches written"
    # Second run is pure cache reads and must see the same examples.
    stdout_again = _run_cli("scripts/precompute_disparity_statistics.py", [
        "--dataset_folder", dataset,
    ])
    assert stdout.split()[1] == stdout_again.split()[1]


@pytest.mark.slow
def test_export_kitti_submission_cli(tmp_path):
    """The submission-export CLI end-to-end: train-free (random init is
    fine — the export contract is files, names, format), real KITTI
    website format: uint16 disparity*256 PNGs named after the source."""
    import numpy as np

    dataset = fixtures.make_kitti_tree(str(tmp_path / "kitti"))
    experiment = str(tmp_path / "experiment")

    from practicaldeepstereo_nips2018_tpu import models
    from practicaldeepstereo_nips2018_tpu.training import checkpoint
    config = models.PDSConfig(maximum_disparity=63)
    params = models.init(__import__("jax").random.PRNGKey(0), config)
    checkpoint_file = str(tmp_path / "001_checkpoint.npz")
    checkpoint.save_checkpoint(checkpoint_file, {"params": params}, {})

    stdout = _run_cli("scripts/export_kitti_submission.py", [
        "--dataset_folder", dataset,
        "--experiment_folder", experiment,
        "--checkpoint_file", checkpoint_file,
        "--benchmark", "2015",
        "--maximum_disparity", "63",
        "--num_workers", "1",
    ])
    assert "exported" in stdout, stdout
    import cv2
    submission = os.path.join(experiment, "submission", "000000_10.png")
    assert os.path.isfile(submission)
    decoded = cv2.imread(submission, cv2.IMREAD_UNCHANGED)
    assert decoded.dtype == np.uint16
    assert decoded.shape == (fixtures.HEIGHT, fixtures.WIDTH)
