"""Two-process distributed runtime test (real multi-host semantics on CPU).

The reference has NO distributed code (SURVEY.md §2.5); these contracts are
new in the TPU framework and cannot be exercised in-process: two actual OS
processes join one JAX distributed runtime and the test asserts

* ``initialize_distributed`` reports the 2-process topology on both,
* the host-sharded ``Loader`` partitions the example stream disjointly,
* ``PDSTrainer.test()`` returns IDENTICAL global metrics on every host
  (per-host sums reduced over the runtime, not per-host means),
* log.txt and the checkpoint are written once (single-writer discipline).
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
    logs = [worker.communicate(timeout=600)[0].decode() for worker in workers]
    for worker, log in zip(workers, logs):
        assert worker.returncode == 0, log[-4000:]

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
