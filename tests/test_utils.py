"""Tests for profiling utilities and the distributed runtime wrapper."""

import os

import jax
import jax.numpy as jnp

from practicaldeepstereo_nips2018_tpu.parallel import (
    initialize_distributed, topology)
from practicaldeepstereo_nips2018_tpu.utils import profiling


def test_step_timer():
    x = jnp.ones((256, 256))

    @jax.jit
    def step():
        return jnp.dot(x, x)

    result = profiling.StepTimer(step, short=1, long=3).measure(repeats=2)
    assert result["seconds_per_step"] < 1.0
    assert result["steps_per_second"] > 0


def test_trace_produces_files(tmp_path):
    log_dir = str(tmp_path / "trace")
    with profiling.trace(log_dir):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    found = []
    for root, _, files in os.walk(log_dir):
        found.extend(files)
    assert found, "no trace files written"


def test_device_memory_stats():
    stats = profiling.device_memory_stats()
    assert len(stats) == len(jax.devices())
    assert all("device" in entry for entry in stats)


def test_topology_single_process():
    info = initialize_distributed()
    assert info["process_count"] == 1
    assert info["local_device_count"] == 8  # virtual CPU platform
    assert topology()["process_index"] == 0
