"""Multi-host runtime initialization.

The reference has no distributed runtime (single GPU). On a TPU pod slice,
each host process must join the JAX distributed runtime before any
collective work; this wrapper makes that explicit and idempotent, and
reports the process topology used by the per-host input pipeline
(``data/loader.py``) and the single-writer checkpointing
(``training/checkpoint.py``).
"""

from __future__ import annotations

import jax

_initialized = False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> dict:
    """Joins the JAX distributed runtime; returns the topology summary.

    With explicit arguments the runtime joins the given coordinator (errors
    propagate — a misconfigured pod must fail loudly). With NO arguments,
    environment discovery is attempted: on TPU pods / managed clusters
    ``jax.distributed.initialize()`` resolves the coordinator from the
    environment; on plain single-process setups discovery has nothing to
    find and the call degrades to single-process topology. Idempotent:
    repeated calls (or calls after the backend already initialized
    single-process) return the current topology.
    """
    global _initialized
    if _initialized:
        return topology()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        _initialized = True
    except (ValueError, RuntimeError) as error:
        # Explicit-argument misconfiguration must not be silently swallowed.
        if coordinator_address is not None:
            raise
        # No-arg discovery failed. That is expected on plain single-process
        # setups — but on a machine that LOOKS like a cluster member
        # (coordinator/pod environment variables present), silently
        # degrading to single-process topology would train a diverged model
        # per host; warn loudly so the misconfiguration is visible.
        import os
        import warnings
        cluster_variables = [
            name for name in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                              "MEGASCALE_COORDINATOR_ADDRESS",
                              "TPU_WORKER_HOSTNAMES", "CLOUD_TPU_TASK_ID")
            if os.environ.get(name)]
        if cluster_variables:
            warnings.warn(
                "jax.distributed.initialize() discovery failed "
                f"({error}) although cluster environment variables "
                f"{cluster_variables} are set — running SINGLE-process; "
                "on a real pod this is a misconfiguration.",
                RuntimeWarning, stacklevel=2)
    return topology()


def topology() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def all_hosts_sum(values) -> list[float]:
    """Element-wise sum of a per-host float vector across all processes.

    Used to turn per-host metric accumulators (sum, count) into global ones
    — each host's validation loader sees a disjoint example shard, so the
    global mean is ``sum(host sums) / sum(host counts)``. Single-process:
    identity. Every process must call this the same number of times with the
    same vector length (it is a collective)."""
    import numpy as np
    values = [float(v) for v in values]
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        np.asarray(values, dtype=np.float32))
    return [float(v) for v in np.asarray(gathered).sum(axis=0)]
