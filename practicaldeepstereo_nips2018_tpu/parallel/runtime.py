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
    """Joins the JAX distributed runtime (no-op on single-process setups).

    On TPU pods the arguments are discovered from the environment; on other
    platforms pass them explicitly. Returns the topology summary.
    """
    global _initialized
    if not _initialized and (coordinator_address is not None
                             or jax.process_count() == 1):
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
            _initialized = True
    return topology()


def topology() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
