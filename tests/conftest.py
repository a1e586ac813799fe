"""Test configuration: run everything on a virtual 8-device CPU platform.

The ambient environment boots an ``axon`` TPU PJRT plugin from
``sitecustomize`` and pins ``jax_platforms="axon,cpu"`` via
``jax.config.update`` — which overrides any ``JAX_PLATFORMS`` env var. Tests
must run on CPU (the single tunneled TPU chip would serialize every test
through remote compilation, and multi-device sharding tests need 8 local
devices), so this conftest re-updates the config before any backend is
initialized and forces 8 virtual CPU devices via XLA_FLAGS.
"""

import os

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " +
                               _FLAG).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
