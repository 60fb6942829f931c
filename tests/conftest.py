"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by running JAX on the
host platform with 8 virtual devices (the TPU answer to "test multi-node
without a cluster"; see SURVEY.md §4).

NOTE: setting ``JAX_PLATFORMS=cpu`` in the environment is NOT enough here —
the harness's sitecustomize registers the axon TPU plugin at interpreter
startup and pins the platform before pytest runs.  ``jax.config.update``
after import wins over that, so we use it (verified: jax.devices() shows
8 CpuDevice).  XLA_FLAGS must still be set before the backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
