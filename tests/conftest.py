"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by running JAX on the
host platform with 8 virtual devices (the TPU answer to "test multi-node
without a cluster"; see SURVEY.md §4).  Must run before jax is imported.
"""

import os

# Override (not setdefault): the harness environment pins JAX_PLATFORMS to the
# TPU tunnel; unit tests must run hermetically on the host CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
