"""Test configuration: force JAX onto a virtual 8-device CPU mesh so all
sharding/pjit paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted at /root/reference"
)
