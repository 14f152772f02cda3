"""Test configuration: force JAX onto a virtual 8-device CPU mesh so all
sharding/pjit paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Full f32 matmuls for numerical parity tests (the default precision uses
# truncated passes that add ~1e-3 noise; production runs bf16 deliberately).
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted at /root/reference"
)
