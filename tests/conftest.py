"""Test configuration: pin tests to a virtual 8-device CPU backend so all
sharding/pjit paths are exercised without TPU hardware (SURVEY.md §4).

Note: this environment registers an out-of-tree TPU plugin ("axon") that wins
the default-backend election even when ``JAX_PLATFORMS=cpu`` is exported, so
the CPU pin is done via ``jax_default_device`` after import, and mesh tests
must build their mesh from ``cpu_devices()``.
"""

import os

# CLI modules (scripts/serve.py etc.) call setup_jax() at import time, which
# enables JAX's persistent compilation cache. Under pytest that flips a
# process-global config mid-session for every later test, and cache WRITES
# from the test process have segfaulted put_executable_and_time on this
# host (slow-lane rc=139 in test_speculative after the serve HTTP e2e
# imported serve.py). Tests never benefit from the on-disk cache — every
# lane compiles fresh tiny programs — so pin it off before anything imports.
os.environ.setdefault("WCB_DISABLE_COMP_CACHE", "1")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])
# Full f32 matmuls for numerical parity tests (the default precision uses
# truncated passes that add ~1e-3 noise; production runs bf16 deliberately).
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def cpu_devices():
    return jax.devices("cpu")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted at /root/reference"
)
