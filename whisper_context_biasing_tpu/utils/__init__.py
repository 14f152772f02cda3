"""Utilities: JAX setup, structured logging, profiling/RTF meters,
numerical-health checks, gated Hub sync."""

from .jax_setup import setup_jax
from .logging import RunLogger
from .profiling import RtfMeter, StepTimer, profile_trace
from .debug import assert_shape, debug_assert_finite, finite_check
from .hub import push_to_hub_if_exists, sync_from_hub, upload_results_to_hub

__all__ = [
    "setup_jax",
    "RunLogger",
    "RtfMeter",
    "StepTimer",
    "profile_trace",
    "finite_check",
    "debug_assert_finite",
    "assert_shape",
    "sync_from_hub",
    "upload_results_to_hub",
    "push_to_hub_if_exists",
]
