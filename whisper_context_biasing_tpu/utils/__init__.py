"""Utilities: JAX setup, structured logging, profiling/RTF meters,
numerical-health checks, gated Hub sync."""

from .compile_count import CountedJit, counted_jit
from .jax_setup import setup_jax
from .logging import RunLogger
from .profiling import RtfMeter, StepTimer, profile_trace
from .debug import assert_shape, debug_assert_finite, finite_check
from .hub import push_to_hub_if_exists, sync_from_hub, upload_results_to_hub


def effective_platform() -> str:
    """Platform of the EFFECTIVE dispatch device.

    The ``jax_default_device`` pin when set (tests pin CPU while a TPU
    plugin is present), else the default-backend election winner. The one
    gate behind platform-dependent choices (Pallas mel frontend, serving
    fast-path approximations, auto-mesh device enumeration).
    """
    import jax

    dev = jax.config.jax_default_device or jax.devices()[0]
    return getattr(dev, "platform", None) or "cpu"


def warn_missing_assets(vocab_path, weights_path, entry: str = "") -> bool:
    """One-line warning when an entry point runs without real assets
    (docs/REAL_ASSETS.md lists exactly which files unlock full parity).
    Returns True when a warning was printed."""
    import sys

    missing = []
    if not vocab_path:
        missing.append("byte-fallback vocab (no --vocab/--merges)")
    if not weights_path:
        missing.append("random weights (no checkpoint/safetensors)")
    if missing:
        tag = f"[{entry}] " if entry else ""
        print(f"{tag}WARNING: {' + '.join(missing)} — outputs are NOT real "
              "transcripts; see docs/REAL_ASSETS.md", file=sys.stderr)
    return bool(missing)


__all__ = [
    "setup_jax",
    "CountedJit",
    "counted_jit",
    "effective_platform",
    "warn_missing_assets",
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
