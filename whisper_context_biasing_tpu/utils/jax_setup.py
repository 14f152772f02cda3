"""Process-level JAX setup for the CLIs.

Enables the persistent compilation cache so repeated CLI invocations (train →
evaluate → bench) don't re-pay multi-minute XLA compiles of the encoder/decode
programs. Cache location: $WCB_COMPILATION_CACHE or ~/.cache/wcb_jax_cache.
"""

from __future__ import annotations

import os


def setup_jax(enable_compilation_cache: bool = True) -> None:
    import jax

    if enable_compilation_cache and os.environ.get("WCB_DISABLE_COMP_CACHE") != "1":
        cache_dir = os.environ.get(
            "WCB_COMPILATION_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "wcb_jax_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
