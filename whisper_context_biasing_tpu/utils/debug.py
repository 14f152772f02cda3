"""Numerical-health checks (SURVEY.md §5 aux plan: NaN/inf checks + strict
shape/dtype asserts in the pipeline — the TPU stand-in for sanitizers)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def finite_check(tree: Any, name: str = "pytree") -> None:
    """Host-side assertion that every array leaf is finite (call on
    materialized values, e.g. metrics or fetched params)."""
    bad = []

    def visit(path, leaf):
        arr = np.asarray(leaf)
        # jnp.issubdtype covers ml_dtypes floats too: numpy classifies
        # bfloat16 as kind 'V', so np.issubdtype would silently skip the
        # default compute dtype entirely
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            return
        if arr.dtype == jnp.bfloat16:
            arr = arr.astype(np.float32)
        if not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def debug_assert_finite(x: jax.Array, name: str = "tensor") -> jax.Array:
    """In-graph finite check: aborts with a message under jit when the tensor
    contains NaN/inf (uses jax.debug so it works inside compiled code)."""
    ok = jnp.all(jnp.isfinite(x))

    def _report(ok_val):
        if not ok_val:
            raise FloatingPointError(f"non-finite values in {name}")

    jax.debug.callback(_report, ok)
    return x


def assert_shape(x, shape: tuple, name: str = "tensor") -> None:
    """Static shape assert with wildcard None dims."""
    actual = tuple(x.shape)
    if len(actual) != len(shape) or any(
        e is not None and a != e for a, e in zip(actual, shape)
    ):
        raise ValueError(f"{name}: expected shape {shape}, got {actual}")
