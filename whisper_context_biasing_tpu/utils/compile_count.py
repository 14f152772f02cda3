"""Public compile-count diagnostics for jitted entry points.

``jax.jit``'s cache internals (``_cache_size``) are private and can change
across jax releases; these wrappers count unique (treedef, shape/dtype,
static-value) call signatures at the call boundary instead — a stable upper
bound on the number of XLA programs a jitted function compiled. Used by the
eval loop's static-shape-discipline diagnostic (one eval pass must reuse a
handful of decode programs instead of recompiling per batch shape).
"""

from __future__ import annotations

import functools

import jax


class CountedJit:
    """``jax.jit(fn)`` plus a public ``cache_size()``."""

    def __init__(self, fn, **jit_kwargs):
        self._jitted = jax.jit(fn, **jit_kwargs)
        self._signatures: set = set()
        functools.update_wrapper(self, fn)

    @staticmethod
    def _key(args, kwargs):
        leaves, treedef = jax.tree.flatten((args, kwargs))
        sig = []
        for leaf in leaves:
            if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
                sig.append((tuple(leaf.shape), str(leaf.dtype)))
            else:  # static / python-scalar leaf: value is part of the key
                sig.append(("py", repr(leaf)))
        return (str(treedef), tuple(sig))

    def __call__(self, *args, **kwargs):
        out = self._jitted(*args, **kwargs)
        # record only after a successful dispatch: a call that fails during
        # tracing compiled nothing and must not inflate the diagnostic
        self._signatures.add(self._key(args, kwargs))
        return out

    def cache_size(self) -> int:
        """Distinct call signatures seen (>= distinct XLA programs)."""
        return len(self._signatures)

    def clear_cache(self) -> None:
        """Drop compiled executables and the signature count.

        Needed when a test monkeypatches a function the wrapped fn closes
        over: traces compiled under the patch stay keyed only by
        shapes/statics and would serve later same-shape calls after the
        patch is undone."""
        self._jitted.clear_cache()
        self._signatures.clear()

    # legacy alias: earlier rounds read jax.jit's private ``_cache_size``
    def _cache_size(self) -> int:
        return self.cache_size()


def counted_jit(fn=None, **jit_kwargs):
    """Drop-in for ``jax.jit`` that adds ``cache_size()`` (see CountedJit)."""
    if fn is None:
        return lambda f: CountedJit(f, **jit_kwargs)
    return CountedJit(fn, **jit_kwargs)
