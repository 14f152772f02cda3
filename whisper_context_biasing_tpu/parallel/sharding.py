"""Parameter / batch partition specs (GSPMD).

Megatron-style tensor layout over the ("data", "model") mesh:

  * qkv and fc1 weights: output (head / hidden) dim over "model"
    -> attention heads and FFN hidden computed fully locally
  * out-proj and fc2 weights: input dim over "model"
    -> XLA inserts one psum (all-reduce) per block on the residual add
  * token embedding / lm head: vocab dim over "model" (logit shards)
  * everything else (lns, convs, pos embeddings, biases of reduced dims)
    replicated
  * batches: leading axis over "data"

Specs are assigned by parameter *path name*, so they apply uniformly to the
stacked (L, ...) tensors used by scan-over-layers.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# leaf-name -> spec builder (ndim-aware: leading L axis present or not)
_COL_PARALLEL = {"wq", "wk", "wv", "w1"}   # shard last dim
_ROW_PARALLEL = {"wo", "w2"}               # shard second-to-last dim
_COL_BIAS = {"bq", "bv", "b1"}             # shard last dim


def _spec_for(path: tuple[str, ...], ndim: int) -> P:
    name = path[-1]
    if name in _COL_PARALLEL:
        return P(*([None] * (ndim - 1)), MODEL_AXIS)
    if name in _ROW_PARALLEL:
        return P(*([None] * (ndim - 2)), MODEL_AXIS, None)
    if name in _COL_BIAS:
        return P(*([None] * (ndim - 1)), MODEL_AXIS)
    if name in ("token_emb",) or path[0] == "proj_out":
        return P(MODEL_AXIS, None)
    return P()  # replicated


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching ``params``."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return _spec_for(path, getattr(tree, "ndim", 0))

    return walk(params, ())


def shard_params(params: Any, mesh: Mesh) -> Any:
    specs = param_specs(params)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, params, specs)


def shard_batch(batch: dict, mesh: Mesh, extra_leading_axes: int = 0) -> dict:
    """Shard every batch array's (post-accumulation) batch axis over "data".
    ``extra_leading_axes=1`` for microbatched (A, B, ...) inputs."""

    def put(x):
        spec = P(*([None] * extra_leading_axes), DATA_AXIS)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def shard_decode_inputs(
    mesh: Mesh, *arrays, batch_axis: int = 0
) -> tuple[list, int]:
    """Shard decode-program inputs (mel features, prefix ids/mask, bias
    spans) with the batch axis over "data", padding the batch up to a
    data-parallel multiple by repeating the first row (GSPMD device_put
    needs even shards; padded rows are stripped by the caller).

    Returns ([sharded arrays], original_batch_size). ``None`` entries pass
    through untouched. The reference's only batched-decode capability is HF
    ``trainer.predict`` (scripts/evaluation.py:42) on one GPU; this is its
    scale-out equivalent (SURVEY.md §2.3: batch-axis sharding over the mesh).
    """
    import numpy as np

    dp = mesh.shape[DATA_AXIS]
    sizes = {a.shape[batch_axis] for a in arrays if a is not None}
    assert len(sizes) == 1, f"inconsistent batch sizes: {sizes}"
    b = sizes.pop()
    padded = ((b + dp - 1) // dp) * dp

    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        a = np.asarray(a)
        if padded != b:
            reps = np.repeat(
                np.take(a, [0], axis=batch_axis), padded - b, axis=batch_axis
            )
            a = np.concatenate([a, reps], axis=batch_axis)
        spec = P(*([None] * batch_axis), DATA_AXIS,
                 *([None] * (a.ndim - batch_axis - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return out, b


def shard_opt_state(opt_state: Any, params_sharded: Any, mesh: Mesh) -> Any:
    """Optimizer moments follow their parameter's sharding; scalar counts are
    replicated."""
    p_shardings = jax.tree.map(lambda a: a.sharding, params_sharded)
    p_struct = jax.tree.structure(p_shardings)

    # walk the top-level state tuples, mapping any params-shaped subtree
    def walk(node):
        try:
            if jax.tree.structure(node) == p_struct:
                return jax.tree.map(
                    lambda x, s: jax.device_put(x, s), node, p_shardings
                )
        except Exception:
            pass
        if isinstance(node, tuple) and not hasattr(node, "shape"):
            rebuilt = [walk(c) for c in node]
            return type(node)(*rebuilt) if hasattr(node, "_fields") else tuple(rebuilt)
        if isinstance(node, (list,)):
            return [walk(c) for c in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return jax.device_put(node, NamedSharding(mesh, P()))

    return walk(opt_state)
