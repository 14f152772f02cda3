"""Fused LayerNorm + matmul (+ bias + gelu) Pallas kernel.

Attacks the train-step VPU/HBM tail that remains after flash attention
(docs/PERF.md round-4 analysis: ~56 ms/step of layernorm/gelu fusions at
base.en). The XLA baseline emits each block's pre-matmul LayerNorm and the
MLP's bias+gelu as standalone loop fusions, each a full HBM round-trip of
the activation tensor:

  LN:    read x (N,d)  -> write y (N,d); three QKV matmuls then re-read y
  MLP:   matmul writes s (N,4d) -> gelu fusion reads s, writes h (N,4d)
         -> second matmul re-reads h

This kernel computes ``act(LN(x) @ W + b)`` in ONE pass: x streams through
VMEM once per row block, the LayerNorm statistics live in registers, and
only the final product is written. Two call sites (models/whisper.py):

  * ``attn_ln`` + QKV projection: W = [Wq | Wk | Wv] (d, 3d), the
    normalized tensor never reaches HBM (saves 1 write + 3 reads of (N,d)),
    and the three d-wide projections become one MXU-friendlier 3d-wide one.
  * ``mlp_ln`` + first MLP matmul + bias + gelu: neither the normalized
    input nor the (N,4d) pre-activation is ever materialized (saves
    1 write + 1 read of (N,d) and 1 write + 1 read of (N,4d)).

Both are training-path fusions (the reference delegates its whole train
step to HF/torch, /root/reference/scripts/train.py:273; these ops have no
torch counterpart there). The cached single-token decode path keeps the
XLA ops — its (B,1,d) activations make kernel dispatch overhead dominate.

Backward: custom_vjp whose backward differentiates the pure-JAX reference
(numerics-identical recompute). Residuals are exactly the kernel INPUTS, so
under ``jax.checkpoint`` (remat=full) nothing extra is saved and the remat
replay runs the fused kernel again — the forward saving is paid out twice
per step.

Grid: (row blocks, col blocks); the x block index ignores the col dimension
so Pallas keeps it VMEM-resident across the inner col sweep, streaming only
weight tiles. Col tiling keeps the weight tile <= ~8 MB VMEM at every model
size (large-v3's (1280, 5120) W1 splits into two tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_M = 256
_EPS = 1e-5
# keep one weight tile at or under this many bytes of VMEM (~16 MB/core,
# shared with the x block, the f32 accumulator, and the output block)
_W_TILE_BYTES = 8 << 20


def _apply_act(y, act: str | None):
    if act is None:
        return y
    if act == "gelu":
        return jax.nn.gelu(y, approximate=False)
    if act == "gelu_tanh":
        return jax.nn.gelu(y, approximate=True)
    raise ValueError(f"unknown activation {act!r}")


def _kernel(x_ref, g_ref, beta_ref, w_ref, b_ref, o_ref, *, act):
    x = x_ref[...].astype(jnp.float32)  # (bm, d)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + _EPS)
    y = y * g_ref[...].astype(jnp.float32) + beta_ref[...].astype(jnp.float32)
    out = jax.lax.dot_general(
        y.astype(w_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bm, bn) f32
    out = out + b_ref[...].astype(jnp.float32)
    o_ref[...] = _apply_act(out, act).astype(o_ref.dtype)


def _pick_block_n(d: int, e: int, itemsize: int) -> int:
    bn = e
    while bn > 128 and bn % 2 == 0 and d * bn * itemsize > _W_TILE_BYTES:
        bn //= 2
    if e % bn:
        raise ValueError(f"cannot tile output dim {e} (d={d})")
    return bn


def _reference(x, g, beta, w, b, act):
    """Pure-JAX computation the kernel implements (and the backward
    differentiates): f32 LayerNorm statistics, compute-dtype matmul with f32
    accumulation, f32 bias + activation, cast back to the input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + _EPS)
    y = y * g.astype(jnp.float32) + beta.astype(jnp.float32)
    out = jnp.dot(y.astype(w.dtype), w, preferred_element_type=jnp.float32)
    out = out + b.astype(jnp.float32)
    return _apply_act(out, act).astype(x.dtype)


def _fwd_call(x2d, g, beta, w, b, act, block_m, interpret):
    n, d = x2d.shape
    e = w.shape[1]
    bn = _pick_block_n(d, e, w.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_kernel, act=act),
        grid=(n // block_m, e // bn),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((d, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, e), x2d.dtype),
        interpret=interpret,
    )(x2d, g.reshape(1, d), beta.reshape(1, d), w, b.reshape(1, e))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _core(x2d, g, beta, w, b, act, block_m, interpret):
    return _fwd_call(x2d, g, beta, w, b, act, block_m, interpret)


def _core_fwd(x2d, g, beta, w, b, act, block_m, interpret):
    out = _fwd_call(x2d, g, beta, w, b, act, block_m, interpret)
    return out, (x2d, g, beta, w, b)


def _core_bwd(act, block_m, interpret, res, dout):
    x2d, g, beta, w, b = res
    _, vjp = jax.vjp(lambda *a: _reference(*a, act), x2d, g, beta, w, b)
    return vjp(dout)


_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.jit, static_argnames=("act", "block_m", "interpret"))
def fused_ln_matmul(
    x: jax.Array,  # (B, T, d) or (N, d)
    g: jax.Array,  # (d,) LayerNorm scale
    beta: jax.Array,  # (d,) LayerNorm bias
    w: jax.Array,  # (d, E)
    b: jax.Array | None = None,  # (E,)
    act: str | None = None,  # None | "gelu" | "gelu_tanh"
    block_m: int = DEFAULT_BLOCK_M,
    interpret: bool = False,
) -> jax.Array:
    """``act(LayerNorm(x) @ w + b)`` in one Pallas pass. Differentiable
    (backward differentiates the numerics-identical JAX reference). Returns
    x.shape[:-1] + (E,) in x.dtype."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    e = w.shape[1]
    if b is None:
        b = jnp.zeros((e,), w.dtype)
    n = 1
    for s in lead:
        n *= s
    x2d = x.reshape(n, d)
    n_pad = ((n + block_m - 1) // block_m) * block_m
    if n_pad > n:
        x2d = jnp.pad(x2d, ((0, n_pad - n), (0, 0)))
    out = _core(x2d, g, beta, w, b, act, block_m, interpret)
    return out[:n].reshape(*lead, e)
