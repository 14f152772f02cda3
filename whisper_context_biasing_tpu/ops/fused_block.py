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

Measured outcome (docs/PERF.md round 5): the forward wins ~6% per op, but
for TRAINING the backward loses it back — falsified end-to-end (9-12%
slower than the XLA fusions), so training defaults keep the XLA path and
``--fused_ln`` is opt-in. The winning application is forward-only
inference: the decode encoder + prefill at large batch (bench.py
``BENCH_FUSED_LN_FWD``). The cached single-token decode path keeps the
XLA ops — its (B,1,d) activations make kernel dispatch overhead dominate.
(The reference delegates its whole train step to HF/torch,
/root/reference/scripts/train.py:273; these ops have no counterpart there.)

Backward: hand-derived custom_vjp. Residuals are exactly the kernel INPUTS
(the block-level "save nothing" that remat=full otherwise provides), and
the backward recomputes only what the gradients need: the LayerNorm output
is rebuilt VPU-only (no matmul), and the pre-activation matmul is re-run
ONLY for the gelu site (act'(s) needs s). The first cut of this backward
``jax.vjp``-ed the full reference forward, which re-ran the output matmul
the gradients never use — one extra (d,E) matmul per site per step, enough
to measurably lose to the XLA baseline (docs/PERF.md round 5).

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
    """Pure-JAX spec of the kernel's computation: f32 LayerNorm statistics,
    compute-dtype matmul with f32 accumulation, f32 bias + activation, cast
    back to the input dtype. Kept as the documented semantics the interpret
    tests and the hand-derived backward are checked against."""
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
    """Hand-derived backward of ``act(LN(x) @ W + b)``.

    Recomputes the LayerNorm output in f32 (VPU-only — no matmul) and, for
    activation sites only, the pre-activation ``s = y@W + b`` (the one
    matmul the gradient genuinely needs, same count as the XLA baseline's
    remat replay). All reductions run in f32; cotangents are cast to the
    primal dtypes at the boundary, matching ``jax.vjp`` of the reference
    within f32 rounding (tests/test_ops.py::TestFusedLnMatmul gradients).
    """
    x2d, g, beta, w, b = res
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mean) * rstd
    gf = g.astype(jnp.float32)
    y = xhat * gf + beta.astype(jnp.float32)
    yc = y.astype(w.dtype)

    df = dout.astype(jnp.float32)  # cotangent of the f32 pre-cast output
    if act is not None:
        s = jnp.dot(yc, w, preferred_element_type=jnp.float32)
        s = s + b.astype(jnp.float32)
        _, act_vjp = jax.vjp(lambda t: _apply_act(t, act), s)
        (ds,) = act_vjp(df)
    else:
        ds = df

    db = jnp.sum(ds, axis=0).astype(b.dtype)
    dw = jax.lax.dot_general(
        yc, ds.astype(w.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)  # (d, E)
    dy = jax.lax.dot_general(
        ds.astype(w.dtype), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, d) f32

    dg = jnp.sum(dy * xhat, axis=0).astype(g.dtype)
    dbeta = jnp.sum(dy, axis=0).astype(beta.dtype)
    dxhat = dy * gf
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    return (dx.astype(x2d.dtype), dg, dbeta, dw, db)


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
    (hand-derived custom_vjp backward, ``_core_bwd``). Returns
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
