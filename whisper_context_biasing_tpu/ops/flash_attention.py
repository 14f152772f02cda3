"""Pallas flash attention for the Whisper encoder — forward and backward.

Encoder self-attention is full (non-causal) over T=1500 states. The XLA
fallback materializes per-layer (B, H, T, T) score tensors in HBM (~54 MB
bf16 per layer for whisper-small at batch 16) in BOTH passes; these kernels
stream them through VMEM instead:

  forward   — per (batch*head, q-block): full K/V for that head in VMEM
              (1536x64 bf16 ≈ 200 KB) + one (BQ, T) f32 score block;
              softmax(q K^T / sqrt(dh)) V in one shot, only (BQ, dh) written.
  backward  — two kernels with the standard flash-backward decomposition:
              dq kernel (grid over q-blocks) recomputes its softmax rows and
              also emits the per-row logsumexp L; dk/dv kernel (grid over
              k-blocks) reconstructs its probability columns from L and the
              row term D = rowsum(do * o) (computed elementwise in XLA).
              No (T, T) tensor ever hits HBM.

T is padded to a multiple of the block; padded key columns are masked via the
``kv_len`` scalar; padded query rows contribute zero gradient because their
``do`` rows are zero. Online-softmax tiling is unnecessary at this sequence
length (a block's full score row fits comfortably in VMEM).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
_LANE = 128  # lse/rowterm tensors are lane-replicated to satisfy tiling


def _masked_scores(q, k, kv_len, scale):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, T)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < kv_len, s, jnp.finfo(jnp.float32).min)


def _fwd_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """(bh, qi): q (BQ, dh); k/v (T, dh) -> o (BQ, dh)."""
    s = _masked_scores(q_ref[...], k_ref[...], kv_len_ref[0], scale)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v_ref.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _dq_kernel(kv_len_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, lse_ref, *, scale):
    """(bh, qi): recompute softmax rows; emit dq and the row logsumexp."""
    s = _masked_scores(q_ref[...], k_ref[...], kv_len_ref[0], scale)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l
    lse = m + jnp.log(l)  # (BQ, 1)
    lse_ref[...] = jnp.broadcast_to(lse, lse_ref.shape).astype(jnp.float32)

    do = do_ref[...].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, T)
    row_d = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - row_d) * scale
    dq_ref[...] = jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)


def _dkv_kernel(kv_len_ref, q_ref, do_ref, dterm_ref, lse_ref, k_ref, v_ref,
                dk_ref, dv_ref, *, scale):
    """(bh, ki): reconstruct probability columns for this k block via the
    saved logsumexp; emit dk/dv. q/do (T, dh); dterm/lse (T, LANE) f32
    (lane-replicated); k/v (BK, dh)."""
    kv_len = kv_len_ref[0]
    q = q_ref[...]
    s_col = jax.lax.dot_general(
        q, k_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (T, BK)
    lse = lse_ref[...][:, :1]  # (T, 1)
    p_col = jnp.exp(s_col - lse)
    # mask rows beyond kv_len (their lse is a sentinel; do rows are zero
    # anyway, but keep p finite)
    row = jax.lax.broadcasted_iota(jnp.int32, p_col.shape, 0)
    p_col = jnp.where(row < kv_len, p_col, 0.0)

    do = do_ref[...].astype(jnp.float32)
    dv_ref[...] = jax.lax.dot_general(
        p_col.astype(do_ref.dtype), do_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)  # (BK, dh)

    dp_col = jax.lax.dot_general(
        do, v_ref[...].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, BK)
    dterm = dterm_ref[...][:, :1]  # (T, 1)
    ds_col = p_col * (dp_col - dterm) * scale
    dk_ref[...] = jax.lax.dot_general(
        ds_col.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)  # (BK, dh)


# ---------------------------------------------------------------------------
# custom-vjp core over padded (BH, Tp, dh) tensors
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core(q, k, v, t: int, scale: float, block_q: int, interpret: bool):
    return _flash_fwd_call(q, k, v, t, scale, block_q, interpret)


def _flash_fwd_call(q, k, v, t, scale, block_q, interpret):
    bh, t_pad, dh = q.shape
    kv_len = jnp.asarray([t], jnp.int32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t_pad // block_q),
            in_specs=[
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, t_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, t_pad, dh), lambda h, i, _: (h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, dh), q.dtype),
        interpret=interpret,
    )(kv_len, q, k, v)


def _flash_core_fwd(q, k, v, t, scale, block_q, interpret):
    out = _flash_fwd_call(q, k, v, t, scale, block_q, interpret)
    return out, (q, k, v, out)


def _flash_core_bwd(t, scale, block_q, interpret, res, do):
    q, k, v, out = res
    bh, t_pad, dh = q.shape
    kv_len = jnp.asarray([t], jnp.int32)

    # row term D = rowsum(do * o): pure elementwise, lane-replicated for tiling
    dterm = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dterm_rep = jnp.broadcast_to(dterm[..., None], (bh, t_pad, _LANE))

    dq, lse_rep = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t_pad // block_q),
            in_specs=[
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, t_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, t_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, block_q, _LANE), lambda h, i, _: (h, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(kv_len, q, k, v, do)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t_pad // block_q),
            in_specs=[
                pl.BlockSpec((None, t_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, t_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, t_pad, _LANE), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, t_pad, _LANE), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, dh), k.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, dh), v.dtype),
        ],
        interpret=interpret,
    )(kv_len, q, do, dterm_rep, lse_rep, k, v)

    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# public merged-head interface
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("n_heads", "block_q", "interpret")
)
def flash_attention(
    q: jax.Array,  # (B, T, D)
    k: jax.Array,  # (B, T, D)
    v: jax.Array,  # (B, T, D)
    n_heads: int,
    block_q: int = DEFAULT_BLOCK_Q,
    interpret: bool = False,
) -> jax.Array:
    """Full (non-causal) multi-head attention, merged-head interface matching
    ``models.whisper.attention``. Differentiable (custom flash backward).
    Returns (B, T, D)."""
    b, t, d = q.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)

    t_pad = ((t + block_q - 1) // block_q) * block_q
    pad = t_pad - t

    def to_heads(x):
        x = x.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)  # (B, H, T, dh)
        x = x.reshape(b * n_heads, t, dh)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    out = _flash_core(to_heads(q), to_heads(k), to_heads(v), t, scale,
                      block_q, interpret)
    out = out[:, :t]
    return out.reshape(b, n_heads, t, dh).transpose(0, 2, 1, 3).reshape(b, t, d)
