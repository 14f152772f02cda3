"""Pallas flash attention — forward and backward, full or causal, Tq != Tk.

Used for all three training-time attention patterns (the reference runs these
through HF/torch SDPA kernels, models/whisper_medical.py:93-110):

  * encoder self-attention: full (non-causal) over T=1500 states
  * decoder self-attention: causal over the label sequence S (<=448)
  * decoder cross-attention: full, queries S over keys T=1500 — the largest
    score tensor of the three, (B, H, S, 1500)

The XLA fallback materializes per-layer (B, H, Tq, Tk) score tensors in HBM
(~54 MB bf16 per encoder layer at batch 16; up to ~170 MB per cross-attention
layer at S=448) in BOTH passes; these kernels stream them through VMEM:

  forward   — per (batch*head, q-block): full K/V for that head in VMEM
              (1536x64 bf16 ~ 200 KB) + one (BQ, Tk) f32 score block;
              softmax(q K^T / sqrt(dh)) V in one shot, only (BQ, dh) written.
  backward  — two kernels with the standard flash-backward decomposition:
              dq kernel (grid over q-blocks) recomputes its softmax rows and
              also emits the per-row logsumexp L; dk/dv kernel (grid over
              k-blocks) reconstructs its probability columns from L and the
              row term D = rowsum(do * o) (computed elementwise in XLA).
              No (Tq, Tk) tensor ever hits HBM.

Causal masking (`causal=True`, decoder self-attention) requires Tq == Tk and
masks key column j for query row i when j > i; the same predicate is applied
in all three kernels so reconstructed probabilities match the forward exactly.

Tq/Tk are padded to a multiple of the block; padded key columns are masked via
the ``kv_len`` scalar; padded query rows contribute zero gradient because
their ``do`` rows are zero (dk/dv zero them explicitly via ``q_len``).
Online-softmax tiling is unnecessary at these sequence lengths (a block's
full score row fits comfortably in VMEM).
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


def _masked_scores(q, k, kv_len, scale, causal, row_offset):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, Tk)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    keep = col < kv_len
    if causal:
        row = row_offset + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        keep &= col <= row
    return jnp.where(keep, s, jnp.finfo(jnp.float32).min)


def _fwd_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                causal: bool, block_q: int):
    """(bh, qi): q (BQ, dh); k/v (Tk, dh) -> o (BQ, dh)."""
    row_offset = pl.program_id(1) * block_q
    s = _masked_scores(q_ref[...], k_ref[...], lens_ref[1], scale, causal,
                       row_offset)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    # normalize the (BQ, dh) OUTPUT, not the (BQ, Tk) probabilities — one
    # large VPU pass less per cell (Tk/dh ~ 24x fewer divides)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (o / denom).astype(o_ref.dtype)


def _dq_kernel(lens_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, lse_ref, *,
               scale, causal, block_q):
    """(bh, qi): recompute softmax rows; emit dq and the row logsumexp."""
    row_offset = pl.program_id(1) * block_q
    s = _masked_scores(q_ref[...], k_ref[...], lens_ref[1], scale, causal,
                       row_offset)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l
    lse = m + jnp.log(l)  # (BQ, 1)
    lse_ref[...] = jnp.broadcast_to(lse, lse_ref.shape).astype(jnp.float32)

    do = do_ref[...].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, Tk)
    row_d = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - row_d) * scale
    dq_ref[...] = jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)


def _dkv_kernel(lens_ref, q_ref, do_ref, dterm_ref, lse_ref, k_ref, v_ref,
                dk_ref, dv_ref, *, scale, causal, block_q):
    """(bh, ki): reconstruct probability columns for this k block via the
    saved logsumexp; emit dk/dv. q/do (Tq, dh); dterm/lse (Tq, LANE) f32
    (lane-replicated); k/v (BK, dh)."""
    q_len = lens_ref[0]
    q = q_ref[...]
    s_col = jax.lax.dot_general(
        q, k_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Tq, BK)
    lse = lse_ref[...][:, :1]  # (Tq, 1)
    p_col = jnp.exp(s_col - lse)
    # mask rows beyond q_len (their lse is a sentinel; do rows are zero
    # anyway, but keep p finite); in causal mode also zero the columns above
    # the diagonal so reconstruction matches the forward's mask
    row = jax.lax.broadcasted_iota(jnp.int32, p_col.shape, 0)
    keep = row < q_len
    if causal:
        col = pl.program_id(1) * block_q + jax.lax.broadcasted_iota(
            jnp.int32, p_col.shape, 1
        )
        keep &= row >= col
    p_col = jnp.where(keep, p_col, 0.0)

    do = do_ref[...].astype(jnp.float32)
    dv_ref[...] = jax.lax.dot_general(
        p_col.astype(do_ref.dtype), do_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)  # (BK, dh)

    dp_col = jax.lax.dot_general(
        do, v_ref[...].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tq, BK)
    dterm = dterm_ref[...][:, :1]  # (Tq, 1)
    ds_col = p_col * (dp_col - dterm) * scale
    dk_ref[...] = jax.lax.dot_general(
        ds_col.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)  # (BK, dh)


# ---------------------------------------------------------------------------
# custom-vjp core over padded (BH, T*_pad, dh) tensors
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_core(q, k, v, q_len: int, kv_len: int, causal: bool, scale: float,
                block_q: int, interpret: bool):
    return _flash_fwd_call(q, k, v, q_len, kv_len, causal, scale, block_q,
                           interpret)


def _flash_fwd_call(q, k, v, q_len, kv_len, causal, scale, block_q, interpret):
    bh, tq_pad, dh = q.shape
    tk_pad = k.shape[1]
    lens = jnp.asarray([q_len, kv_len], jnp.int32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal,
                          block_q=block_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, tq_pad // block_q),
            in_specs=[
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, tk_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, tk_pad, dh), lambda h, i, _: (h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, dh), q.dtype),
        interpret=interpret,
    )(lens, q, k, v)


def _flash_core_fwd(q, k, v, q_len, kv_len, causal, scale, block_q, interpret):
    out = _flash_fwd_call(q, k, v, q_len, kv_len, causal, scale, block_q,
                          interpret)
    return out, (q, k, v, out)


def _flash_core_bwd(q_len, kv_len, causal, scale, block_q, interpret, res, do):
    q, k, v, out = res
    bh, tq_pad, dh = q.shape
    tk_pad = k.shape[1]
    lens = jnp.asarray([q_len, kv_len], jnp.int32)

    # row term D = rowsum(do * o): pure elementwise, lane-replicated for tiling
    dterm = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dterm_rep = jnp.broadcast_to(dterm[..., None], (bh, tq_pad, _LANE))

    dq, lse_rep = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          block_q=block_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, tq_pad // block_q),
            in_specs=[
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, tk_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, tk_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, block_q, _LANE), lambda h, i, _: (h, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, tq_pad, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(lens, q, k, v, do)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal,
                          block_q=block_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, tk_pad // block_q),
            in_specs=[
                pl.BlockSpec((None, tq_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, tq_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, tq_pad, _LANE), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, tq_pad, _LANE), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, tk_pad, dh), k.dtype),
            jax.ShapeDtypeStruct((bh, tk_pad, dh), v.dtype),
        ],
        interpret=interpret,
    )(lens, q, do, dterm_rep, lse_rep, k, v)

    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# public merged-head interface
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("n_heads", "causal", "block_q", "interpret")
)
def flash_attention(
    q: jax.Array,  # (B, Tq, D)
    k: jax.Array,  # (B, Tk, D)
    v: jax.Array,  # (B, Tk, D)
    n_heads: int,
    causal: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention, merged-head interface matching
    ``models.whisper.attention``: full (``causal=False``) or causal
    (``causal=True``, requires Tq == Tk). Differentiable (custom flash
    backward). Returns (B, Tq, D)."""
    b, tq, d = q.shape
    tk = k.shape[1]
    if causal and tq != tk:
        raise ValueError(f"causal flash attention requires Tq == Tk, got {tq} != {tk}")
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)

    tq_pad = ((tq + block_q - 1) // block_q) * block_q
    tk_pad = ((tk + block_q - 1) // block_q) * block_q

    def to_heads(x, t, t_pad):
        x = x.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)  # (B, H, T, dh)
        x = x.reshape(b * n_heads, t, dh)
        if t_pad > t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    out = _flash_core(
        to_heads(q, tq, tq_pad), to_heads(k, tk, tk_pad), to_heads(v, tk, tk_pad),
        tq, tk, causal, scale, block_q, interpret,
    )
    out = out[:, :tq]
    return out.reshape(b, n_heads, tq, dh).transpose(0, 2, 1, 3).reshape(b, tq, d)
