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
  backward  — ONE fused kernel (grid over q-blocks): recomputes its softmax
              rows, forms the row term D = rowsum(do * o) in-register, emits
              the dq block, and ACCUMULATES dk/dv in VMEM across the
              sequential q-block grid dimension (their output block's index
              map ignores the q index, so Pallas keeps it resident and
              flushes once per head). This is the 5-matmul flash backward:
              the earlier dq/dkv two-kernel split recomputed q K^T and
              do V^T twice (7 matmuls) and round-tripped the per-row
              logsumexp + D through HBM as lane-replicated (Tq, 128) f32
              tensors. No (Tq, Tk) tensor ever hits HBM in either pass.

Causal masking (`causal=True`, decoder self-attention) requires Tq == Tk and
masks key column j for query row i when j > i; the same predicate is applied
in both kernels so backward probabilities match the forward exactly.

Tq/Tk are padded to a multiple of the block; padded key columns are masked via
the ``kv_len`` scalar; padded query rows contribute zero gradient because
their ``do`` rows are zero, which zeroes dp, D, and ds for those rows.
Online-softmax tiling is unnecessary at these sequence lengths (a block's
full score row fits comfortably in VMEM: at Tk=1536, block_q=256 the
backward's live set is ~6.5 MB of the ~16 MB/core).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256


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


def _bwd_kernel(lens_ref, q_ref, do_ref, o_ref, k_ref, v_ref,
                dq_ref, dk_ref, dv_ref, *, scale, causal, block_q):
    """(bh, qi): the fused 5-matmul flash backward. Recomputes this
    q-block's softmax rows, emits dq, and accumulates dk/dv into VMEM
    output blocks that persist across the (sequential, innermost) q-block
    dimension — initialized at qi == 0, flushed to HBM when the head
    changes. Padded q rows carry zero ``do`` so their dp/D/ds vanish; no
    explicit q_len masking is needed."""
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    s = _masked_scores(q_ref[...], k_ref[...], lens_ref[1], scale, causal,
                       qi * block_q)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (BQ, Tk) f32

    do = do_ref[...].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Tk)
    # row term D = rowsum(do * o), in-register (no HBM round-trip)
    dterm = jnp.sum(do * o_ref[...].astype(jnp.float32), axis=-1,
                    keepdims=True)
    ds = p * (dp - dterm) * scale  # (BQ, Tk) f32

    dq_ref[...] = jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dv_ref[...] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tk, dh) f32 accumulator
    dk_ref[...] += jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tk, dh) f32 accumulator


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

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, causal=causal,
                          block_q=block_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, tq_pad // block_q),
            in_specs=[
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, tk_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, tk_pad, dh), lambda h, i, _: (h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, tk_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, tk_pad, dh), lambda h, i, _: (h, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq_pad, dh), q.dtype),
            # f32 accumulators across q-blocks; cast to the param dtype in
            # XLA (fuses with whatever consumes them)
            jax.ShapeDtypeStruct((bh, tk_pad, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, tk_pad, dh), jnp.float32),
        ],
        interpret=interpret,
    )(lens, q, do, out, k, v)

    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


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
