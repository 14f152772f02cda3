"""Pallas flash attention for the Whisper encoder.

Encoder self-attention is full (non-causal) over T=1500 states. The XLA
fallback materializes per-layer (B, H, T, T) score tensors in HBM (~54 MB
bf16 per layer for whisper-small at batch 16); this kernel streams them
through VMEM instead: for each (batch*head, q-block) grid cell it holds the
full K/V for that head (1536x64 bf16 ≈ 200 KB) plus one (BQ, T) f32 score
block, computes softmax(q K^T / sqrt(dh)) V in one shot, and writes only the
(BQ, dh) output — no attention matrix ever hits HBM.

T=1500 is padded to a multiple of the q block; padded key columns are masked
via the ``kv_len`` scalar. Online-softmax tiling is unnecessary at this
sequence length (one q-block's full score row fits comfortably in VMEM).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256


def _flash_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Grid cell: one (batch*head, q-block). q: (BQ, dh); k/v: (T, dh)."""
    kv_len = kv_len_ref[0]
    q = q_ref[...]  # (BQ, dh)
    k = k_ref[...]  # (T, dh)
    v = v_ref[...]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, T)
    t = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, jnp.finfo(jnp.float32).min)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


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
    ``models.whisper.attention``. Returns (B, T, D)."""
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

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    kv_len = jnp.asarray([t], jnp.int32)

    grid = (b * n_heads, t_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
                pl.BlockSpec((None, t_pad, dh), lambda h, i, _: (h, 0, 0)),
                pl.BlockSpec((None, t_pad, dh), lambda h, i, _: (h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((None, block_q, dh), lambda h, i, _: (h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * n_heads, t_pad, dh), q.dtype),
        interpret=interpret,
    )(kv_len, qh, kh, vh)

    out = out[:, :t]  # drop padding
    out = out.reshape(b, n_heads, t, dh).transpose(0, 2, 1, 3).reshape(b, t, d)
    return out
