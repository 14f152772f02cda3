"""Pallas single-query cross-attention over int8 K/V — the decode hot loop.

Why this kernel exists (trace-backed, docs/PERF.md round 2): with
``quantize_cross_kv`` the XLA decode step dequantizes each layer's full
(B, T, D) K/V to bf16 before the attention matmuls. At batch 16 the
dequantized tensors stay VMEM-resident and the step streams int8 at ~85% of
HBM peak — but at batch 32 the bf16 K+V (2 x 74 MB) exceed VMEM, spill to
HBM, and get re-read: the dequant fusions blow up 11x for 2x batch (9.8 ms
-> 108 ms per 31-step call), which is the round-1 "batch 32/64 slower than
16" anomaly.

This kernel grids over batch rows so each cell dequantizes ONLY its own
row's K/V inside VMEM (~2.4 MB int8 + ~4.7 MB bf16 for a 30 s window):
per-step HBM traffic is the int8 read once, at any batch size.

Layout tricks:
  * block-diagonal query: the (D,) single-token query is expanded outside
    the kernel to ``qb (H_pad, D)`` with head h's slice in columns
    [h*dh, (h+1)*dh) and zeros elsewhere. Scores for ALL heads are then ONE
    (H_pad, D) x (T, D)^T matmul with full-width contraction (D=768) — no
    per-head slicing or lane-dim reshapes in the kernel. The wasted FLOPs
    (contracting over other heads' zero columns) are irrelevant: the step is
    bandwidth-bound, compute is <1% MXU.
  * head extraction by mask: the value matmul produces ``out (H_pad, D)``
    where row h's valid slice is its own dh columns; multiplying by the same
    0/1 head mask and summing over rows yields the merged (D,) output.
  * scale-encoded padding: T is padded to a lane multiple at quantization
    time (``quantize_cross_kv(pad_to=128)``) with ZERO k-scales; the kernel
    masks scores where ``k_s == 0``, so no separate length scalar is needed.

The reference has no analogue (HF generate with ``use_cache=False`` recomputes
the full decoder per token, /root/reference/scripts/train.py:209); this is
the TPU-native decode path's bandwidth-bound core.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qb_ref, k_ref, ks_ref, v_ref, vs_ref, mhd_ref, o_ref):
    """One batch row: qb (H_pad, D) bf16; k/v (T_pad, D) int8;
    ks/vs (1, T_pad) f32 (ks pre-folded with 1/sqrt(dh), 0 on padding);
    mhd (H_pad, D) 0/1 head mask; o (1, D)."""
    kd = k_ref[...].astype(qb_ref.dtype)
    s = jax.lax.dot_general(
        qb_ref[...], kd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H_pad, T_pad)
    ks = ks_ref[...]  # (1, T_pad)
    s = jnp.where(ks > 0.0, s * ks, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    # fold the value scale into the probabilities (same op order as the XLA
    # path in models.whisper._attention_quant_cross, for logit parity)
    pv = (p * vs_ref[...]).astype(qb_ref.dtype)
    vd = v_ref[...].astype(qb_ref.dtype)
    out = jax.lax.dot_general(
        pv, vd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (H_pad, D)
    o_ref[...] = jnp.sum(
        out * mhd_ref[...], axis=0, keepdims=True
    ).astype(o_ref.dtype)


def _head_mask(n_heads: int, h_pad: int, d: int) -> np.ndarray:
    dh = d // n_heads
    m = np.zeros((h_pad, d), np.float32)
    for h in range(n_heads):
        m[h, h * dh:(h + 1) * dh] = 1.0
    return m


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def quant_cross_attention_step(
    q: jax.Array,        # (B, 1, D) — single decode-step query
    k_q: jax.Array,      # (B, T_pad, D) int8
    k_s: jax.Array,      # (B, 1, T_pad) f32, 0 on padded positions
    v_q: jax.Array,      # (B, T_pad, D) int8
    v_s: jax.Array,      # (B, 1, T_pad) f32
    n_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Merged-head single-token cross attention; returns (B, 1, D)."""
    b, t_pad, d = k_q.shape
    dh = d // n_heads
    h_pad = ((n_heads + 15) // 16) * 16  # bf16 sublane tile
    mhd = jnp.asarray(_head_mask(n_heads, h_pad, d), q.dtype)

    # block-diagonal query expansion: (B, H_pad, D)
    qb = q[:, 0, :][:, None, :] * mhd[None]
    ks = k_s * jnp.float32(1.0 / math.sqrt(dh))

    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, h_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, t_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, t_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, t_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, t_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((h_pad, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, 1, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), q.dtype),
        interpret=interpret,
    )(qb, k_q, ks, v_q, v_s, mhd)
    return out


def _kernel_indexed(l_ref, qb_ref, k_ref, ks_ref, v_ref, vs_ref, mhd_ref, o_ref):
    del l_ref  # consumed by the index maps (scalar prefetch)
    _kernel(qb_ref, k_ref, ks_ref, v_ref, vs_ref, mhd_ref, o_ref)


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def quant_cross_attention_step_indexed(
    q: jax.Array,        # (B, 1, D) — single decode-step query
    k_q: jax.Array,      # (L, B, T_pad, D) int8 — ALL layers, unsliced
    k_s: jax.Array,      # (L, B, 1, T_pad) f32
    v_q: jax.Array,      # (L, B, T_pad, D) int8
    v_s: jax.Array,      # (L, B, 1, T_pad) f32
    layer,               # traced int32 scalar — which layer's K/V to read
    n_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Layer-indexed variant for the scan-over-layers decode step.

    Passing the stacked (L, ...) K/V through ``lax.scan``'s xs makes XLA
    materialize a dynamic-slice COPY of each layer's 2x(B, T, D) int8 slab
    every layer of every decode step before the kernel can read it — at
    whisper-small batch 64 those copies alone are ~68 GB per 32-token call,
    more HBM traffic than the attention itself (docs/PERF.md round 2b). Here
    the full arrays stay put and a scalar-prefetch index map points each
    grid cell's DMA at (layer, row) directly — zero copies."""
    _, b, t_pad, d = k_q.shape
    dh = d // n_heads
    h_pad = ((n_heads + 15) // 16) * 16  # bf16 sublane tile
    mhd = jnp.asarray(_head_mask(n_heads, h_pad, d), q.dtype)

    qb = q[:, 0, :][:, None, :] * mhd[None]
    ks = k_s * jnp.float32(1.0 / math.sqrt(dh))
    li = jnp.reshape(jnp.asarray(layer, jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, h_pad, d), lambda i, l: (i, 0, 0)),
            pl.BlockSpec((None, None, t_pad, d), lambda i, l: (l[0], i, 0, 0)),
            pl.BlockSpec((None, None, 1, t_pad), lambda i, l: (l[0], i, 0, 0)),
            pl.BlockSpec((None, None, t_pad, d), lambda i, l: (l[0], i, 0, 0)),
            pl.BlockSpec((None, None, 1, t_pad), lambda i, l: (l[0], i, 0, 0)),
            pl.BlockSpec((h_pad, d), lambda i, l: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, 1, d), lambda i, l: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _kernel_indexed,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, d), q.dtype),
        interpret=interpret,
    )(li, qb, k_q, ks, v_q, v_s, mhd)
    return out
