"""Fused decoder-step Pallas kernels.

Single-token decode is overhead-bound, not FLOPs-bound: one whisper-small
step is ~300 tiny XLA ops at ~10 µs each (measured on this platform). These
kernels collapse each decoder layer's step into THREE pallas calls:

  K1 self_attn_step : ln -> qkv -> cache write at slot t -> masked attention
                      over the cache -> output proj -> residual
  K2 cross_attn_step: ln -> q -> attention over the (B, Ta, D) encoder K/V
                      (grid over batch rows; each cell streams its 4.6 MB
                      K/V slice through VMEM) -> output proj -> residual
  K3 mlp_step       : ln -> fc1 -> gelu -> fc2 -> residual

Multi-head math uses per-head static slices (D -> H x 64) unrolled in the
kernel — no reshapes Mosaic would have to re-tile. All softmax/ln statistics
in f32; matmuls hit the MXU in the model compute dtype.

Used by the decode loops when ``WhisperConfig.fused_decode_step`` is set; the
reference path (`models.whisper.decode_tokens`) stays the semantic ground
truth and the equivalence is pinned by tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32_MIN = jnp.finfo(jnp.float32).min


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf approximation (|err| < 1.5e-7) —
    Mosaic has no erf/erfc lowering."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _ln(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _self_attn_kernel(
    slot_ref,  # scalar prefetch: (1,) current cache slot
    x_ref, ln_s_ref, ln_b_ref, wq_ref, bq_ref, wk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, cache_k_ref, cache_v_ref, key_mask_ref,
    x_out_ref, k_out_ref, v_out_ref,
    *, n_heads: int,
):
    """One cell, whole batch. x (B, D); cache (B, T, D); key_mask (B, T)."""
    slot = slot_ref[0]
    x = x_ref[...]
    b, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)

    a = _ln(x, ln_s_ref[...], ln_b_ref[...]).astype(x.dtype)
    q = jax.lax.dot_general(a, wq_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bq_ref[...].astype(jnp.float32)
    k_new = jax.lax.dot_general(a, wk_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    v_new = jax.lax.dot_general(a, wv_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) + bv_ref[...].astype(jnp.float32)

    # cache update at the current slot: masked select over the full buffer
    # (a dynamic store into the middle dim crashes the Mosaic compiler; the
    # whole cache lives in VMEM so the select is ~free)
    old_k = cache_k_ref[...]
    old_v = cache_v_ref[...]
    t = old_k.shape[1]
    slot_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, t, 1), 1) == slot
    )  # (B, T, 1)
    ck_upd = jnp.where(slot_mask, k_new[:, None, :].astype(old_k.dtype), old_k)
    cv_upd = jnp.where(slot_mask, v_new[:, None, :].astype(old_v.dtype), old_v)
    k_out_ref[...] = ck_upd
    v_out_ref[...] = cv_upd

    ck = ck_upd.astype(jnp.float32)  # (B, T, D) incl. the new token
    cv = cv_upd.astype(jnp.float32)
    key_slot = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    valid = (key_slot <= slot) & key_mask_ref[...]

    heads = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, sl]                       # (B, dh)
        kh = ck[:, :, sl]                   # (B, T, dh)
        vh = cv[:, :, sl]
        s = jnp.sum(kh * qh[:, None, :], axis=-1) * scale  # (B, T)
        s = jnp.where(valid, s, _F32_MIN)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads.append(jnp.sum(p[:, :, None] * vh, axis=1))  # (B, dh)
    out = jnp.concatenate(heads, axis=1)  # (B, D)

    proj = jax.lax.dot_general(out.astype(x.dtype), wo_ref[...],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    x_out_ref[...] = (x.astype(jnp.float32) + proj
                      + bo_ref[...].astype(jnp.float32)).astype(x_out_ref.dtype)


def _cross_attn_kernel(
    x_ref, ln_s_ref, ln_b_ref, wq_ref, bq_ref, wo_ref, bo_ref,
    ck_ref, cv_ref, x_out_ref, *, n_heads: int,
):
    """Grid over batch rows; x/x_out are the FULL (B, D) buffers (the TPU
    grid is sequential, so each cell updates only its own row — the
    "revisiting" pattern), ck/cv are this row's (1, Ta, D) K/V block.
    Row extraction/update is done by masked select: dynamic sublane slices
    crash the Mosaic compiler."""
    i = pl.program_id(0)
    x_all = x_ref[...]  # (B, D)
    bsz, d = x_all.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (bsz, 1), 0)
    is_row = row_ids == i  # (B, 1)
    # extract row i as (1, D): masked sum collapses the batch dim
    x = jnp.sum(jnp.where(is_row, x_all.astype(jnp.float32), 0.0), axis=0,
                keepdims=True).astype(x_all.dtype)
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)

    a = _ln(x, ln_s_ref[...], ln_b_ref[...]).astype(x.dtype)
    q = jax.lax.dot_general(a, wq_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bq_ref[...].astype(jnp.float32)

    ck = ck_ref[0]  # (Ta, D)
    cv = cv_ref[0]
    heads = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        kh = ck[:, sl].astype(jnp.float32)  # (Ta, dh)
        # VPU multiply-reduce (an (Ta, 1)-shaped MXU matmul trips a Mosaic
        # broadcast verification bug with mixed dtypes)
        s = jnp.sum(kh * q[:, sl], axis=-1, keepdims=True) * scale  # (Ta, 1)
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=0, keepdims=True)
        heads.append(jax.lax.dot_general(
            p.astype(cv.dtype), cv[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))  # (1, dh)
    out = jnp.concatenate(heads, axis=1)  # (1, D)

    proj = jax.lax.dot_general(out.astype(x.dtype), wo_ref[...],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    new_row = (x.astype(jnp.float32) + proj
               + bo_ref[...].astype(jnp.float32)).astype(x_out_ref.dtype)

    # first cell seeds the output buffer; later cells read-modify-write
    @pl.when(i == 0)
    def _():
        x_out_ref[...] = x_all

    cur = x_out_ref[...]
    x_out_ref[...] = jnp.where(is_row, jnp.broadcast_to(new_row, cur.shape), cur)


def _mlp_kernel(x_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                x_out_ref):
    x = x_ref[...]
    a = _ln(x, ln_s_ref[...], ln_b_ref[...]).astype(x.dtype)
    h = jax.lax.dot_general(a, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    # exact-form gelu via the polynomial erf (matches jax.nn.gelu(exact) to
    # ~1e-7, far below bf16 resolution)
    h = (0.5 * h * (1.0 + _erf(h * 0.7071067811865476))).astype(x.dtype)
    o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    x_out_ref[...] = (x.astype(jnp.float32) + o
                      + b2_ref[...].astype(jnp.float32)).astype(x_out_ref.dtype)


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def self_attn_step(x, blk, cache_k, cache_v, key_mask, slot, n_heads, interpret=False):
    """x (B, D) -> (x', cache_k', cache_v'). Caches are donated (aliased)."""
    b, d = x.shape
    slot_arr = jnp.asarray([slot], jnp.int32) if not hasattr(slot, "dtype") else slot.reshape(1)
    return pl.pallas_call(
        functools.partial(_self_attn_kernel, n_heads=n_heads),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[_vmem()] * 13,
            out_specs=[_vmem()] * 3,
        ),
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # alias cache buffers (indices include the scalar-prefetch arg:
        # 0=slot, 1=x, ..., 11=cache_k, 12=cache_v)
        input_output_aliases={11: 1, 12: 2},
        interpret=interpret,
    )(
        slot_arr, x,
        blk["sa_ln"]["scale"], blk["sa_ln"]["bias"],
        blk["sa"]["wq"], blk["sa"]["bq"], blk["sa"]["wk"],
        blk["sa"]["wv"], blk["sa"]["bv"], blk["sa"]["wo"], blk["sa"]["bo"],
        cache_k, cache_v, key_mask,
    )


def cross_attn_step(x, blk, cross_k, cross_v, n_heads, interpret=False):
    """x (B, D); cross_k/v (B, Ta, D) -> x'."""
    b, d = x.shape
    ta = cross_k.shape[1]
    return pl.pallas_call(
        functools.partial(_cross_attn_kernel, n_heads=n_heads),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _vmem(), _vmem(), _vmem(), _vmem(), _vmem(), _vmem(),
            pl.BlockSpec((1, ta, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ta, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            # double-buffered (1, Ta, D) K/V slices put the default 16M scoped
            # limit 144K over; v5e has headroom above the default
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x, blk["ca_ln"]["scale"], blk["ca_ln"]["bias"],
        blk["ca"]["wq"], blk["ca"]["bq"], blk["ca"]["wo"], blk["ca"]["bo"],
        cross_k, cross_v,
    )


def mlp_step(x, blk, interpret=False):
    return pl.pallas_call(
        _mlp_kernel,
        in_specs=[_vmem()] * 7,
        out_specs=_vmem(),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(
        x, blk["mlp_ln"]["scale"], blk["mlp_ln"]["bias"],
        blk["mlp"]["w1"], blk["mlp"]["b1"], blk["mlp"]["w2"], blk["mlp"]["b2"],
    )


def fused_decode_step(
    params,
    cfg,
    token: jax.Array,        # (B,) int32 — the token to process
    positions: jax.Array,    # (B,) int32 position ids (pos_emb lookup)
    slot,                    # scalar int32 — cache slot to write
    cache: dict,             # {"k","v"}: (L, B, T, D)
    cross_kv,                # (ck, cv): (L, B, Ta, D)
    key_mask: jax.Array,     # (B, T) bool
    interpret: bool = False,
):
    """One decode step through all layers with fused per-layer kernels.
    Returns (logits (B, V) f32, new_cache). Semantically identical to
    ``models.whisper.decode_tokens`` in cached single-token mode."""
    dec = params["decoder"]
    if isinstance(dec["token_emb"], dict) or isinstance(
        dec["self_attn"]["wq"], dict
    ):
        raise NotImplementedError(
            "fused_decode_step does not support int8-quantized decoder weights"
        )
    dt = cfg.compute_dtype
    x = (dec["token_emb"][token] + dec["pos_emb"][positions]).astype(dt)  # (B, D)

    cross_k, cross_v = cross_kv
    new_k, new_v = [], []
    for l in range(cfg.n_text_layers):
        blk = {
            "sa_ln": {k: v[l] for k, v in dec["self_attn_ln"].items()},
            "sa": {k: v[l] for k, v in dec["self_attn"].items()},
            "ca_ln": {k: v[l] for k, v in dec["cross_attn_ln"].items()},
            "ca": {k: v[l] for k, v in dec["cross_attn"].items()},
            "mlp_ln": {k: v[l] for k, v in dec["mlp_ln"].items()},
            "mlp": {k: v[l] for k, v in dec["mlp"].items()},
        }
        x, ck_l, cv_l = self_attn_step(
            x, blk, cache["k"][l], cache["v"][l], key_mask, slot,
            cfg.n_heads, interpret,
        )
        new_k.append(ck_l)
        new_v.append(cv_l)
        x = cross_attn_step(
            x, blk, cross_k[l].astype(dt), cross_v[l].astype(dt),
            cfg.n_heads, interpret,
        )
        x = mlp_step(x, blk, interpret)

    from ..models.whisper import layer_norm

    x = layer_norm(x, dec["ln"]["scale"], dec["ln"]["bias"])
    proj = params.get("proj_out", dec["token_emb"])
    logits = jnp.dot(x, proj.astype(x.dtype).T,
                     preferred_element_type=jnp.float32)
    new_cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}
    return logits.astype(jnp.float32), new_cache
