"""Functional JAX Whisper encoder/decoder.

A from-scratch, TPU-first implementation of the Whisper architecture the
reference drives through HF ``WhisperModel`` (models/whisper_medical.py:18,93):

  * pure functions over a params pytree — no module framework, so sharding
    annotations, remat, and scan-over-layers compose directly
  * transformer blocks are *stacked* along a leading layer axis and driven by
    ``lax.scan`` (O(1) compile time in depth, remat-friendly)
  * attention/MLP matmuls run in bf16 on the MXU (configurable), layer norms
    and softmax in f32
  * the decoder supports full-sequence (training / prefix prefill) and
    single-step cached modes over a preallocated KV cache with static shapes,
    ready for ``lax.while_loop`` decoding (decode/greedy.py)

Weight layout notes: linear weights are stored (in, out); conv stems (W, I, O);
the output projection is the token embedding transposed (tied, as in
openai/whisper-base.en — the reference's ``proj_out`` is tied via
``_tied_weights_keys``, models/whisper_medical.py:14) unless an untied
``proj_out`` entry is present in the params.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from .config import WhisperConfig

Params = dict[str, Any]


def _acc(x) -> jnp.dtype:
    """Matmul accumulator dtype: f32, widened when operands are wider."""
    return x.dtype if jnp.dtype(x.dtype).itemsize > 4 else jnp.float32


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------

def sinusoids(length: int, channels: int) -> np.ndarray:
    """Fixed sinusoidal position embeddings (public Whisper formula)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def _dense_init(key, shape, scale=None):
    fan_in = shape[-2] if len(shape) >= 2 else shape[0]
    scale = scale if scale is not None else 1.0 / math.sqrt(fan_in)
    return jax.random.normal(key, shape, dtype=jnp.float32) * scale


def _attn_params(key, n_layers, d):
    ks = jax.random.split(key, 7)
    return {
        "wq": _dense_init(ks[0], (n_layers, d, d)),
        "bq": jnp.zeros((n_layers, d)),
        "wk": _dense_init(ks[1], (n_layers, d, d)),  # no k bias in Whisper
        "wv": _dense_init(ks[2], (n_layers, d, d)),
        "bv": jnp.zeros((n_layers, d)),
        "wo": _dense_init(ks[3], (n_layers, d, d)),
        "bo": jnp.zeros((n_layers, d)),
    }


def _ln_params(n_layers, d):
    return {"scale": jnp.ones((n_layers, d)), "bias": jnp.zeros((n_layers, d))}


def _mlp_params(key, n_layers, d):
    k1, k2 = jax.random.split(key)
    return {
        "w1": _dense_init(k1, (n_layers, d, 4 * d)),
        "b1": jnp.zeros((n_layers, 4 * d)),
        "w2": _dense_init(k2, (n_layers, 4 * d, d)),
        "b2": jnp.zeros((n_layers, d)),
    }


def init_params(cfg: WhisperConfig, key: jax.Array | int = 0) -> Params:
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    ke, kd = jax.random.split(key)
    ke1, ke2, ke3, ke4 = jax.random.split(ke, 4)
    kd1, kd2, kd3, kd4 = jax.random.split(kd, 4)
    d = cfg.d_model
    enc = {
        "conv1": {"w": _dense_init(ke1, (3, cfg.n_mels, d)), "b": jnp.zeros((d,))},
        "conv2": {"w": _dense_init(ke2, (3, d, d)), "b": jnp.zeros((d,))},
        "pos_emb": jnp.asarray(sinusoids(cfg.n_audio_ctx, d)),
        "attn_ln": _ln_params(cfg.n_audio_layers, d),
        "attn": _attn_params(ke3, cfg.n_audio_layers, d),
        "mlp_ln": _ln_params(cfg.n_audio_layers, d),
        "mlp": _mlp_params(ke4, cfg.n_audio_layers, d),
        "ln_post": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    dec = {
        "token_emb": _dense_init(kd1, (cfg.n_vocab, d), scale=0.02),
        "pos_emb": _dense_init(kd2, (cfg.n_text_ctx, d), scale=0.02),
        "self_attn_ln": _ln_params(cfg.n_text_layers, d),
        "self_attn": _attn_params(kd3, cfg.n_text_layers, d),
        "cross_attn_ln": _ln_params(cfg.n_text_layers, d),
        "cross_attn": _attn_params(jax.random.fold_in(kd3, 1), cfg.n_text_layers, d),
        "mlp_ln": _ln_params(cfg.n_text_layers, d),
        "mlp": _mlp_params(kd4, cfg.n_text_layers, d),
        "ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """LayerNorm in f32 regardless of compute dtype."""
    dt = x.dtype
    ft = _acc(x)
    x = x.astype(ft)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * scale.astype(ft) + bias.astype(ft)).astype(dt)


def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def attention(
    q: jax.Array,  # (B, Tq, D)
    k: jax.Array,  # (B, Tk, D)
    v: jax.Array,  # (B, Tk, D)
    n_heads: int,
    mask: jax.Array | None = None,  # broadcastable to (B, H, Tq, Tk), True=attend
) -> jax.Array:
    dh = q.shape[-1] // n_heads
    qh = _split_heads(q, n_heads)
    kh = _split_heads(k, n_heads)
    vh = _split_heads(v, n_heads)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=_acc(q)
    ) / math.sqrt(dh)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    w = jax.nn.softmax(scores.astype(_acc(q)), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh, preferred_element_type=_acc(q))
    return _merge_heads(out.astype(q.dtype))


def _proj(x, w, b=None):
    if isinstance(w, dict):  # int8 weight-only quantization {"q", "s"}
        y = jnp.einsum("btd,de->bte", x, w["q"].astype(x.dtype),
                       preferred_element_type=jnp.float32)
        y = (y * w["s"].astype(jnp.float32)).astype(x.dtype)
    else:
        y = jnp.einsum("btd,de->bte", x, w.astype(x.dtype),
                       preferred_element_type=_acc(x))
        y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _mlp(x, w1, b1, w2, b2, approximate=False):
    # name the 4*d-wide intermediates so remat="wide" can exclude exactly
    # these (the dominant saved-activation traffic) from the residual set;
    # checkpoint_name is the identity outside a jax.checkpoint policy
    h = checkpoint_name(_proj(x, w1, b1), "mlp_wide")
    h = checkpoint_name(jax.nn.gelu(h, approximate=approximate), "mlp_wide")
    return _proj(h, w2, b2)


def _ln_qkv(h, ln, attn, cfg):
    """Pre-attention LayerNorm + QKV projections -> (q, k, v).

    With ``cfg.fused_ln_qkv`` the three projections run as ONE fused
    LN+matmul Pallas pass over h (ops/fused_block.py: the normalized tensor
    never reaches HBM and the MXU sees one 3d-wide matmul instead of three
    d-wide ones). Int8-quantized weights keep the XLA path."""
    if cfg.fused_ln_qkv and not isinstance(attn["wq"], dict):
        from ..ops.fused_block import fused_ln_matmul

        d = h.shape[-1]
        w = jnp.concatenate([attn["wq"], attn["wk"], attn["wv"]], axis=-1)
        b = jnp.concatenate(  # k has no bias (Whisper convention)
            [attn["bq"], jnp.zeros((d,), attn["bq"].dtype), attn["bv"]])
        qkv = fused_ln_matmul(h, ln["scale"], ln["bias"], w.astype(h.dtype),
                              b, interpret=cfg.flash_interpret)
        return qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]
    a = layer_norm(h, ln["scale"], ln["bias"])
    return (_proj(a, attn["wq"], attn["bq"]), _proj(a, attn["wk"]),
            _proj(a, attn["wv"], attn["bv"]))


def _ln_proj(h, ln, w, b, cfg):
    """LayerNorm + one projection (the cross-attention query path)."""
    if cfg.fused_ln_qkv and not isinstance(w, dict):
        from ..ops.fused_block import fused_ln_matmul

        return fused_ln_matmul(h, ln["scale"], ln["bias"], w.astype(h.dtype),
                               b, interpret=cfg.flash_interpret)
    return _proj(layer_norm(h, ln["scale"], ln["bias"]), w, b)


def _ln_mlp(h, ln, mlp, cfg):
    """Pre-MLP LayerNorm + MLP. With ``cfg.fused_ln_mlp`` the LN, first
    matmul, bias, and gelu run as one fused Pallas pass: neither the
    normalized input nor the (N, 4d) pre-activation is materialized. The
    post-gelu output keeps the "mlp_wide" checkpoint name so remat="wide"
    semantics are unchanged."""
    if cfg.fused_ln_mlp and not isinstance(mlp["w1"], dict):
        from ..ops.fused_block import fused_ln_matmul

        wide = checkpoint_name(
            fused_ln_matmul(h, ln["scale"], ln["bias"],
                            mlp["w1"].astype(h.dtype), mlp["b1"],
                            act="gelu_tanh" if cfg.gelu_approx else "gelu",
                            interpret=cfg.flash_interpret),
            "mlp_wide")
        return _proj(wide, mlp["w2"], mlp["b2"])
    m = layer_norm(h, ln["scale"], ln["bias"])
    return _mlp(m, mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"],
                cfg.gelu_approx)


def _layer_slice(tree, i):
    return jax.tree.map(lambda a: a[i], tree)



def _remat(block, cfg: WhisperConfig):
    """Apply the configured rematerialization policy to a scan block."""
    if cfg.remat == "full":
        return jax.checkpoint(block)
    if cfg.remat == "dots":
        return jax.checkpoint(
            block, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    if cfg.remat == "wide":
        # save everything EXCEPT the 4*d-wide MLP intermediates: the flash
        # residuals stay resident (no attention recompute in backward), and
        # only the w1 matmul + gelu re-run — a middle point between "none"
        # (stores the wides) and "full" (recomputes the whole block)
        return jax.checkpoint(
            block,
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                "mlp_wide"
            ),
        )
    if cfg.remat == "none":
        return block
    raise ValueError(f"unknown remat policy {cfg.remat!r}")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array, stride: int) -> jax.Array:
    """x: (B, T, C_in), w: (W, I, O) -> (B, T/stride, O), SAME padding."""
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w,
        window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=_acc(w),
    )
    return y.astype(x.dtype) + b.astype(x.dtype)


def encode_audio(params: Params, cfg: WhisperConfig, mel: jax.Array) -> jax.Array:
    """mel: (B, n_mels, 3000) -> encoder states (B, 1500, D)."""
    enc = params["encoder"]
    dt = cfg.compute_dtype
    x = jnp.transpose(mel, (0, 2, 1)).astype(dt)  # (B, 3000, n_mels)
    x = jax.nn.gelu(_conv1d(x, enc["conv1"]["w"], enc["conv1"]["b"], 1),
                    approximate=cfg.gelu_approx)
    x = jax.nn.gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2),
                    approximate=cfg.gelu_approx)
    # slice positions: shorter (bucketed) audio contexts are supported for
    # short-utterance serving (docs/PERF.md encoder-state pruning)
    x = x + enc["pos_emb"][: x.shape[1]].astype(dt)

    blocks = {
        "attn_ln": enc["attn_ln"], "attn": enc["attn"],
        "mlp_ln": enc["mlp_ln"], "mlp": enc["mlp"],
    }

    def block(h, blk):
        q, k, v = _ln_qkv(h, blk["attn_ln"], blk["attn"], cfg)
        if cfg.flash_attention:
            from ..ops.flash_attention import flash_attention

            att = flash_attention(q, k, v, cfg.n_heads,
                                  block_q=cfg.flash_block_q,
                                  interpret=cfg.flash_interpret)
        else:
            att = attention(q, k, v, cfg.n_heads)
        h = h + _proj(att, blk["attn"]["wo"], blk["attn"]["bo"])
        h = h + _ln_mlp(h, blk["mlp_ln"], blk["mlp"], cfg)
        return h, None

    block = _remat(block, cfg)  # remat: trade FLOPs for HBM in training
    x, _ = jax.lax.scan(block, x, blocks)
    return layer_norm(x, enc["ln_post"]["scale"], enc["ln_post"]["bias"])


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def precompute_cross_kv(params: Params, cfg: WhisperConfig, enc_out: jax.Array):
    """Cross-attention K/V for all layers: each (L, B, T_audio, D)."""
    dec = params["decoder"]

    def per_layer(blk):
        k = _proj(enc_out, blk["wk"])
        v = _proj(enc_out, blk["wv"], blk["bv"])
        return k, v

    return jax.lax.map(per_layer, dec["cross_attn"])


def quantize_cross_kv(cross_kv, pad_to: int = 128) -> dict:
    """Per-position int8 quantization of the cross-attention K/V.

    Single-token decode is HBM-bound on streaming the (L, B, Ta, D) cross K/V
    every step (~28 GB per whisper-small batch-16 decode call); int8 halves
    that dominant traffic. Scales are per (layer, batch, position) rows,
    stored lane-major as (L, B, 1, T), and fold EXACTLY into the attention
    einsums (scores scale by k_s[t]; p is pre-scaled by v_s[t] before the
    value matmul), so no dequantized tensor is ever materialized.

    T is padded to a multiple of ``pad_to`` (Pallas lane tiling for
    ops.quant_cross_attention) with ZERO scales — a zero k-scale marks a
    padded position, and both attention paths mask on it."""
    k, v = cross_kv
    t = k.shape[2]
    t_pad = ((t + pad_to - 1) // pad_to) * pad_to if pad_to else t

    def q(x):
        xf = x.astype(jnp.float32)
        scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-8)
        xq = jnp.round(xf / scale).astype(jnp.int8)
        scale = jnp.swapaxes(scale, -1, -2)  # (L, B, 1, T)
        if t_pad != t:
            xq = jnp.pad(xq, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
            scale = jnp.pad(scale, ((0, 0), (0, 0), (0, 0), (0, t_pad - t)))
        return xq, scale

    k_q, k_s = q(k)
    v_q, v_s = q(v)
    return {"k_q": k_q, "k_s": k_s, "v_q": v_q, "v_s": v_s}


def _attention_quant_cross(q, kv, n_heads):
    """Cross attention against int8 K/V.
    q: (B, S, D); kv leaves: k_q/v_q (B, T_pad, D) int8, k_s/v_s (B, 1, T_pad)
    f32 with ZERO scale marking padded audio positions (masked to -inf)."""
    dh = q.shape[-1] // n_heads
    qh = _split_heads(q, n_heads)
    kh = _split_heads(kv["k_q"].astype(q.dtype), n_heads)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    )
    k_s = kv["k_s"][:, None, :, :]  # (B, 1, 1, T_pad)
    scores = jnp.where(
        k_s > 0.0,
        scores * (k_s / math.sqrt(dh)),
        jnp.finfo(jnp.float32).min,
    )
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    # fold the value scale into the probabilities
    w = (w * kv["v_s"][:, None, :, :]).astype(q.dtype)
    vh = _split_heads(kv["v_q"].astype(q.dtype), n_heads)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh, preferred_element_type=jnp.float32)
    return _merge_heads(out.astype(q.dtype))


def quantize_decoder_weights(params: Params) -> Params:
    """Weight-only int8 for the decoder (decode-time only — not
    differentiable): matmul weights get per-output-column scales, the token
    embedding per-row scales. Decoder weights are ~240 MB bf16 for
    whisper-small and are re-read from HBM every decode step."""

    def q_cols(w):  # (..., D, E): scale per output column
        wf = jnp.asarray(w, jnp.float32)
        s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-8)
        return {"q": jnp.round(wf / s).astype(jnp.int8), "s": s}

    def q_rows(w):  # (V, D): scale per row
        wf = jnp.asarray(w, jnp.float32)
        s = jnp.max(jnp.abs(wf), axis=-1, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-8)
        return {"q": jnp.round(wf / s).astype(jnp.int8), "s": s}

    dec = dict(params["decoder"])
    for grp in ("self_attn", "cross_attn"):
        g = dict(dec[grp])
        for name in ("wq", "wk", "wv", "wo"):
            g[name] = q_cols(g[name])
        dec[grp] = g
    mlp = dict(dec["mlp"])
    mlp["w1"] = q_cols(mlp["w1"])
    mlp["w2"] = q_cols(mlp["w2"])
    dec["mlp"] = mlp
    dec["token_emb"] = q_rows(dec["token_emb"])
    out = dict(params, decoder=dec)
    if "proj_out" in params:
        out["proj_out"] = q_rows(params["proj_out"])
    return out


def init_kv_cache(cfg: WhisperConfig, batch: int, max_len: int):
    shape = (cfg.n_text_layers, batch, max_len, cfg.d_model)
    dt = cfg.compute_dtype
    return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}


def decode_tokens(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,          # (B, S) int32
    enc_out: jax.Array | None = None,   # (B, T_audio, D); or pass cross_kv
    cross_kv=None,              # precomputed (k, v), each (L, B, T_audio, D)
    cache=None,                 # KV cache dict or None (plain full-sequence mode)
    pos_offset: int | jax.Array = 0,    # write/read position of tokens[:, 0];
                                        # scalar, or (B,) for per-row offsets
                                        # (speculative decode: rows advance
                                        # at different rates)
    token_positions: jax.Array | None = None,  # (B, S) explicit positions (left-pad support)
    self_mask: jax.Array | None = None,  # extra mask, True=attend:
                                         # (B, T_cache) key-side, or
                                         # (B, S, T_cache) per-query (trees)
    return_hidden: bool = False,  # also return the final-LN decoder states
):
    """Decoder forward.

    Full-sequence mode (cache=None): causal self-attention over ``tokens``.
    Cached mode: keys/values are written into ``cache`` at
    ``pos_offset..pos_offset+S`` and attention spans the whole cache with
    positions > current masked; returns (logits, new_cache).
    """
    dec = params["decoder"]
    dt = cfg.compute_dtype
    b, s = tokens.shape

    per_row_offset = getattr(pos_offset, "ndim", 0) == 1
    if token_positions is None:
        if per_row_offset:
            token_positions = pos_offset[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
        else:
            token_positions = pos_offset + jnp.arange(s, dtype=jnp.int32)[None, :]
    emb = dec["token_emb"]
    if isinstance(emb, dict):  # int8 rows, per-row scale
        tok_e = emb["q"][tokens].astype(jnp.float32) * emb["s"][tokens]
    else:
        tok_e = emb[tokens]
    x = tok_e.astype(dt) + dec["pos_emb"][token_positions].astype(dt)

    if cross_kv is None:
        if enc_out is None:
            raise ValueError("need enc_out or cross_kv")
        cross_kv = precompute_cross_kv(params, cfg, enc_out)
    quantized_cross = isinstance(cross_kv, dict)
    if quantized_cross:
        cross_k = cross_v = None
    else:
        cross_k, cross_v = cross_kv

    blocks = {
        "sa_ln": dec["self_attn_ln"], "sa": dec["self_attn"],
        "ca_ln": dec["cross_attn_ln"], "ca": dec["cross_attn"],
        "mlp_ln": dec["mlp_ln"], "mlp": dec["mlp"],
    }

    if cache is None:
        if quantized_cross:
            raise ValueError("quantized cross-KV is decode-only (cached mode)")
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if cfg.flash_attention and cfg.flash_decoder and s >= cfg.flash_decoder_min_seq:
            from ..ops.flash_attention import flash_attention

            def _self_attn(q, k, v):
                return flash_attention(q, k, v, cfg.n_heads, causal=True,
                                       block_q=min(cfg.flash_block_q, 256),
                                       interpret=cfg.flash_interpret)

            def _cross_attn(q, k, v):
                return flash_attention(q, k, v, cfg.n_heads,
                                       block_q=min(cfg.flash_block_q, 256),
                                       interpret=cfg.flash_interpret)
        else:
            def _self_attn(q, k, v):
                return attention(q, k, v, cfg.n_heads, causal)

            def _cross_attn(q, k, v):
                return attention(q, k, v, cfg.n_heads)

        def block(h, xs):
            blk = xs
            q, k, v = _ln_qkv(h, blk["sa_ln"], blk["sa"], cfg)
            h = h + _proj(_self_attn(q, k, v), blk["sa"]["wo"], blk["sa"]["bo"])
            cq = _ln_proj(h, blk["ca_ln"], blk["ca"]["wq"], blk["ca"]["bq"], cfg)
            h = h + _proj(_cross_attn(cq, blk["ck"], blk["cv"]), blk["ca"]["wo"], blk["ca"]["bo"])
            h = h + _ln_mlp(h, blk["mlp_ln"], blk["mlp"], cfg)
            return h, None

        xs = dict(blocks, ck=cross_k.astype(dt), cv=cross_v.astype(dt))
        block = _remat(block, cfg)
        x, _ = jax.lax.scan(block, x, xs)
        new_cache = None
    else:
        t_cache = cache["k"].shape[2]
        # causal over cache *slots* (slot i holds token i of the padded
        # sequence; position ids may lag slots under left-padding, so the
        # mask must compare slots, not positions)
        key_slot = jnp.arange(t_cache, dtype=jnp.int32)
        if per_row_offset:
            query_slot = pos_offset[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
            attn_mask = key_slot[None, None, :] <= query_slot[:, :, None]  # (B, S, T)
        else:
            query_slot = pos_offset + jnp.arange(s, dtype=jnp.int32)
            attn_mask = key_slot[None, None, :] <= query_slot[None, :, None]  # (1, S, T)
        if self_mask is not None:
            # (B, T): key-side mask shared by all queries (left-pad support).
            # (B, S, T): per-query mask — tree/chain verification, where
            # sibling proposal slots must be invisible to each other
            # (decode/medusa.py chain mode)
            sm = self_mask if self_mask.ndim == 3 else self_mask[:, None, :]
            attn_mask = attn_mask & sm
        else:
            attn_mask = jnp.broadcast_to(attn_mask, (b, s, t_cache))
        attn_mask = attn_mask[:, None]  # (B, 1, S, T_cache) -> broadcast heads

        def block(h, xs):
            blk = xs
            a = layer_norm(h, blk["sa_ln"]["scale"], blk["sa_ln"]["bias"])
            q = _proj(a, blk["sa"]["wq"], blk["sa"]["bq"])
            k_new = _proj(a, blk["sa"]["wk"])
            v_new = _proj(a, blk["sa"]["wv"], blk["sa"]["bv"])
            # index dtypes must agree even under jax_enable_x64 (traced
            # pos_offset is int32; bare 0 literals would become int64)
            zero = jnp.int32(0)
            off = jnp.asarray(pos_offset, jnp.int32)
            if per_row_offset:
                # rows write at independent slots (speculative decode)
                def _row_upd(c, new, o):
                    return jax.lax.dynamic_update_slice(c, new, (o, zero))

                ck_upd = jax.vmap(_row_upd)(
                    blk["cache_k"], k_new.astype(blk["cache_k"].dtype), off)
                cv_upd = jax.vmap(_row_upd)(
                    blk["cache_v"], v_new.astype(blk["cache_v"].dtype), off)
            else:
                ck_upd = jax.lax.dynamic_update_slice(
                    blk["cache_k"], k_new.astype(blk["cache_k"].dtype), (zero, off, zero)
                )
                cv_upd = jax.lax.dynamic_update_slice(
                    blk["cache_v"], v_new.astype(blk["cache_v"].dtype), (zero, off, zero)
                )
            h = h + _proj(
                attention(q, ck_upd.astype(dt), cv_upd.astype(dt), cfg.n_heads, attn_mask),
                blk["sa"]["wo"], blk["sa"]["bo"],
            )
            c = layer_norm(h, blk["ca_ln"]["scale"], blk["ca_ln"]["bias"])
            cq = _proj(c, blk["ca"]["wq"], blk["ca"]["bq"])
            if quantized_cross and s == 1 and cfg.fused_quant_cross:
                # Pallas kernel: per-batch-row dequant inside VMEM — avoids
                # the whole-batch bf16 KV spill that made batch>=32 decode
                # super-linear (docs/PERF.md round 2). The stacked K/V stay
                # OUT of the scan xs (a scalar-prefetch index map reads the
                # layer directly): slicing them per layer would copy ~68 GB
                # per batch-64 decode call (docs/PERF.md round 2b)
                from ..ops.quant_cross_attention import (
                    quant_cross_attention_step_indexed,
                )

                catt = quant_cross_attention_step_indexed(
                    cq, cross_kv["k_q"], cross_kv["k_s"],
                    cross_kv["v_q"], cross_kv["v_s"], blk["li"],
                    cfg.n_heads, interpret=cfg.flash_interpret,
                )
            elif quantized_cross:
                catt = _attention_quant_cross(cq, blk["ckv"], cfg.n_heads)
            else:
                catt = attention(cq, blk["ck"], blk["cv"], cfg.n_heads)
            h = h + _proj(catt, blk["ca"]["wo"], blk["ca"]["bo"])
            m = layer_norm(h, blk["mlp_ln"]["scale"], blk["mlp_ln"]["bias"])
            h = h + _mlp(m, blk["mlp"]["w1"], blk["mlp"]["b1"],
                         blk["mlp"]["w2"], blk["mlp"]["b2"], cfg.gelu_approx)
            return h, (ck_upd, cv_upd)

        if quantized_cross and s == 1 and cfg.fused_quant_cross:
            xs = dict(blocks, cache_k=cache["k"], cache_v=cache["v"],
                      li=jnp.arange(cfg.n_text_layers, dtype=jnp.int32))
        elif quantized_cross:
            xs = dict(blocks, ckv=cross_kv,
                      cache_k=cache["k"], cache_v=cache["v"])
        else:
            xs = dict(
                blocks,
                ck=cross_k.astype(dt), cv=cross_v.astype(dt),
                cache_k=cache["k"], cache_v=cache["v"],
            )
        x, (new_k, new_v) = jax.lax.scan(block, x, xs)
        new_cache = {"k": new_k, "v": new_v}

    x = layer_norm(x, dec["ln"]["scale"], dec["ln"]["bias"])
    logits = project_vocab(params, x)
    if return_hidden:
        # final-layernormed decoder states — the Medusa heads' input
        # (models/medusa.py); returned only on request to keep the common
        # path's output tuple stable
        return logits, new_cache, x
    return logits, new_cache


def project_vocab(params: Params, x: jax.Array) -> jax.Array:
    """Tied vocab projection of decoder states (B, S, D) -> (B, S, V).
    Operands stay in the compute dtype (bf16 in production — this is the
    largest per-step matmul), accumulation in f32+."""
    dec = params["decoder"]
    proj = params.get("proj_out", dec["token_emb"])
    ft = _acc(x)
    if isinstance(proj, dict):  # int8 rows, per-row scale
        logits = jnp.einsum(
            "btd,vd->btv", x, proj["q"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ) * proj["s"][:, 0]
        return logits.astype(ft)
    return jnp.einsum(
        "btd,vd->btv", x, proj.astype(x.dtype),
        preferred_element_type=ft,
    ).astype(ft)


def forward(
    params: Params,
    cfg: WhisperConfig,
    input_features: jax.Array,   # (B, n_mels, 3000)
    decoder_input_ids: jax.Array,  # (B, S)
) -> jax.Array:
    """Training forward: mel + teacher-forced tokens -> logits (B, S, V).
    Mirrors the reference model's forward contract
    (models/whisper_medical.py:45-111) minus the loss (train/loss.py)."""
    enc_out = encode_audio(params, cfg, input_features)
    logits, _ = decode_tokens(params, cfg, decoder_input_ids, enc_out=enc_out)
    return logits


def forward_hidden(
    params: Params,
    cfg: WhisperConfig,
    input_features: jax.Array,
    decoder_input_ids: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """``forward`` that also returns the final-LN decoder states (B, S, D)
    — the Medusa heads' training input (train/medusa.py)."""
    enc_out = encode_audio(params, cfg, input_features)
    logits, _, hid = decode_tokens(params, cfg, decoder_input_ids,
                                   enc_out=enc_out, return_hidden=True)
    return logits, hid
