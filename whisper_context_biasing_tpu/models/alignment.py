"""Cross-attention alignment matrices for word-level timestamps.

The reference has no timestamp capability at all (it pins
``GenerationConfig(max_length=225)`` text-only decoding,
/root/reference/scripts/train.py:204-210); this is serving surface matching
what openai-whisper/HF expose as word-level timestamps: a teacher-forced
decoder pass whose cross-attention weights, restricted to a set of
*alignment heads*, are normalized, median-filtered, head-averaged, and then
DTW-aligned (decode/word_timestamps.py) to map every decoded token to an
audio frame.

TPU design: the whole weights pipeline (softmax -> per-head column
normalization -> median filter -> masked head average) runs inside one
``lax.scan`` over decoder layers, so only the final (B, S, frames) matrix —
not the (L, B, H, S, frames) weight stack — ever leaves the device.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .config import WhisperConfig
from .whisper import (
    _acc,
    _merge_heads,
    _mlp,
    _proj,
    _split_heads,
    layer_norm,
    precompute_cross_kv,
    project_vocab,
)


def default_alignment_mask(cfg: WhisperConfig):
    """(L, H) f32 mask selecting all heads of the top half of decoder layers.

    The published per-model alignment-head sets are distribution assets of
    openai-whisper; absent those, the upper-half heuristic is the standard
    fallback (the top layers' cross attention is the most diagonal)."""
    L, H = cfg.n_text_layers, cfg.n_heads
    mask = jnp.zeros((L, H), jnp.float32)
    return mask.at[L - L // 2 :].set(1.0)


def heads_to_mask(cfg: WhisperConfig, heads) -> jax.Array:
    """[(layer, head), ...] -> (L, H) f32 mask."""
    mask = jnp.zeros((cfg.n_text_layers, cfg.n_heads), jnp.float32)
    for l, h in heads:
        mask = mask.at[l, h].set(1.0)
    return mask


def median_filter_time(w: jax.Array, width: int) -> jax.Array:
    """Median filter along the last (frame) axis, reflect-padded.

    Implemented as a sort over ``width`` shifted copies — ``width`` is small
    (default 7) and static, so XLA fuses this into a few vector ops."""
    if width <= 1:
        return w
    pad = width // 2
    wp = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(pad, pad)], mode="reflect")
    n = w.shape[-1]
    stack = jnp.stack([wp[..., i : i + n] for i in range(width)], axis=-1)
    return jnp.sort(stack, axis=-1)[..., pad]


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_frames", "medfilt_width",
                              "with_probs")
)
def alignment_matrix(
    params,
    cfg: WhisperConfig,
    tokens: jax.Array,        # (B, S) int32 — full sequences incl. prefix/eot
    enc_out: jax.Array,       # (B, T_audio, D)
    head_mask: jax.Array,     # (L, H) f32 — alignment head selection
    token_mask: jax.Array,    # (B, S) f32 — 1 for real tokens, 0 for padding
    *,
    num_frames: int,          # content frames (<= T_audio); static
    medfilt_width: int = 7,
    with_probs: bool = False,
) -> jax.Array:
    """Teacher-forced decoder pass returning the (B, S, num_frames) f32
    token-to-frame alignment matrix.

    Per alignment head: attention distribution over frames, standardized per
    frame column over the *valid* token rows (padding rows are excluded so a
    clip's matrix is identical however the batch is padded), median-filtered
    over frames, then averaged across the selected heads of every layer.

    ``with_probs=True`` additionally returns a (B, S) f32 array of
    ``P(tokens[t] | tokens[<t], audio)`` — the per-token probabilities of
    the observed sequence under the same pass (position 0 has no
    conditioning context and is fixed at 1.0). One extra vocab projection
    on states the pass already computed; feeds word-level confidence
    (decode/word_timestamps.py)."""
    dec = params["decoder"]
    dt = cfg.compute_dtype
    b, s = tokens.shape
    dh = cfg.head_dim

    emb = dec["token_emb"]
    if isinstance(emb, dict):  # int8 rows, per-row scale
        tok_e = emb["q"][tokens].astype(jnp.float32) * emb["s"][tokens]
    else:
        tok_e = emb[tokens]
    x = tok_e.astype(dt) + dec["pos_emb"][jnp.arange(s)][None].astype(dt)

    cross_k, cross_v = precompute_cross_kv(params, cfg, enc_out)
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
    tmask = token_mask.astype(jnp.float32)  # (B, S)
    n_valid = jnp.maximum(tmask.sum(axis=1), 1.0)  # (B,)

    def block(h, xs):
        blk = xs
        a = layer_norm(h, blk["sa_ln"]["scale"], blk["sa_ln"]["bias"])
        q = _proj(a, blk["sa"]["wq"], blk["sa"]["bq"])
        k = _proj(a, blk["sa"]["wk"])
        v = _proj(a, blk["sa"]["wv"], blk["sa"]["bv"])
        qh, kh, vh = (_split_heads(t, cfg.n_heads) for t in (q, k, v))
        sc = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=_acc(q)) / math.sqrt(dh)
        sc = jnp.where(causal, sc, jnp.finfo(sc.dtype).min)
        sw = jax.nn.softmax(sc.astype(_acc(q)), axis=-1).astype(dt)
        sa = _merge_heads(jnp.einsum("bhqk,bkhd->bqhd", sw, vh,
                                     preferred_element_type=_acc(q)).astype(dt))
        h = h + _proj(sa, blk["sa"]["wo"], blk["sa"]["bo"])

        c = layer_norm(h, blk["ca_ln"]["scale"], blk["ca_ln"]["bias"])
        cq = _proj(c, blk["ca"]["wq"], blk["ca"]["bq"])
        qh = _split_heads(cq, cfg.n_heads)
        kh = _split_heads(blk["ck"].astype(dt), cfg.n_heads)
        vh = _split_heads(blk["cv"].astype(dt), cfg.n_heads)
        sc = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / math.sqrt(dh)
        w = jax.nn.softmax(sc.astype(jnp.float32), axis=-1)  # (B, H, S, T)
        ca = _merge_heads(jnp.einsum("bhqk,bkhd->bqhd", w.astype(dt), vh,
                                     preferred_element_type=_acc(h)).astype(dt))
        h = h + _proj(ca, blk["ca"]["wo"], blk["ca"]["bo"])

        m = layer_norm(h, blk["mlp_ln"]["scale"], blk["mlp_ln"]["bias"])
        # same gelu variant as the serving forward pass: the alignment must
        # be a teacher-forced pass of the SAME network that decoded
        h = h + _mlp(m, blk["mlp"]["w1"], blk["mlp"]["b1"],
                     blk["mlp"]["w2"], blk["mlp"]["b2"], cfg.gelu_approx)

        # alignment contribution: standardize each (head, frame) column over
        # valid token rows, median-filter over frames, mask-sum over heads
        ww = w[..., :num_frames]  # (B, H, S, F)
        tm = tmask[:, None, :, None]
        mean = (ww * tm).sum(axis=-2, keepdims=True) / n_valid[:, None, None, None]
        var = (jnp.square(ww - mean) * tm).sum(axis=-2, keepdims=True) \
            / n_valid[:, None, None, None]
        wn = (ww - mean) * jax.lax.rsqrt(var + 1e-8)
        wn = median_filter_time(wn, medfilt_width)
        contrib = jnp.einsum("bhsf,h->bsf", wn, blk["hm"])
        return h, contrib

    xs = {
        "sa_ln": dec["self_attn_ln"], "sa": dec["self_attn"],
        "ca_ln": dec["cross_attn_ln"], "ca": dec["cross_attn"],
        "mlp_ln": dec["mlp_ln"], "mlp": dec["mlp"],
        "ck": cross_k, "cv": cross_v, "hm": head_mask,
    }
    h_final, contribs = jax.lax.scan(block, x, xs)  # (L, B, S, F)
    n_heads_sel = jnp.maximum(head_mask.sum(), 1.0)
    matrix = contribs.sum(axis=0) / n_heads_sel
    if not with_probs:
        return matrix
    # per-token probabilities of the observed sequence from the same pass:
    # one extra vocab projection on the final-LN states, chunked over the
    # sequence axis so the (B, S, V) logits tensor is never materialized
    # whole (B=32, S=232, V=51.9k would be a 1.5 GB f32 spike)
    hs = layer_norm(h_final, dec["ln"]["scale"], dec["ln"]["bias"])
    cs = 16  # (B, cs, V) peak: ~100 MB f32 at B=32
    n_chunks = -(-s // cs)
    pad_s = n_chunks * cs - s
    hs_p = jnp.pad(hs, ((0, 0), (0, pad_s), (0, 0)))
    # + cs so the lo+1 next-token slice never reads past the array; the
    # padded zeros are valid indices and their probs land in discarded
    # positions
    tok_p = jnp.pad(tokens, ((0, 0), (0, pad_s + cs)))

    def chunk_probs(lo):
        h_c = jax.lax.dynamic_slice_in_dim(hs_p, lo, cs, 1)
        t_c = jax.lax.dynamic_slice_in_dim(tok_p, lo + 1, cs, 1)  # next tok
        lg = project_vocab(params, h_c).astype(jnp.float32)  # (B, cs, V)
        lse = jax.scipy.special.logsumexp(lg, axis=-1)
        chosen = jnp.take_along_axis(
            lg, t_c[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return jnp.exp(chosen - lse)  # (B, cs): P(tokens[lo+i+1] | ..<=lo+i)

    chunks = jax.lax.map(chunk_probs, jnp.arange(n_chunks) * cs)  # (N, B, cs)
    nxt = jnp.moveaxis(chunks, 0, 1).reshape(b, n_chunks * cs)[:, :s]
    # nxt[t] = P(tokens[t+1] | context); shift right, position 0 has no
    # conditioning context and is fixed at 1.0
    probs = jnp.concatenate(
        [jnp.ones((b, 1), jnp.float32), nxt[:, : s - 1]], axis=1)
    return matrix, probs
