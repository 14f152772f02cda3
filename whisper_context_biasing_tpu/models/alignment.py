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


# Published per-model alignment-head sets: the (decoder layer, head) pairs
# whose cross-attention is empirically the most diagonal, shipped with every
# stock Whisper distribution (openai-whisper ``_ALIGNMENT_HEADS`` /
# ``alignment_heads`` in the HF hub models' generation_config.json — public
# constants, reproduced here so stock checkpoints get reference-grade DTW
# word timing without any network access). Custom / fine-tuned-from-scratch
# checkpoints fall back to :func:`default_alignment_mask`.
ALIGNMENT_HEADS: dict[str, tuple[tuple[int, int], ...]] = {
    "tiny.en": ((1, 0), (2, 0), (2, 5), (3, 0), (3, 1), (3, 2), (3, 3),
                (3, 4)),
    "tiny": ((2, 2), (3, 0), (3, 2), (3, 3), (3, 4), (3, 5)),
    "base.en": ((3, 3), (4, 7), (5, 1), (5, 5), (5, 7)),
    "base": ((3, 1), (4, 2), (4, 3), (4, 7), (5, 1), (5, 2), (5, 4), (5, 6)),
    "small.en": ((6, 6), (7, 0), (7, 3), (7, 8), (8, 2), (8, 5), (8, 7),
                 (9, 0), (9, 4), (9, 8), (9, 10), (10, 0), (10, 1), (10, 2),
                 (10, 3), (10, 6), (10, 11), (11, 2), (11, 4)),
    "small": ((5, 3), (5, 9), (8, 0), (8, 4), (8, 7), (8, 8), (9, 0), (9, 7),
              (9, 9), (10, 5)),
    "medium.en": ((11, 4), (14, 1), (14, 12), (14, 14), (15, 4), (16, 0),
                  (16, 4), (16, 9), (17, 12), (17, 14), (18, 7), (18, 10),
                  (18, 15), (20, 0), (20, 3), (20, 9), (20, 14), (21, 12)),
    "medium": ((13, 15), (15, 4), (15, 15), (16, 1), (20, 0), (23, 4)),
    "large": ((9, 19), (11, 2), (11, 4), (11, 17), (22, 7), (22, 11),
              (22, 17), (23, 2), (23, 15)),  # large-v1
    "large-v2": ((10, 12), (13, 17), (16, 11), (16, 12), (16, 13), (17, 15),
                 (17, 16), (18, 4), (18, 11), (18, 19), (19, 11), (21, 2),
                 (21, 3), (22, 3), (22, 9), (22, 12), (23, 5), (23, 7),
                 (23, 13), (25, 5), (26, 1), (26, 12), (27, 15)),
    "large-v3": ((7, 0), (10, 17), (12, 18), (13, 12), (16, 1), (17, 14),
                 (19, 11), (21, 4), (24, 1), (25, 6)),
    "large-v3-turbo": ((2, 4), (2, 11), (3, 3), (3, 6), (3, 11), (3, 14)),
}


def lookup_alignment_heads(
    model_name: str | None, cfg: WhisperConfig | None = None,
) -> tuple[tuple[int, int], ...] | None:
    """The published head set for ``model_name``; ``None`` when unknown.

    With ``cfg`` given, the set is bounds-checked against the config (a
    fine-tune that changed depth/heads silently loses the stock set and
    falls back to the heuristic rather than indexing out of range)."""
    if not model_name:
        return None
    heads = ALIGNMENT_HEADS.get(model_name.strip())
    if heads is None or cfg is None:
        return heads
    if all(l < cfg.n_text_layers and h < cfg.n_heads for l, h in heads):
        return heads
    return None


def infer_model_name(cfg: WhisperConfig) -> str | None:
    """Canonical stock-model name for a config, or ``None``.

    Matches the family geometry (d_model, layer counts, mels, vocab). The
    80-mel 32-layer geometry is shared by large(-v1) and large-v2 — it
    resolves to ``large-v2`` (the v1 weights are long superseded; pass
    explicit heads to time a v1 checkpoint)."""
    from .config import _FAMILY

    for base, (d, h, al, tl) in _FAMILY.items():
        if base.startswith("distil-"):
            continue  # no published alignment heads for the distil family
        if (cfg.d_model, cfg.n_heads, cfg.n_audio_layers,
                cfg.n_text_layers) != (d, h, al, tl):
            continue
        mels = 128 if base.startswith("large-v3") else 80
        if cfg.n_mels != mels:
            continue
        if not cfg.multilingual:
            if base.startswith("large"):
                continue  # no English-only large variants
            return f"{base}.en"
        if base == "large":
            return "large-v2"  # ambiguous with large-v2; prefer current
        if base == "large-v2":
            return "large-v2"
        return base
    return None


def resolve_alignment_mask(
    cfg: WhisperConfig,
    heads: list[tuple[int, int]] | None = None,
    model_name: str | None = None,
) -> jax.Array:
    """(L, H) alignment-head mask with the full resolution order:
    explicit ``heads`` > published set for ``model_name`` > published set
    for the config's inferred stock geometry > top-half heuristic."""
    if heads is not None:
        return heads_to_mask(cfg, heads)
    published = lookup_alignment_heads(model_name, cfg) or \
        lookup_alignment_heads(infer_model_name(cfg), cfg)
    if published is not None:
        return heads_to_mask(cfg, published)
    return default_alignment_mask(cfg)


def default_alignment_mask(cfg: WhisperConfig):
    """(L, H) f32 mask selecting all heads of the top half of decoder layers.

    Fallback for checkpoints whose geometry matches no stock model (see
    ``ALIGNMENT_HEADS`` for the published sets): the top layers' cross
    attention is the most diagonal."""
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
