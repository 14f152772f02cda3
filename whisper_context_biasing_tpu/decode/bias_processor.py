"""Vectorized bias-word logits processor (shallow fusion over token spans).

The reference biases decoding only implicitly (prompt conditioning + the
WeightCE fine-tune); its Python decode control flow has no logits processor.
This module supplies the TPU-native generalization called for by the north
star (BASELINE.json): the bias-word list is advanced as a dense integer trie
*inside* the XLA decode program, so a per-step bonus can be added to tokens
that extend any bias span — no host round-trips.

State: ``(B, N)`` int32 — how many tokens of span ``n`` the current hypothesis
suffix has matched. Spans are the collator's dense ``(B, N, K)`` int32 padded
with 50256 (data_utils/data_collator.py:119-125 contract).

All ops are static-shaped scatter/gather; cost per step is O(B·N) + one
(B, V) bonus buffer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.collator import BIAS_SPAN_PAD_ID


class BiasTrieState(NamedTuple):
    matched: jax.Array  # (B, N) int32: matched prefix length per span
    span_len: jax.Array  # (B, N) int32: true span lengths (0 = empty/pad row)


def sanitize_bias_spans(spans) -> jax.Array | None:
    """Treat the collator's all-empty fallback — zeros of shape (B, 1, 1)
    (data/collator.py contract) — as "no spans" so decode-time biasing never
    interprets it as a real length-1 span of token id 0."""
    if spans is None:
        return None
    import numpy as _np

    arr = _np.asarray(spans)
    if arr.shape[1:] == (1, 1) and not arr.any():
        return None
    return spans


def init_bias_state(bias_spans: jax.Array, pad_id: int = BIAS_SPAN_PAD_ID) -> BiasTrieState:
    """bias_spans: (B, N, K) int32, padded with ``pad_id``."""
    span_len = jnp.sum(bias_spans != pad_id, axis=-1).astype(jnp.int32)
    matched = jnp.zeros(bias_spans.shape[:2], jnp.int32)
    return BiasTrieState(matched, span_len)


def bias_bonus(
    state: BiasTrieState,
    bias_spans: jax.Array,  # (B, N, K)
    vocab_size: int,
    boost: float,
) -> jax.Array:
    """Per-step additive logit bonus (B, V): each span whose next expected
    token is t contributes ``boost`` to t (max over spans, so duplicated
    words don't double-count)."""
    b, n, k = bias_spans.shape
    next_idx = jnp.minimum(state.matched, k - 1)
    next_tok = jnp.take_along_axis(bias_spans, next_idx[..., None], axis=-1)[..., 0]
    active = state.matched < state.span_len  # span not yet fully matched
    rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, n))
    safe_tok = jnp.where(active, next_tok, 0)
    bonus = jnp.zeros((b, vocab_size), jnp.float32)
    bonus = bonus.at[rows.reshape(-1), safe_tok.reshape(-1)].max(
        jnp.where(active, jnp.float32(boost), 0.0).reshape(-1)
    )
    return bonus


def bias_score_adjust(
    state: BiasTrieState,
    bias_spans: jax.Array,  # (B, N, K)
    vocab_size: int,
    boost: float,
) -> jax.Array:
    """Score-exact shallow fusion for beam search: per-candidate-token score
    adjustment (B, V) such that a beam's ACCUMULATED bias bonus is
    ``boost * len(span)`` for every completed span and exactly 0 for partial
    matches that later fail.

    adjust[v] = boost * Σ_n new_matched_n(v) − boost * Σ_n matched_n, where
    new_matched_n(v) is exactly what ``advance_bias_state`` would produce on
    emitting v: matched_n+1 if v extends span n, 1 if v (re)starts it, else 0.
    Choosing a token that extends span n keeps its pending credit and adds
    one step; a token that breaks a partial match but equals a span's first
    token nets the restart credit of +boost against the retraction (so a span
    completed after a restart still sums to exactly boost*len); any other
    token retracts the credit of every span it breaks. (Greedy decoding keeps
    the simpler prospective ``bias_bonus`` — emitted tokens can't be
    retracted.)"""
    b, n, k = bias_spans.shape
    next_idx = jnp.minimum(state.matched, k - 1)
    next_tok = jnp.take_along_axis(bias_spans, next_idx[..., None], axis=-1)[..., 0]
    first = bias_spans[..., 0]
    active = (state.matched < state.span_len) & (state.span_len > 0)

    pending = jnp.sum(state.matched, axis=-1).astype(jnp.float32) * boost  # (B,)
    rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, n))
    relief_vals = jnp.where(
        active, (state.matched + 1).astype(jnp.float32) * boost, 0.0
    )
    safe_tok = jnp.where(active, next_tok, 0)
    relief = jnp.zeros((b, vocab_size), jnp.float32).at[
        rows.reshape(-1), safe_tok.reshape(-1)
    ].add(relief_vals.reshape(-1))
    # restart credit: when v == first[n] but v does not extend span n,
    # advance_bias_state re-enters the span at matched=1 — credit boost*1.
    # Gated off when first IS the extension token (already credited above).
    restart = (state.span_len > 0) & ~(active & (next_tok == first))
    safe_first = jnp.where(restart, first, 0)
    relief = relief.at[rows.reshape(-1), safe_first.reshape(-1)].add(
        jnp.where(restart, jnp.float32(boost), 0.0).reshape(-1)
    )
    return relief - pending[:, None]


def seed_bias_state_from_prefix(
    state: BiasTrieState,
    bias_spans: jax.Array,   # (B, N, K)
    prefix_ids: jax.Array,   # (B, P) left-padded conditioning prefix
    prefix_mask: jax.Array | None = None,  # (B, P) False = pad
) -> BiasTrieState:
    """Warm-start the trie from the conditioning context's tail.

    Folds the last ``K`` (= max span length) real prefix tokens through
    ``advance_bias_state`` so a context that ends mid-bias-word (e.g. a
    description ending with the drug name the first transcript token
    completes) gets the completion bonus from step 1 instead of starting
    the trie cold. Pad positions are skipped (no restart/reset); the loop
    is static (K and P are compile-time shapes)."""
    p = prefix_ids.shape[1]
    w = min(bias_spans.shape[-1], p)
    for j in range(p - w, p):
        new = advance_bias_state(state, bias_spans, prefix_ids[:, j])
        if prefix_mask is not None:
            real = prefix_mask[:, j, None]
            new = BiasTrieState(
                jnp.where(real, new.matched, state.matched), state.span_len
            )
        state = new
    return state


def advance_bias_state(
    state: BiasTrieState,
    bias_spans: jax.Array,  # (B, N, K)
    token: jax.Array,  # (B,) int32 — the token just emitted
) -> BiasTrieState:
    """Advance each span's matched length: extend on match, else restart
    (matched=1 if the token re-starts the span, 0 otherwise). Completed spans
    also restart so repeated mentions keep getting biased."""
    b, n, k = bias_spans.shape
    cur_idx = jnp.minimum(state.matched, k - 1)
    expected = jnp.take_along_axis(bias_spans, cur_idx[..., None], axis=-1)[..., 0]
    first = bias_spans[..., 0]
    tok = token[:, None]
    in_progress = state.matched < state.span_len
    extended = jnp.where(in_progress & (expected == tok), state.matched + 1, 0)
    restarted = jnp.where((first == tok) & (state.span_len > 0), 1, 0)
    new_matched = jnp.maximum(extended, restarted).astype(jnp.int32)
    # a just-completed span resets (ready to match the next mention)
    new_matched = jnp.where(new_matched >= state.span_len, 0, new_matched)
    return BiasTrieState(new_matched, state.span_len)
