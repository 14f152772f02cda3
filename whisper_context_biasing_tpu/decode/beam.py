"""Beam-search decoding as ONE XLA program.

The reference decodes greedily (HF GenerationConfig default num_beams=1);
beam search with the bias-list logits processor is a target capability of the
rebuild (BASELINE.json config #2). Everything the reference's Python generate
loop would do per step happens inside ``lax.while_loop`` here:

  * beams are flattened into the batch axis for the cached decoder step
  * beam reordering is a gather over the preallocated KV cache
  * finished beams are frozen (forced <|endoftext|>, score preserved)
  * the bias trie advances per beam; its bonus is added pre-top-k
  * standard length-penalized selection (HF ``length_penalty`` semantics)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import WhisperConfig
from ..utils.compile_count import counted_jit
from ..models.whisper import (
    decode_tokens,
    encode_audio,
    init_kv_cache,
    precompute_cross_kv,
)
from .bias_processor import (
    BiasTrieState,
    advance_bias_state,
    bias_score_adjust,
    init_bias_state,
    seed_bias_state_from_prefix,
    sanitize_bias_spans,
)

NEG_INF = jnp.float32(-1e9)


class BeamResult(NamedTuple):
    tokens: jax.Array   # (B, K, max_new) int32, eot-padded
    scores: jax.Array   # (B, K) cumulative logprob (unpenalized)
    lengths: jax.Array  # (B, K) tokens before eot
    best: jax.Array     # (B, max_new) best beam per batch row
    no_speech_prob: jax.Array | None = None  # (B,) f32 — P(<|nospeech|>) at
                            # the <|sot|> prefill position (see GreedyResult);
                            # needs no_speech_id. Used by the long-form
                            # silence rule when beam drives the t=0 rung.


@functools.partial(
    counted_jit,
    static_argnames=("cfg", "num_beams", "max_new", "eot_id", "bias_boost",
                     "length_penalty", "span_pad_id", "early_stopping",
                     "no_speech_id", "timestamp_begin",
                     "max_initial_timestamp_index"),
)
def beam_decode(
    params,
    cfg: WhisperConfig,
    input_features: jax.Array,   # (B, n_mels, T)
    prefix_ids: jax.Array,       # (B, P) int32, left-padded
    prefix_mask: jax.Array,      # (B, P) bool
    num_beams: int = 5,
    max_new: int = 224,
    eot_id: int = 50256,
    bias_spans: jax.Array | None = None,  # (B, N, Kspan)
    bias_boost: float = 0.0,
    length_penalty: float = 1.0,
    span_pad_id: int = 50256,
    early_stopping: str = "off",
    no_speech_id: int | None = None,
    sot_offset=1,  # int or (B,) int32 — <|sot|> position from the prefix end
    timestamp_begin: int | None = None,   # enable OpenAI's timestamp rules
                                          # per beam (greedy.py
                                          # apply_timestamp_rules; applied to
                                          # the logits BEFORE log_softmax,
                                          # OpenAI's filter order)
    max_initial_timestamp_index: int | None = 50,
) -> BeamResult:
    """``early_stopping="off"`` (default): the in-pool frozen-beam search
    documented above — finished beams compete in top-k at zero incremental
    cost until every beam has finished.

    ``"true"``/``"false"``/``"never"``: HF ``generate(num_beams=k)``
    semantics — 2k candidates per step, <|eot|> candidates ranked within the
    top k move to a per-row finished-hypothesis pool (score length-penalized
    at insertion), live beams refill from the remaining candidates, and rows
    stop per the HF early-stopping rule: "true" = pool full; "false" = pool
    full AND its worst hypothesis beats the best running score at the
    current length (HF's heuristic); "never" = same bound computed at
    ``max_new`` (rigorous for length_penalty > 0). In these modes the
    returned ``scores`` are the pool's length-penalized scores and
    ``lengths`` count generated tokens including <|eot|>."""
    b, p = prefix_ids.shape
    k = num_beams
    v = cfg.n_vocab
    # long prompts squeeze the generation budget (the reference's
    # max_length=225 semantics: prompt + new tokens share the 448 window)
    max_new = min(max_new, cfg.n_text_ctx - p)
    if max_new < 1:
        raise ValueError(f"prefix length {p} leaves no room to generate "
                         f"(n_text_ctx {cfg.n_text_ctx})")
    cache_len = p + max_new
    if cache_len > cfg.n_text_ctx:
        raise ValueError(f"prefix {p} + max_new {max_new} exceeds n_text_ctx")

    enc_out = encode_audio(params, cfg, input_features)
    # project cross-attention K/V once per utterance, then tile across beams
    # (projecting after the repeat would redo the matmuls num_beams times)
    ck, cv = precompute_cross_kv(params, cfg, enc_out)
    if cfg.quantize_cross_kv:
        from ..models.whisper import quantize_cross_kv

        cross_kv = jax.tree.map(
            lambda a: jnp.repeat(a, k, axis=1), quantize_cross_kv((ck, cv))
        )
    else:
        cross_kv = (jnp.repeat(ck, k, axis=1), jnp.repeat(cv, k, axis=1))
    prefix_tiled = jnp.repeat(prefix_ids, k, axis=0)
    mask_tiled = jnp.repeat(prefix_mask, k, axis=0)

    cache = init_kv_cache(cfg, b * k, cache_len)
    prefix_pos = jnp.maximum(jnp.cumsum(mask_tiled.astype(jnp.int32), axis=1) - 1, 0)
    key_mask = jnp.concatenate(
        [mask_tiled, jnp.ones((b * k, max_new), bool)], axis=1
    )

    logits, cache = decode_tokens(
        params, cfg, prefix_tiled, cross_kv=cross_kv, cache=cache, pos_offset=0,
        token_positions=prefix_pos, self_mask=key_mask,
    )
    next_pos = prefix_pos[:, -1] + 1  # (B*K,)

    no_speech_prob = None
    if no_speech_id is not None:
        # prefill logits at the <|sot|> input position of beam 0 of each row
        # (identical across the k tiled copies) — same rule as greedy_decode
        off = jnp.broadcast_to(jnp.asarray(sot_offset, jnp.int32), (b,))
        sot_lg = logits[jnp.arange(b) * k, p - off].astype(jnp.float32)
        no_speech_prob = jax.nn.softmax(sot_lg, axis=-1)[:, no_speech_id]

    use_bias = bias_spans is not None and bias_boost != 0.0
    if bias_spans is None:
        bias_spans = jnp.zeros((b, 1, 1), jnp.int32)
    spans_tiled = jnp.repeat(bias_spans, k, axis=0)  # (B*K, N, Ks)
    bias_state = init_bias_state(spans_tiled, span_pad_id)
    if use_bias:
        # warm-start from the context tail (see seed_bias_state_from_prefix).
        # Seeded credit is deliberate: a span begun in the conditioning
        # context nets boost*(len - seeded) when completed, and abandoning
        # it retracts seeded*boost — preferring completion of a
        # context-dangling bias word.
        bias_state = seed_bias_state_from_prefix(
            bias_state, spans_tiled, prefix_tiled, mask_tiled)

    def reorder(cache, state, pos, beam_idx):
        """Gather beam-major tensors after top-k selection."""
        def g_cache(a):  # (L, B*K, T, D)
            l, bk, t, d = a.shape
            a = a.reshape(l, b, k, t, d)
            a = jnp.take_along_axis(a, beam_idx[None, :, :, None, None], axis=2)
            return a.reshape(l, bk, t, d)

        cache = jax.tree.map(g_cache, cache)

        def g_bk(a):  # (B*K, ...)
            a2 = a.reshape((b, k) + a.shape[1:])
            a2 = jnp.take_along_axis(
                a2, beam_idx.reshape((b, k) + (1,) * (a.ndim - 1)), axis=1
            )
            return a2.reshape(a.shape)

        state = BiasTrieState(g_bk(state.matched), g_bk(state.span_len))
        pos = g_bk(pos)
        return cache, state, pos

    use_ts = timestamp_begin is not None

    def apply_ts(step_logits, ts_state, is_first):
        """OpenAI's ApplyTimestampRules per beam, on raw logits (the filter
        runs before log_softmax in OpenAI's decode loop, so the probability
        rule sees the same distribution here)."""
        lg = step_logits.astype(jnp.float32)
        if use_ts:
            from .greedy import apply_timestamp_rules

            prev1, prev2, last_ts = ts_state
            lg = apply_timestamp_rules(
                lg, prev1, prev2, last_ts,
                timestamp_begin=timestamp_begin, eot_id=eot_id,
                is_first=is_first,
                max_initial_timestamp_index=max_initial_timestamp_index)
        return lg

    def gather_bk(a, beam_idx):
        """Gather a (B*K,) per-beam vector by the (B, K) parent selection."""
        return jnp.take_along_axis(
            a.reshape(b, k), beam_idx, axis=1).reshape(b * k)

    none_bk = jnp.full((b * k,), -1, jnp.int32)   # "no generated token yet"
    ts0_bk = jnp.zeros((b * k,), jnp.int32)       # "no timestamp seen yet"

    if early_stopping != "off":
        res = _hf_beam_loop(
            params, cfg, logits, cache, next_pos, cross_kv, key_mask,
            spans_tiled, bias_state, use_bias, reorder,
            b=b, k=k, v=v, p=p, max_new=max_new, eot_id=eot_id,
            bias_boost=bias_boost, length_penalty=length_penalty,
            early_stopping=early_stopping,
            apply_ts=apply_ts, gather_bk=gather_bk, use_ts=use_ts,
            timestamp_begin=timestamp_begin,
        )
        return res._replace(no_speech_prob=no_speech_prob)

    def step_logprobs(step_logits, state, finished, ts_state, is_first=False):
        """(B*K, V) masked log-probs for candidate expansion. Biasing uses
        score-exact shallow fusion: completed spans net +boost*len, failed
        partial matches net exactly 0 (bias_score_adjust docstring)."""
        lp = jax.nn.log_softmax(apply_ts(step_logits, ts_state, is_first),
                                axis=-1)
        if use_bias:
            lp = lp + bias_score_adjust(state, spans_tiled, v, bias_boost)
        # finished beams may only emit eot, at zero incremental cost
        frozen = jnp.full_like(lp, NEG_INF).at[:, eot_id].set(0.0)
        return jnp.where(finished[:, None], frozen, lp)

    class Carry(NamedTuple):
        t: jax.Array
        cur: jax.Array         # (B*K,) last emitted token
        pos: jax.Array         # (B*K,)
        cache: dict
        out: jax.Array         # (B, K, max_new)
        scores: jax.Array      # (B, K)
        finished: jax.Array    # (B*K,)
        bias_state: BiasTrieState
        prev: jax.Array        # (B*K,) generated token before cur (-1 =
                               # none); timestamp-rule pairing state
        last_ts: jax.Array     # (B*K,) most recent timestamp token (0=none)

    # first expansion: only beam 0 contributes candidates
    init_scores = jnp.tile(
        jnp.asarray([0.0] + [float(NEG_INF)] * (k - 1), jnp.float32), (b, 1)
    )
    finished0 = jnp.zeros((b * k,), bool)
    lp0 = step_logprobs(logits[:, -1], bias_state, finished0,
                        (none_bk, none_bk, ts0_bk), is_first=True)  # (B*K, V)
    cand = init_scores.reshape(b * k, 1) + lp0
    scores, flat_idx = jax.lax.top_k(cand.reshape(b, k * v), k)  # (B, K)
    beam_idx = flat_idx // v
    token = (flat_idx % v).astype(jnp.int32)

    cache, bias_state, next_pos = reorder(cache, bias_state, next_pos, beam_idx)
    token_flat = token.reshape(b * k)
    finished = token_flat == eot_id
    out0 = jnp.full((b, k, max_new), eot_id, jnp.int32).at[:, :, 0].set(token)
    if use_bias:
        bias_state = advance_bias_state(bias_state, spans_tiled, token_flat)
    last_ts0 = (jnp.where(token_flat >= timestamp_begin, token_flat, ts0_bk)
                if use_ts else ts0_bk)

    init = Carry(jnp.int32(1), token_flat, next_pos, cache, out0, scores,
                 finished, bias_state, none_bk, last_ts0)

    def cond(c: Carry):
        return (c.t < max_new) & ~jnp.all(c.finished)

    def body(c: Carry):
        lg, cache = decode_tokens(
            params, cfg, c.cur[:, None], cross_kv=cross_kv, cache=c.cache,
            pos_offset=p - 1 + c.t, token_positions=c.pos[:, None],
            self_mask=key_mask,
        )
        lp = step_logprobs(lg[:, -1], c.bias_state, c.finished,
                           (c.cur, c.prev, c.last_ts))  # (B*K, V)
        cand = c.scores.reshape(b * k, 1) + lp
        scores, flat_idx = jax.lax.top_k(cand.reshape(b, k * v), k)
        beam_idx = flat_idx // v
        token = (flat_idx % v).astype(jnp.int32)

        cache, state, pos = reorder(cache, c.bias_state, c.pos, beam_idx)
        fin = jnp.take_along_axis(c.finished.reshape(b, k), beam_idx, axis=1)
        out = jnp.take_along_axis(c.out, beam_idx[:, :, None], axis=1)
        out = jax.lax.dynamic_update_slice(
            out, token[:, :, None], (jnp.int32(0), jnp.int32(0), c.t)
        )
        token_flat = token.reshape(b * k)
        finished = fin.reshape(b * k) | (token_flat == eot_id)
        if use_bias:
            state = advance_bias_state(state, spans_tiled, token_flat)
        # timestamp state follows the SELECTED parent beam
        prev = gather_bk(c.cur, beam_idx)
        lt = gather_bk(c.last_ts, beam_idx)
        if use_ts:
            lt = jnp.where(token_flat >= timestamp_begin, token_flat, lt)
        return Carry(c.t + 1, token_flat, pos + 1, cache, out, scores,
                     finished, state, prev, lt)

    final = jax.lax.while_loop(cond, body, init)

    lengths = jnp.sum(
        jnp.cumprod((final.out != eot_id).astype(jnp.int32), axis=2), axis=2
    )  # (B, K)
    # HF-style length-penalized selection over final beams
    penal = final.scores / jnp.maximum(lengths, 1).astype(jnp.float32) ** length_penalty
    best_idx = jnp.argmax(penal, axis=1)  # (B,)
    best = jnp.take_along_axis(final.out, best_idx[:, None, None], axis=1)[:, 0]
    return BeamResult(final.out, final.scores, lengths, best, no_speech_prob)


def _hf_beam_loop(
    params, cfg, logits, cache, next_pos, cross_kv, key_mask,
    spans_tiled, bias_state, use_bias, reorder, *,
    b, k, v, p, max_new, eot_id, bias_boost, length_penalty, early_stopping,
    apply_ts, gather_bk, use_ts, timestamp_begin,
) -> BeamResult:
    """HF ``BeamSearchScorer.process``/``finalize`` semantics as one XLA
    loop (transformers generation/beam_search.py behavior): 2k candidates
    per step; <|eot|> candidates ranked within the top k are inserted into a
    k-slot finished pool with score ``cum_logprob / gen_len**length_penalty``
    (gen_len counts the <|eot|>); live beams refill from the leading non-eot
    candidates; a row is done per the early-stopping rule, checked after
    insertion against the step's best raw score. At ``max_new`` the
    surviving live beams of unfinished rows merge into the pool."""
    if early_stopping not in ("true", "false", "never"):
        raise ValueError(f"early_stopping must be off/true/false/never, "
                         f"got {early_stopping!r}")
    lp_f = float(length_penalty)
    rank = jnp.arange(2 * k)

    def step_logprobs(step_logits, state, done_bk, ts_state, is_first=False):
        lp = jax.nn.log_softmax(apply_ts(step_logits, ts_state, is_first),
                                axis=-1)
        if use_bias:
            lp = lp + bias_score_adjust(state, spans_tiled, v, bias_boost)
        # rows already done emit <|eot|> at zero cost until the loop exits
        frozen = jnp.full_like(lp, NEG_INF).at[:, eot_id].set(0.0)
        return jnp.where(done_bk[:, None], frozen, lp)

    def select(cand, t, out, fin_scores, fin_out, fin_len, done):
        """One scorer.process step over (B*K, V) cumulative scores."""
        s2, flat = jax.lax.top_k(cand.reshape(b, k * v), 2 * k)
        beam_idx = flat // v
        token = (flat % v).astype(jnp.int32)
        is_eot = token == eot_id
        # live refill: the first k non-eot candidates in rank order (each
        # live beam contributes at most one eot candidate, so >= k remain)
        order = jnp.argsort(is_eot.astype(jnp.int32) * (2 * k) + rank,
                            axis=1)[:, :k]
        live_scores = jnp.take_along_axis(s2, order, axis=1)
        live_beam = jnp.take_along_axis(beam_idx, order, axis=1)
        live_tok = jnp.take_along_axis(token, order, axis=1)

        gen_len = (t + 1).astype(jnp.float32)
        pen = s2 / gen_len ** lp_f
        eligible = is_eot & (rank[None, :] < k) & ~done[:, None]
        cand_pen = jnp.where(eligible, pen, NEG_INF)
        # hypothesis = tokens emitted so far; out is eot-padded, so the
        # gathered row already reads as "sequence + <|eot|>"
        cand_out = jnp.take_along_axis(out, beam_idx[:, :, None], axis=1)
        all_scores = jnp.concatenate([fin_scores, cand_pen], axis=1)
        all_out = jnp.concatenate([fin_out, cand_out], axis=1)
        all_len = jnp.concatenate(
            [fin_len, jnp.zeros((b, 2 * k), jnp.int32) + (t + 1)], axis=1)
        # stable top-k: on ties existing pool entries win, matching the
        # scorer's strict score > worst_score insertion test
        new_scores, sel = jax.lax.top_k(all_scores, k)
        new_out = jnp.take_along_axis(all_out, sel[:, :, None], axis=1)
        new_len = jnp.take_along_axis(all_len, sel, axis=1)
        keep = done[:, None]
        fin_scores = jnp.where(keep, fin_scores, new_scores)
        fin_out = jnp.where(keep[:, :, None], fin_out, new_out)
        fin_len = jnp.where(keep, fin_len, new_len)

        pool_full = jnp.all(fin_scores > NEG_INF / 2, axis=1)
        worst = jnp.min(fin_scores, axis=1)
        best_running = s2[:, 0]
        if early_stopping == "true":
            row_done = pool_full
        elif early_stopping == "false":
            row_done = pool_full & (worst >= best_running / gen_len ** lp_f)
        else:  # "never": rigorous bound at max generation length
            denom = (float(max_new) ** lp_f) if lp_f > 0.0 else gen_len ** lp_f
            row_done = pool_full & (worst >= best_running / denom)
        done = done | row_done
        return live_scores, live_beam, live_tok, fin_scores, fin_out, fin_len, done

    class HFCarry(NamedTuple):
        t: jax.Array
        cur: jax.Array
        pos: jax.Array
        cache: dict
        out: jax.Array          # (B, K, max_new) live sequences
        scores: jax.Array       # (B, K) live cumulative logprob
        done: jax.Array         # (B,)
        fin_scores: jax.Array   # (B, K) penalized pool scores
        fin_out: jax.Array      # (B, K, max_new)
        fin_len: jax.Array      # (B, K)
        bias_state: BiasTrieState
        prev: jax.Array         # (B*K,) timestamp-rule pairing state
        last_ts: jax.Array      # (B*K,)

    none_bk = jnp.full((b * k,), -1, jnp.int32)
    ts0_bk = jnp.zeros((b * k,), jnp.int32)
    out0 = jnp.full((b, k, max_new), eot_id, jnp.int32)
    init_scores = jnp.tile(
        jnp.asarray([0.0] + [float(NEG_INF)] * (k - 1), jnp.float32), (b, 1))
    lp0 = step_logprobs(logits[:, -1], bias_state, jnp.zeros((b * k,), bool),
                        (none_bk, none_bk, ts0_bk), is_first=True)
    live_scores, live_beam, live_tok, fs, fo, fl, done = select(
        init_scores.reshape(b * k, 1) + lp0, jnp.int32(0), out0,
        jnp.full((b, k), NEG_INF), out0, jnp.zeros((b, k), jnp.int32),
        jnp.zeros((b,), bool))
    cache, bias_state, next_pos = reorder(cache, bias_state, next_pos, live_beam)
    token_flat = live_tok.reshape(b * k)
    out = out0.at[:, :, 0].set(live_tok)
    if use_bias:
        bias_state = advance_bias_state(bias_state, spans_tiled, token_flat)
    last_ts0 = (jnp.where(token_flat >= timestamp_begin, token_flat, ts0_bk)
                if use_ts else ts0_bk)

    init = HFCarry(jnp.int32(1), token_flat, next_pos, cache, out, live_scores,
                   done, fs, fo, fl, bias_state, none_bk, last_ts0)

    def cond(c: HFCarry):
        return (c.t < max_new) & ~jnp.all(c.done)

    def body(c: HFCarry):
        done_bk = jnp.repeat(c.done, k)
        lg, cache = decode_tokens(
            params, cfg, c.cur[:, None], cross_kv=cross_kv, cache=c.cache,
            pos_offset=p - 1 + c.t, token_positions=c.pos[:, None],
            self_mask=key_mask,
        )
        lp = step_logprobs(lg[:, -1], c.bias_state, done_bk,
                           (c.cur, c.prev, c.last_ts))
        live_scores, live_beam, live_tok, fs, fo, fl, done = select(
            c.scores.reshape(b * k, 1) + lp, c.t, c.out,
            c.fin_scores, c.fin_out, c.fin_len, c.done)
        cache, state, pos = reorder(cache, c.bias_state, c.pos, live_beam)
        out = jnp.take_along_axis(c.out, live_beam[:, :, None], axis=1)
        out = jax.lax.dynamic_update_slice(
            out, live_tok[:, :, None], (jnp.int32(0), jnp.int32(0), c.t))
        token_flat = live_tok.reshape(b * k)
        if use_bias:
            state = advance_bias_state(state, spans_tiled, token_flat)
        prev = gather_bk(c.cur, live_beam)
        lt = gather_bk(c.last_ts, live_beam)
        if use_ts:
            lt = jnp.where(token_flat >= timestamp_begin, token_flat, lt)
        return HFCarry(c.t + 1, token_flat, pos + 1, cache, out, live_scores,
                       done, fs, fo, fl, state, prev, lt)

    final = jax.lax.while_loop(cond, body, init)

    # finalize: unfinished rows merge their live beams into the pool
    live_pen = final.scores / final.t.astype(jnp.float32) ** lp_f
    live_pen = jnp.where(final.done[:, None], NEG_INF, live_pen)
    all_scores = jnp.concatenate([final.fin_scores, live_pen], axis=1)
    all_out = jnp.concatenate([final.fin_out, final.out], axis=1)
    all_len = jnp.concatenate(
        [final.fin_len, jnp.zeros((b, k), jnp.int32) + final.t], axis=1)
    fin_scores, sel = jax.lax.top_k(all_scores, k)
    fin_out = jnp.take_along_axis(all_out, sel[:, :, None], axis=1)
    fin_len = jnp.take_along_axis(all_len, sel, axis=1)
    best_idx = jnp.argmax(fin_scores, axis=1)
    best = jnp.take_along_axis(fin_out, best_idx[:, None, None], axis=1)[:, 0]
    return BeamResult(fin_out, fin_scores, fin_len, best)


def beam_decode_batch(
    params, cfg, tokenizer, input_features: np.ndarray,
    contexts=None, num_beams: int = 5, max_new: int = 224,
    bias_spans=None, bias_boost: float = 0.0, length_penalty: float = 1.0,
    mesh=None, starts=None, early_stopping: str = "off",
    timestamp_begin: int | None = None,
):
    """Host-side convenience mirroring decode.greedy.decode_batch.
    ``starts``: optional per-row start sequences (see decode_batch).
    ``early_stopping``: "off" (default) or HF semantics (see beam_decode).
    ``mesh`` shards the batch axis over "data" (see decode_batch)."""
    from .greedy import pack_prefixes

    bsz = input_features.shape[0]
    if starts is None:
        starts = [[tokenizer.sot]] * bsz
    if contexts is None:
        prefixes = [list(st) for st in starts]
    else:
        prefixes = [([tokenizer.sop] + list(c) + list(st)) if c else list(st)
                    for c, st in zip(contexts, starts)]
    ids, mask = pack_prefixes(prefixes, tokenizer.eot)
    bias_spans = sanitize_bias_spans(bias_spans)
    if mesh is not None:
        from ..parallel import shard_decode_inputs

        (feats, ids, mask, spans), bsz = shard_decode_inputs(
            mesh, input_features, ids, mask, bias_spans
        )
    else:
        feats = jnp.asarray(input_features)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        spans = None if bias_spans is None else jnp.asarray(bias_spans)
    res = beam_decode(
        params, cfg, feats, ids, mask,
        num_beams=num_beams, max_new=max_new, eot_id=tokenizer.eot,
        bias_spans=spans,
        bias_boost=bias_boost, length_penalty=length_penalty,
        span_pad_id=tokenizer.eot, early_stopping=early_stopping,
        timestamp_begin=timestamp_begin,
    )
    toks = np.asarray(res.best)
    outs = []
    for i in range(bsz):
        row = toks[i].tolist()
        outs.append(row[: row.index(tokenizer.eot)] if tokenizer.eot in row else row)
    return outs
