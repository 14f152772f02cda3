"""Greedy decoding as ONE XLA program.

The reference decodes through HF ``generate`` with ``use_cache=False`` — a
Python loop that re-runs the full decoder per token (scripts/train.py:209
quirk, fixed here per SURVEY.md §7). This module runs the whole
utterance→tokens path inside ``jax.lax.while_loop`` over a preallocated KV
cache, with optional decoder-prompt conditioning (left-padded
``<|startofprev|>`` contexts) and the vectorized bias-trie logits processor.

Matches the reference generation contract: ``max_length=225`` semantics
(prefix + new tokens capped by the model's 448-position window), greedy
argmax, stop at <|endoftext|>, no token suppression
(``model.config.suppress_tokens = []``, scripts/train.py:211).
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
    bias_bonus,
    init_bias_state,
    seed_bias_state_from_prefix,
    sanitize_bias_spans,
)


class GreedyResult(NamedTuple):
    tokens: jax.Array   # (B, max_new) int32, eot-padded after finish
    lengths: jax.Array  # (B,) int32 — number of tokens before (excl.) eot
    sum_logprob: jax.Array | None = None  # (B,) f32 — summed logprob of the emitted tokens
                            # (incl. the finishing eot); avg = sum/(length+1).
                            # Used by long-form quality fallbacks
                            # (decode/long_form.py), mirroring the avg_logprob
                            # heuristic of OpenAI's long-form loop
    no_speech_prob: jax.Array | None = None  # (B,) f32 — P(<|nospeech|>) in the
                            # distribution at the <|sot|> input position
                            # (OpenAI's silence detector; needs no_speech_id)
    spec_rounds: jax.Array | None = None  # scalar int32 — verification rounds
                            # used by speculative decoding (None for plain
                            # greedy); mean accepted run length per round =
                            # max(lengths)/rounds, the k-tuning signal


def pack_prefixes(
    prefixes: list[list[int]], pad_id: int, pad_to_multiple: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Left-pad variable-length decoder prefixes to a common length.
    Returns (ids (B, P), mask (B, P)); mask False marks pads.
    ``pad_to_multiple`` buckets the length so serving paths don't recompile
    for every new prefix length."""
    p = max(len(x) for x in prefixes)
    if pad_to_multiple:
        p = ((p + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    ids = np.full((len(prefixes), p), pad_id, dtype=np.int32)
    mask = np.zeros((len(prefixes), p), dtype=bool)
    for i, x in enumerate(prefixes):
        ids[i, p - len(x):] = x
        mask[i, p - len(x):] = True
    return ids, mask


def apply_timestamp_rules(
    lg: jax.Array,          # (B, V) f32 logits, post-suppress/bias
    prev1: jax.Array,       # (B,) last GENERATED token (-1 = none yet)
    prev2: jax.Array,       # (B,) token before that (-1 = none)
    last_ts: jax.Array,     # (B,) most recent timestamp token (0 = none)
    *,
    timestamp_begin: int,
    eot_id: int,
    is_first: bool,
    max_initial_timestamp_index: int | None,
) -> jax.Array:
    """OpenAI Whisper's ApplyTimestampRules as pure in-graph masks.

    The published long-form algorithm constrains timestamp-token sampling:
    timestamps come in pairs (a lone timestamp must be followed by another
    timestamp or <|endoftext|>; a closed pair must be followed by text),
    they never decrease, the first generated token must be a timestamp no
    later than ``max_initial_timestamp_index``, and when the total
    probability mass on timestamps beats every text token the step is
    forced to sample a timestamp. Row state is three int32 vectors carried
    through the decode loop — no host round-trips, no dynamic shapes.
    (No reference counterpart: the reference decodes with
    ``<|notimestamps|>`` only; this serves the long-form/subtitle surfaces,
    which follow OpenAI's published semantics.)"""
    neg = jnp.finfo(jnp.float32).min
    b, v = lg.shape
    col = jnp.arange(v)
    ts_cols = col >= timestamp_begin
    # <|notimestamps|> sits right below <|0.00|>; never emit it here
    lg = lg.at[:, timestamp_begin - 1].set(neg)
    if is_first:
        # first generated token: must be a timestamp, at most max_initial
        lg = jnp.where(~ts_cols[None, :], neg, lg)
        if max_initial_timestamp_index is not None:
            lg = jnp.where(
                (col > timestamp_begin + max_initial_timestamp_index)[None, :],
                neg, lg)
    else:
        last_was = prev1 >= timestamp_begin
        # "fewer than two generated tokens" counts as a timestamp
        pen_was = (prev2 < 0) | (prev2 >= timestamp_begin)
        # closed pair -> text next; lone timestamp -> timestamp or eot
        lg = jnp.where((last_was & pen_was)[:, None] & ts_cols[None, :],
                       neg, lg)
        lg = jnp.where((last_was & ~pen_was)[:, None]
                       & (col < eot_id)[None, :], neg, lg)
        # monotonic: completing a pair may repeat the value, otherwise
        # strictly increase
        has_ts = last_ts >= timestamp_begin
        bound = jnp.where(last_was & ~pen_was, last_ts, last_ts + 1)
        lg = jnp.where(
            has_ts[:, None] & ts_cols[None, :] & (col[None, :] < bound[:, None]),
            neg, lg)
    # probability rule: if the mass on timestamps beats every text token,
    # force a timestamp (OpenAI masks everything below timestamp_begin,
    # eot included)
    logprobs = jax.nn.log_softmax(lg, axis=-1)
    ts_lp = jax.nn.logsumexp(logprobs[:, timestamp_begin:], axis=-1)
    max_txt = jnp.max(logprobs[:, :timestamp_begin], axis=-1)
    lg = jnp.where((ts_lp > max_txt)[:, None] & ~ts_cols[None, :], neg, lg)
    return lg


@functools.partial(
    counted_jit,
    static_argnames=("cfg", "max_new", "eot_id", "bias_boost", "vocab_size",
                     "span_pad_id", "temperature", "suppress_tokens",
                     "no_speech_id", "timestamp_begin",
                     "max_initial_timestamp_index"),
)
def greedy_decode(
    params,
    cfg: WhisperConfig,
    input_features: jax.Array,   # (B, n_mels, 3000)
    prefix_ids: jax.Array,       # (B, P) int32, left-padded
    prefix_mask: jax.Array,      # (B, P) bool
    max_new: int = 224,
    eot_id: int = 50256,
    bias_spans: jax.Array | None = None,  # (B, N, K) int32 or None
    bias_boost: float = 0.0,
    vocab_size: int | None = None,
    span_pad_id: int = 50256,
    temperature: float = 0.0,
    suppress_tokens: tuple[int, ...] = (),
    rng_key: jax.Array | None = None,
    no_speech_id: int | None = None,
    sot_offset=1,  # int or (B,) int32 — per-row <|sot|> position from the end
    timestamp_begin: int | None = None,   # enable OpenAI's timestamp rules
                                          # (apply_timestamp_rules) for
                                          # timestamp-mode decode
    max_initial_timestamp_index: int | None = 50,  # <= 1.0 s, OpenAI default
    forced_eot_at: jax.Array | None = None,  # (B,) int32 — per-row cap on
                                          # generated text tokens: generation
                                          # index >= forced_eot_at[i] emits
                                          # <|endoftext|> (a per-request
                                          # max-tokens serving cap; also the
                                          # benchmark hook that makes random
                                          # weights terminate like corpus
                                          # transcripts — bench.py)
) -> GreedyResult:
    """Batched greedy decode. The prefix must end with the token the model
    should continue from (e.g. ``[<|sot|>]`` for reference-parity generation,
    or ``[<|sop|>, ctx..., <|sot|>, <|notimestamps|>]`` for prompted decode).

    ``temperature > 0`` switches argmax to categorical sampling (pass
    ``rng_key``); ``suppress_tokens`` are masked to -inf every step (the
    reference clears its suppress list, scripts/train.py:211, so the default
    is empty — this is the production-decoding extension).

    ``no_speech_id`` computes ``no_speech_prob`` from the prefill logits at
    the ``<|sot|>`` input position — ``sot_offset`` tokens from the end of
    the prefix (1 for a bare ``[<|sot|>]`` start, 3 for
    ``[sot, lang, task]``; pass a (B,) array when rows use different start
    sequences)."""
    b, p = prefix_ids.shape
    v = vocab_size or cfg.n_vocab
    # long prompts squeeze the generation budget (the reference's
    # max_length=225 semantics: prompt + new tokens share the 448 window)
    max_new = min(max_new, cfg.n_text_ctx - p)
    if max_new < 1:
        raise ValueError(f"prefix length {p} leaves no room to generate "
                         f"(n_text_ctx {cfg.n_text_ctx})")
    cache_len = p + max_new
    if cache_len > cfg.n_text_ctx:
        raise ValueError(f"prefix {p} + max_new {max_new} exceeds n_text_ctx {cfg.n_text_ctx}")

    enc_out = encode_audio(params, cfg, input_features)
    cross_kv = precompute_cross_kv(params, cfg, enc_out)
    if cfg.quantize_cross_kv:
        from ..models.whisper import quantize_cross_kv

        cross_kv = jax.tree.map(lambda a: a, quantize_cross_kv(cross_kv))
        # layer-major dict leaves: scan slices the leading L axis per layer
    cache = init_kv_cache(cfg, b, cache_len)

    # positions: pads don't advance the position counter (left-pad support)
    prefix_pos = jnp.maximum(jnp.cumsum(prefix_mask.astype(jnp.int32), axis=1) - 1, 0)
    key_mask = jnp.concatenate(
        [prefix_mask, jnp.ones((b, max_new), bool)], axis=1
    )  # (B, cache_len)

    logits, cache = decode_tokens(
        params, cfg, prefix_ids, cross_kv=cross_kv, cache=cache, pos_offset=0,
        token_positions=prefix_pos, self_mask=key_mask,
    )
    next_pos = prefix_pos[:, -1] + 1  # (B,)

    no_speech_prob = None
    if no_speech_id is not None:
        off = jnp.broadcast_to(jnp.asarray(sot_offset, jnp.int32), (b,))
        sot_lg = logits[jnp.arange(b), p - off].astype(jnp.float32)  # (B, V)
        no_speech_prob = jax.nn.softmax(sot_lg, axis=-1)[:, no_speech_id]

    use_bias = bias_spans is not None and bias_boost != 0.0
    if bias_spans is None:  # keep the loop state static
        bias_spans = jnp.zeros((b, 1, 1), jnp.int32)
    bias_state = init_bias_state(bias_spans, span_pad_id)
    if use_bias:
        # the conditioning context may end mid-bias-word: warm-start the
        # trie from the prefix tail so the completion bonus fires on step 1
        bias_state = seed_bias_state_from_prefix(
            bias_state, bias_spans, prefix_ids, prefix_mask)

    if temperature > 0.0 and rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    suppress = (
        jnp.asarray(suppress_tokens, jnp.int32) if suppress_tokens else None
    )

    def pick(lg, state, key, ts_state=None, is_first=False):
        lg = lg.astype(jnp.float32)
        if suppress is not None:
            lg = lg.at[:, suppress].set(jnp.finfo(jnp.float32).min)
        if use_bias:
            lg = lg + bias_bonus(state, bias_spans, v, bias_boost)
        if timestamp_begin is not None:
            prev1, prev2, last_ts = ts_state
            lg = apply_timestamp_rules(
                lg, prev1, prev2, last_ts,
                timestamp_begin=timestamp_begin, eot_id=eot_id,
                is_first=is_first,
                max_initial_timestamp_index=max_initial_timestamp_index)
        if temperature > 0.0:
            nxt = jax.random.categorical(key, lg / temperature, axis=-1).astype(jnp.int32)
        else:
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(lg, axis=-1), nxt[:, None], axis=1
        )[:, 0]
        return nxt, logp

    none = jnp.full((b,), -1, jnp.int32)       # "no generated token yet"
    ts0 = jnp.zeros((b,), jnp.int32)           # "no timestamp seen yet"
    key0 = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    first_tok, first_lp = pick(logits[:, -1], bias_state, key0,
                               ts_state=(none, none, ts0), is_first=True)
    if forced_eot_at is not None:
        # the cap overrides the model's pick; its logprob is not the model's
        # probability of eot, so it doesn't count toward sum_logprob
        forced0 = forced_eot_at <= 0
        first_tok = jnp.where(forced0, eot_id, first_tok)
        first_lp = jnp.where(forced0, 0.0, first_lp)

    class Carry(NamedTuple):
        t: jax.Array
        cur: jax.Array        # (B,) current token to feed next step
        pos: jax.Array        # (B,) its position id
        cache: dict
        out: jax.Array        # (B, max_new)
        finished: jax.Array   # (B,) bool
        bias_state: BiasTrieState
        key: jax.Array
        sum_lp: jax.Array     # (B,) f32
        prev: jax.Array       # (B,) generated token before cur (-1 = none);
                              # timestamp-rule pairing state
        last_ts: jax.Array    # (B,) most recent timestamp token (0 = none)

    out0 = jnp.full((b, max_new), eot_id, jnp.int32)
    finished0 = first_tok == eot_id
    out0 = out0.at[:, 0].set(first_tok)
    bias_state = advance_bias_state(bias_state, bias_spans, first_tok) if use_bias else bias_state
    last_ts0 = (jnp.where(first_tok >= timestamp_begin, first_tok, ts0)
                if timestamp_begin is not None else ts0)

    init = Carry(jnp.int32(1), first_tok, next_pos, cache, out0, finished0,
                 bias_state, key0, first_lp, none, last_ts0)

    def cond(c: Carry):
        return (c.t < max_new) & ~jnp.all(c.finished)

    def body(c: Carry):
        lg, cache = decode_tokens(
            params, cfg, c.cur[:, None], cross_kv=cross_kv, cache=c.cache,
            pos_offset=p - 1 + c.t, token_positions=c.pos[:, None],
            self_mask=key_mask,
        )
        step_lg = lg[:, -1]
        key, sub = jax.random.split(c.key)
        nxt, lp = pick(step_lg, c.bias_state, sub,
                       ts_state=(c.cur, c.prev, c.last_ts))
        if forced_eot_at is not None:
            forced = c.t >= forced_eot_at
            nxt = jnp.where(forced, eot_id, nxt)
            lp = jnp.where(forced, 0.0, lp)
        nxt = jnp.where(c.finished, eot_id, nxt)
        sum_lp = c.sum_lp + jnp.where(c.finished, 0.0, lp)
        out = jax.lax.dynamic_update_slice(c.out, nxt[:, None], (jnp.int32(0), c.t))
        finished = c.finished | (nxt == eot_id)
        bs = advance_bias_state(c.bias_state, bias_spans, nxt) if use_bias else c.bias_state
        last_ts = (jnp.where(nxt >= timestamp_begin, nxt, c.last_ts)
                   if timestamp_begin is not None else c.last_ts)
        return Carry(c.t + 1, nxt, c.pos + 1, cache, out, finished, bs, key,
                     sum_lp, c.cur, last_ts)

    final = jax.lax.while_loop(cond, body, init)
    lengths = jnp.sum(
        jnp.cumprod((final.out != eot_id).astype(jnp.int32), axis=1), axis=1
    )
    return GreedyResult(final.out, lengths, final.sum_lp, no_speech_prob)


def decode_batch(
    params,
    cfg: WhisperConfig,
    tokenizer,
    input_features: np.ndarray,
    contexts: list[list[int]] | None = None,
    max_new: int = 224,
    bias_spans: np.ndarray | None = None,
    bias_boost: float = 0.0,
    include_notimestamps: bool = False,
    pad_to_multiple: int | None = None,
    mesh=None,
    starts: list[list[int]] | None = None,
) -> list[list[int]]:
    """Host-side convenience: build prefixes (reference-parity ``[<|sot|>]``
    start, optionally ``<|sop|> + context`` conditioning), run the jitted
    greedy loop, and strip to finished token lists (without the prefix).

    ``starts``: per-row start sequences overriding the default (e.g.
    ``[sot, <|fr|>, <|transcribe|>]`` after language detection).

    ``mesh``: a ``jax.sharding.Mesh`` shards the decode batch axis over its
    "data" axis (params should already be sharded with
    ``parallel.shard_params``; batch is padded to a data-parallel multiple
    and stripped on return)."""
    b = input_features.shape[0]
    if starts is None:
        start: list[int] = [tokenizer.sot]
        if include_notimestamps:
            start = tokenizer.prefix_tokens
        starts = [start] * b
    if contexts is None:
        prefixes = [list(st) for st in starts]
    else:
        # an empty per-row context means "unprompted" for that row (no bare
        # <|startofprev|> prefix)
        prefixes = [([tokenizer.sop] + list(c) + list(st)) if c else list(st)
                    for c, st in zip(contexts, starts)]
    ids, mask = pack_prefixes(prefixes, tokenizer.eot, pad_to_multiple=pad_to_multiple)
    bias_spans = sanitize_bias_spans(bias_spans)
    if mesh is not None:
        from ..parallel import shard_decode_inputs

        (feats, ids, mask, spans), b = shard_decode_inputs(
            mesh, input_features, ids, mask, bias_spans
        )
    else:
        feats = jnp.asarray(input_features)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        spans = None if bias_spans is None else jnp.asarray(bias_spans)
    res = greedy_decode(
        params, cfg, feats, ids, mask,
        max_new=max_new, eot_id=tokenizer.eot,
        bias_spans=spans,
        bias_boost=bias_boost, span_pad_id=tokenizer.eot,
    )
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    return [toks[i, : lens[i]].tolist() for i in range(b)]
