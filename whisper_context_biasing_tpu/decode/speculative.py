"""Speculative greedy decoding: draft-model lookahead + single-program
verification, with EXACT equivalence to the target model's greedy decode.

The reference decodes greedily through HF ``generate`` (scripts/train.py:209);
this module is a TPU-native serving accelerator beyond the reference's
capability set: a small draft model (e.g. tiny, or large-v3-turbo for
large-v3) proposes ``k`` tokens per round, and the target model scores all
``k+1`` positions in ONE cached forward — so the expensive model advances
``accepted+1`` tokens per weight read instead of one. Everything runs inside
``jax.lax.while_loop``; rows advance at different rates via the per-row
cache-offset mode of ``models.whisper.decode_tokens``.

Exactness: the emitted sequence is BY CONSTRUCTION the target's greedy
sequence (accepted draft tokens equal the target argmax at their position;
the first mismatch is replaced by the target argmax), for any draft model
and any acceptance rate — including bias-boosted decoding, where the trie
state is advanced along the chunk inside the verify scan. Tested against
``greedy_decode`` token-for-token.

Throughput depends on the draft/target agreement rate: ~(a+1)x fewer target
weight reads at acceptance a. With random weights acceptance is ~0 and this
is strictly slower — the win needs real weights (docs/PERF.md round 3).

Numerics caveat: "exact" means exact given bit-identical target logits. The
verify forward scores k+1 positions in one call while plain greedy scores
one, so on configs where the two sequence lengths take different kernels
(e.g. the fused int8 single-step path vs the S>1 quantized-cross path) a
near-tie between the top-2 logits can argmax-flip relative to plain greedy.
The equivalence tests pin f32/bf16 configs where both paths share kernels;
on the TPU fast serving config treat equivalence as quality-neutral rather
than bitwise.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.config import WhisperConfig
from ..models.whisper import (
    decode_tokens,
    encode_audio,
    init_kv_cache,
    precompute_cross_kv,
)
from ..utils.compile_count import counted_jit
from .bias_processor import (
    BiasTrieState,
    advance_bias_state,
    bias_bonus,
    init_bias_state,
    seed_bias_state_from_prefix,
)
from .greedy import GreedyResult


@functools.partial(
    counted_jit,
    static_argnames=("cfg_draft", "cfg_target", "k", "max_new", "eot_id",
                     "bias_boost", "span_pad_id"),
)
def speculative_greedy_decode(
    params_draft,
    cfg_draft: WhisperConfig,
    params_target,
    cfg_target: WhisperConfig,
    input_features: jax.Array,        # (B, n_mels, T) — shared by both models
    prefix_ids: jax.Array,            # (B, P) int32, left-padded
    prefix_mask: jax.Array,           # (B, P) bool
    k: int = 4,
    max_new: int = 224,
    eot_id: int = 50256,
    bias_spans: jax.Array | None = None,   # (B, N, Ks) int32 or None
    bias_boost: float = 0.0,
    span_pad_id: int = 50256,
    input_features_draft: jax.Array | None = None,  # if the draft uses
                                                    # different n_mels
    no_speech_id: int | None = None,
    sot_offset=1,
) -> GreedyResult:
    """Batched speculative greedy decode (see module docstring).

    Returns a ``GreedyResult`` whose ``tokens``/``lengths`` bit-match
    ``greedy_decode(params_target, cfg_target, ...)``; ``sum_logprob`` and
    ``no_speech_prob`` (when ``no_speech_id`` is given) carry the same
    semantics, so the long-form fallback ladder composes."""
    if cfg_draft.n_vocab != cfg_target.n_vocab:
        raise ValueError("draft and target must share the vocabulary")
    b, p = prefix_ids.shape
    v = cfg_target.n_vocab
    # clamp by the TARGET context only (greedy parity); a draft with a
    # smaller decoder context keeps proposing with its position ids
    # saturated at its table edge — degraded proposals there just lower
    # acceptance, never the emitted sequence
    max_new = min(max_new, cfg_target.n_text_ctx - p)
    if max_new < 1:
        raise ValueError(f"prefix length {p} leaves no room to generate")

    def dpos(pos):
        return jnp.minimum(pos, cfg_draft.n_text_ctx - 1)
    cache_len = p + max_new + k + 1  # chunk overshoot margin
    feats_d = input_features if input_features_draft is None else input_features_draft

    # ---- prefill both models on the prefix (scalar offsets, like greedy) --
    def prefill(params, cfg, feats, pos_fn=lambda x: x):
        enc = encode_audio(params, cfg, feats)
        cross = precompute_cross_kv(params, cfg, enc)
        if cfg.quantize_cross_kv:
            from ..models.whisper import quantize_cross_kv

            cross = quantize_cross_kv(cross)
        cache = init_kv_cache(cfg, b, cache_len)
        prefix_pos = jnp.maximum(
            jnp.cumsum(prefix_mask.astype(jnp.int32), axis=1) - 1, 0)
        key_mask = jnp.concatenate(
            [prefix_mask, jnp.ones((b, cache_len - p), bool)], axis=1)
        logits, cache = decode_tokens(
            params, cfg, prefix_ids, cross_kv=cross, cache=cache,
            pos_offset=0, token_positions=pos_fn(prefix_pos),
            self_mask=key_mask)
        return logits, cache, cross, key_mask, prefix_pos

    lg_t, cache_t, cross_t, key_mask, prefix_pos = prefill(
        params_target, cfg_target, input_features)
    _, cache_d, cross_d, _, _ = prefill(params_draft, cfg_draft, feats_d,
                                        pos_fn=dpos)

    no_speech_prob = None
    if no_speech_id is not None:
        off = jnp.broadcast_to(jnp.asarray(sot_offset, jnp.int32), (b,))
        sot_lg = lg_t[jnp.arange(b), p - off].astype(jnp.float32)
        no_speech_prob = jax.nn.softmax(sot_lg, axis=-1)[:, no_speech_id]

    use_bias = bias_spans is not None and bias_boost != 0.0
    if bias_spans is None:
        bias_spans = jnp.zeros((b, 1, 1), jnp.int32)
    bias_state0 = init_bias_state(bias_spans, span_pad_id)
    if use_bias:
        bias_state0 = seed_bias_state_from_prefix(
            bias_state0, bias_spans, prefix_ids, prefix_mask)

    def bonused(lg, state):
        lg = lg.astype(jnp.float32)
        if use_bias:
            lg = lg + bias_bonus(state, bias_spans, v, bias_boost)
        return lg

    # first emitted token: target's (biased) greedy pick on the prefill
    # logits — identical to greedy_decode's first_tok
    lg0 = bonused(lg_t[:, -1], bias_state0)
    cur0 = jnp.argmax(lg0, axis=-1).astype(jnp.int32)
    sum_lp0 = jnp.take_along_axis(
        jax.nn.log_softmax(lg0, axis=-1), cur0[:, None], axis=1)[:, 0]
    state_after_cur0 = (
        advance_bias_state(bias_state0, bias_spans, cur0) if use_bias else bias_state0
    )
    pos_cur0 = prefix_pos[:, -1] + 1  # position id of cur0

    out0 = jnp.full((b, max_new + 1), eot_id, jnp.int32)  # +1 scratch column
    out0 = out0.at[:, 0].set(cur0)
    finished0 = (cur0 == eot_id) | (max_new == 1)

    class Carry(NamedTuple):
        n: jax.Array          # (B,) emitted count (incl. cur)
        cur: jax.Array        # (B,) last emitted token (target-verified)
        pos_cur: jax.Array    # (B,) its position id
        cache_d: dict
        cache_t: dict
        out: jax.Array        # (B, max_new+1)
        finished: jax.Array   # (B,)
        bias_state: BiasTrieState  # advanced through all emitted tokens
        sum_lp: jax.Array     # (B,) f32 — greedy-parity logprob accumulator
        rounds: jax.Array     # scalar int32 — verification rounds so far

    def round_step(c: Carry) -> Carry:
        slot_cur = p + c.n - 1  # (B,) cache slot of cur

        # ---- draft phase: k+1 cached single-token steps ------------------
        def draft_body(j, dst):
            ds, cache_d, dstate = dst
            x = jax.lax.dynamic_index_in_dim(ds, j, axis=1, keepdims=False)
            lg, cache_d = decode_tokens(
                params_draft, cfg_draft, x[:, None], cross_kv=cross_d,
                cache=cache_d, pos_offset=slot_cur + j,
                token_positions=dpos(c.pos_cur + j)[:, None],
                self_mask=key_mask)
            nxt = jnp.argmax(bonused(lg[:, -1], dstate), axis=-1).astype(jnp.int32)
            dstate = (advance_bias_state(dstate, bias_spans, nxt)
                      if use_bias else dstate)
            ds = ds.at[:, j + 1].set(nxt)
            return ds, cache_d, dstate

        ds0 = jnp.zeros((b, k + 2), jnp.int32).at[:, 0].set(c.cur)
        # k productive steps + 1 write-only step (so a fully-accepted chunk's
        # last token has its K/V in the draft cache for the next round)
        ds, cache_d, _ = jax.lax.fori_loop(
            0, k + 1, draft_body, (ds0, c.cache_d, c.bias_state))
        chunk_in = ds[:, : k + 1]   # [cur, d1..dk]
        drafted = ds[:, 1: k + 1]   # [d1..dk]

        # ---- verify phase: ONE target forward over k+1 positions ---------
        lg, cache_t = decode_tokens(
            params_target, cfg_target, chunk_in, cross_kv=cross_t,
            cache=c.cache_t, pos_offset=slot_cur,
            token_positions=c.pos_cur[:, None] + jnp.arange(k + 1)[None, :],
            self_mask=key_mask)

        # target argmax t_j at each position, with the trie state advanced
        # along the chunk (state_j includes cur and d_1..d_j — exactly the
        # prefix under which t_j would be used)
        def verify_scan(state, xs):
            lg_j, d_j = xs  # (B, V), (B,) the chunk token at this position
            blg = bonused(lg_j, state)
            t_j = jnp.argmax(blg, axis=-1).astype(jnp.int32)
            lp_j = jnp.take_along_axis(
                jax.nn.log_softmax(blg, axis=-1), t_j[:, None], axis=1)[:, 0]
            state = (advance_bias_state(state, bias_spans, d_j)
                     if use_bias else state)
            return state, (t_j, lp_j)

        # scan over positions: xs leading axis = k+1
        _, (t_seq, lp_seq) = jax.lax.scan(
            verify_scan, c.bias_state,
            (jnp.swapaxes(lg.astype(jnp.float32), 0, 1), jnp.swapaxes(drafted_pad(ds, k), 0, 1)))
        t_seq = jnp.swapaxes(t_seq, 0, 1)    # (B, k+1): t_0..t_k
        lp_seq = jnp.swapaxes(lp_seq, 0, 1)  # (B, k+1)

        # acceptance: d_{j+1} accepted while it equals t_j (greedy target)
        match = drafted == t_seq[:, :k]                      # (B, k)
        acc = jnp.cumprod(match.astype(jnp.int32), axis=1)   # running accept
        a = jnp.sum(acc, axis=1)                             # (B,) 0..k
        correction = jnp.take_along_axis(t_seq, a[:, None], axis=1)[:, 0]

        # tokens emitted this round: [d1..da, correction]
        chunk_out = jnp.concatenate([drafted, correction[:, None]], axis=1)
        chunk_out = jnp.where(
            jnp.arange(k + 1)[None, :] == a[:, None], correction[:, None],
            chunk_out)
        jidx = jnp.arange(k + 1)[None, :]
        in_chunk = jidx <= a[:, None]
        # stop at the first eot WITHIN the emitted part (inclusive)
        is_eot = (chunk_out == eot_id) & in_chunk
        eot_before = jnp.cumsum(
            jnp.concatenate([jnp.zeros((b, 1), jnp.int32),
                             is_eot[:, :-1].astype(jnp.int32)], axis=1), axis=1) > 0
        capacity = (c.n[:, None] + jidx) < max_new
        valid = in_chunk & ~eot_before & capacity & ~c.finished[:, None]

        # scatter valid chunk tokens into the output buffer
        write_idx = jnp.where(valid, c.n[:, None] + jidx, max_new)  # scratch col
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, k + 1))
        out = c.out.at[rows.reshape(-1), write_idx.reshape(-1)].set(
            chunk_out.reshape(-1))

        emitted = jnp.sum(valid, axis=1)                      # (B,)
        n = c.n + emitted
        # every emitted token's (biased) target logprob — the emitted token
        # at chunk position j IS t_seq[j] (accepted draft == target argmax)
        sum_lp = c.sum_lp + jnp.sum(jnp.where(valid, lp_seq, 0.0), axis=1)
        finished = c.finished | jnp.any(is_eot & valid, axis=1) | (n >= max_new)
        cur = jnp.where(c.finished, c.cur, correction)
        pos_cur = c.pos_cur + emitted

        # advance the carried trie state over the VALID emitted tokens only
        if use_bias:
            def adv(state, xs):
                tok, ok = xs
                new = advance_bias_state(state, bias_spans, tok)
                state = BiasTrieState(
                    jnp.where(ok[:, None], new.matched, state.matched),
                    state.span_len)
                return state, None

            bias_state, _ = jax.lax.scan(
                adv, c.bias_state,
                (jnp.swapaxes(chunk_out, 0, 1), jnp.swapaxes(valid, 0, 1)))
        else:
            bias_state = c.bias_state

        return Carry(n, cur, pos_cur, cache_d, cache_t, out, finished,
                     bias_state, sum_lp, c.rounds + 1)

    def cond(c: Carry):
        return jnp.any(~c.finished)

    init = Carry(jnp.ones((b,), jnp.int32), cur0, pos_cur0, cache_d, cache_t,
                 out0, finished0, state_after_cur0, sum_lp0,
                 jnp.int32(0))
    final = jax.lax.while_loop(cond, round_step, init)

    tokens = final.out[:, :max_new]
    is_eot = tokens == eot_id
    any_eot = jnp.any(is_eot, axis=1)
    lengths = jnp.where(any_eot, jnp.argmax(is_eot, axis=1), max_new).astype(jnp.int32)
    return GreedyResult(tokens=tokens, lengths=lengths,
                        sum_logprob=final.sum_lp, no_speech_prob=no_speech_prob,
                        spec_rounds=final.rounds)


def speculative_decode_batch(
    params_draft,
    cfg_draft: WhisperConfig,
    params_target,
    cfg_target: WhisperConfig,
    tokenizer,
    input_features,
    contexts: list[list[int]] | None = None,
    max_new: int = 224,
    bias_spans=None,
    bias_boost: float = 0.0,
    k: int = 4,
    include_notimestamps: bool = False,
    pad_to_multiple: int | None = None,
    starts: list[list[int]] | None = None,
    input_features_draft=None,
    mesh=None,
) -> list[list[int]]:
    """Host-side convenience mirroring ``greedy.decode_batch``: build
    prefixes (optional ``<|sop|>+context`` conditioning, per-row ``starts``),
    run the jitted speculative loop, strip to finished token lists. Output
    token lists are identical to ``decode_batch`` with the target model.

    ``mesh``: shard the decode batch axis over the mesh's "data" axis (and
    both models' params over "model" when the caller sharded them), exactly
    like ``decode_batch``. The per-row cache-offset machinery is row-local,
    so batch sharding composes (tests/test_parallel.py)."""
    import numpy as np

    from .bias_processor import sanitize_bias_spans
    from .greedy import pack_prefixes

    b = input_features.shape[0]
    if starts is None:
        start: list[int] = [tokenizer.sot]
        if include_notimestamps:
            start = tokenizer.prefix_tokens
        starts = [start] * b
    if contexts is None:
        prefixes = [list(st) for st in starts]
    else:
        prefixes = [([tokenizer.sop] + list(c) + list(st)) if c else list(st)
                    for c, st in zip(contexts, starts)]
    ids, mask = pack_prefixes(prefixes, tokenizer.eot,
                              pad_to_multiple=pad_to_multiple)
    spans = sanitize_bias_spans(bias_spans)
    if mesh is not None:
        from ..parallel import shard_decode_inputs

        (feats, ids, mask, spans, feats_d), b = shard_decode_inputs(
            mesh, input_features, ids, mask, spans, input_features_draft)
    else:
        feats = jnp.asarray(input_features)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        spans = None if spans is None else jnp.asarray(spans)
        feats_d = (None if input_features_draft is None
                   else jnp.asarray(input_features_draft))
    res = speculative_greedy_decode(
        params_draft, cfg_draft, params_target, cfg_target,
        feats, ids, mask,
        k=k, max_new=max_new, eot_id=tokenizer.eot,
        bias_spans=spans,
        bias_boost=bias_boost, span_pad_id=tokenizer.eot,
        input_features_draft=feats_d)
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    return [toks[i, : lens[i]].tolist() for i in range(b)]


_DRAFT_OVERRIDE_KEYS = ("flash_attention", "flash_block_q",
                        "quantize_cross_kv", "fused_quant_cross",
                        "gelu_approx")


def load_draft(
    model: str,
    checkpoint: str | None = None,
    *,
    dtype: str = "bfloat16",
    overrides: dict | None = None,
    target_cfg: WhisperConfig | None = None,
    cfg: WhisperConfig | None = None,
):
    """Shared draft-model loader for Pipeline / serve.py / transcribe.py.

    Builds the draft config from the family name, inheriting the caller's
    serving overrides (kernel/quantization keys only, so the draft runs the
    same fast path the target does), loads ``checkpoint`` or falls back to
    random init with the standard stderr warning, and validates the shared
    vocabulary against ``target_cfg``. Returns ``(params, cfg)``. A draft
    whose ``n_mels`` differs from the target's is allowed here — short-form
    decode feeds it a separate mel; long-form callers must check."""
    import sys

    from ..models import get_config, init_params, load_checkpoint_or_safetensors

    if cfg is None:
        ov = {km: vv for km, vv in (overrides or {}).items()
              if km in _DRAFT_OVERRIDE_KEYS}
        cfg = get_config(model, dtype=dtype, **ov)
    if checkpoint:
        params, cfg = load_checkpoint_or_safetensors(checkpoint, cfg)
    else:
        print("warning: random draft weights (no draft checkpoint): "
              "acceptance ~0, speculative decode will be slower than plain "
              "greedy", file=sys.stderr)
        params = init_params(cfg, 0)
    if target_cfg is not None and cfg.n_vocab != target_cfg.n_vocab:
        raise ValueError(f"draft {model} vocab {cfg.n_vocab} != target "
                         f"vocab {target_cfg.n_vocab}")
    return params, cfg


def drafted_pad(ds: jax.Array, k: int) -> jax.Array:
    """Chunk tokens consumed by the verify scan's state advance: positions
    0..k hold [d1..dk, <unused>] — position k's token is never used to form
    an accepted state (t_k is only consumed as the correction when all k
    drafts were accepted, and the correction's state advance happens in the
    carried-state pass)."""
    return ds[:, 1: k + 2]


def t0_verified_decode(
    params,
    cfg,
    tokenizer,
    mel,
    ids,
    mask,
    *,
    max_new: int,
    spans=None,
    bias_boost: float = 0.0,
    no_speech_id=None,
    sot_offset=1,
    medusa: dict | None = None,
    draft: tuple | None = None,     # (params_draft, cfg_draft, k)
):
    """The shared temperature-0 accelerator dispatch used by the long-form,
    chunked, and streaming ladders: medusa heads win over a draft model,
    both fall back to plain greedy; every branch returns a GreedyResult
    with identical token output (verification guarantees)."""
    import jax.numpy as jnp

    from .greedy import greedy_decode

    common = dict(max_new=max_new, eot_id=tokenizer.eot, bias_spans=spans,
                  bias_boost=bias_boost, span_pad_id=tokenizer.eot,
                  no_speech_id=no_speech_id, sot_offset=sot_offset)
    if medusa is not None:
        from ..models.medusa import split_medusa
        from .medusa import medusa_greedy_decode

        heads, n_chains = split_medusa(medusa)
        return medusa_greedy_decode(
            params, cfg, heads, jnp.asarray(mel), jnp.asarray(ids),
            jnp.asarray(mask), n_chains=n_chains, **common)
    if draft is not None:
        dparams, dcfg, dk = draft
        return speculative_greedy_decode(
            dparams, dcfg, params, cfg, jnp.asarray(mel), jnp.asarray(ids),
            jnp.asarray(mask), k=dk, **common)
    return greedy_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                         jnp.asarray(mask), **common)
