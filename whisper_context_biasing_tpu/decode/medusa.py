"""Medusa self-speculative greedy decoding: multi-token heads, one model.

Two-model speculative decoding (decode/speculative.py) pays a draft
forward per proposed token. Medusa ("Whisper in Medusa's Ear",
arXiv:2409.15869; Cai et al.) removes the draft entirely: K small heads on
the decoder's final hidden state (models/medusa.py) predict tokens
t+2..t+K+1, so each round is ONE cached target forward over K+1 positions
that simultaneously VERIFIES the previous proposal and (through the hidden
state at the last accepted position) PRODUCES the next one. The expensive
weight read advances ``accepted+1`` tokens per round, with zero extra
model passes — strictly cheaper per round than draft-model speculation.

Exactness: identical contract to ``speculative_greedy_decode`` — the
emitted sequence is BY CONSTRUCTION the target's greedy sequence (accepted
head predictions equal the target argmax at their position; the first
mismatch is replaced by the target argmax), for ANY head quality,
including untrained heads (they only set the speed). Bias-boosted decoding
composes: the trie state advances along the chunk inside the verify scan,
exactly as in the two-model path. Head proposals themselves are unbiased —
that can only lower acceptance, never change the output.

The loop structure (per-row cache offsets, chunk scatter, eot/capacity
masking, carried-trie advance) mirrors decode/speculative.py round_step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.config import WhisperConfig
from ..models.medusa import medusa_logits
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
    static_argnames=("cfg", "max_new", "eot_id", "bias_boost", "span_pad_id",
                     "no_speech_id", "n_chains"),
)
def medusa_greedy_decode(
    params,
    cfg: WhisperConfig,
    medusa: dict,                     # models/medusa.py head params (K heads)
    input_features: jax.Array,        # (B, n_mels, T)
    prefix_ids: jax.Array,            # (B, P) int32, left-padded
    prefix_mask: jax.Array,           # (B, P) bool
    max_new: int = 224,
    eot_id: int = 50256,
    bias_spans: jax.Array | None = None,
    bias_boost: float = 0.0,
    span_pad_id: int = 50256,
    no_speech_id: int | None = None,
    sot_offset=1,
    n_chains: int = 1,
) -> GreedyResult:
    """Returns a ``GreedyResult`` whose tokens/lengths bit-match
    ``greedy_decode(params, cfg, ...)``; sum_logprob / no_speech_prob carry
    the same semantics so the long-form ladder composes. ``spec_rounds``
    counts verify rounds (mean accepted run = max(lengths)/rounds)."""
    k = int(medusa["w"].shape[0])
    b, p = prefix_ids.shape
    v = cfg.n_vocab
    max_new = min(max_new, cfg.n_text_ctx - p)
    if max_new < 1:
        raise ValueError(f"prefix length {p} leaves no room to generate")
    cache_len = p + max_new + 1 + int(n_chains) * k  # chunk overshoot margin

    # ---- prefill (greedy-style scalar offsets) ----------------------------
    enc = encode_audio(params, cfg, input_features)
    cross = precompute_cross_kv(params, cfg, enc)
    if cfg.quantize_cross_kv:
        from ..models.whisper import quantize_cross_kv

        cross = quantize_cross_kv(cross)
    cache = init_kv_cache(cfg, b, cache_len)
    prefix_pos = jnp.maximum(
        jnp.cumsum(prefix_mask.astype(jnp.int32), axis=1) - 1, 0)
    key_mask = jnp.concatenate(
        [prefix_mask, jnp.ones((b, cache_len - p), bool)], axis=1)
    lg_pre, cache, hid_pre = decode_tokens(
        params, cfg, prefix_ids, cross_kv=cross, cache=cache, pos_offset=0,
        token_positions=prefix_pos, self_mask=key_mask, return_hidden=True)

    no_speech_prob = None
    if no_speech_id is not None:
        off = jnp.broadcast_to(jnp.asarray(sot_offset, jnp.int32), (b,))
        sot_lg = lg_pre[jnp.arange(b), p - off].astype(jnp.float32)
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

    # first emitted token + the hidden its round proposes from
    lg0 = bonused(lg_pre[:, -1], bias_state0)
    cur0 = jnp.argmax(lg0, axis=-1).astype(jnp.int32)
    sum_lp0 = jnp.take_along_axis(
        jax.nn.log_softmax(lg0, axis=-1), cur0[:, None], axis=1)[:, 0]
    hid0 = hid_pre[:, -1]  # (B, D)
    state_after_cur0 = (
        advance_bias_state(bias_state0, bias_spans, cur0)
        if use_bias else bias_state0)
    pos_cur0 = prefix_pos[:, -1] + 1

    out0 = jnp.full((b, max_new + 1), eot_id, jnp.int32)
    out0 = out0.at[:, 0].set(cur0)
    finished0 = (cur0 == eot_id) | (max_new == 1)

    class Carry(NamedTuple):
        n: jax.Array          # (B,) emitted count (incl. cur)
        cur: jax.Array        # (B,) last emitted token (target-verified)
        pos_cur: jax.Array    # (B,) its position id
        hid: jax.Array        # (B, D) hidden that proposed cur (head input)
        cache: dict
        out: jax.Array        # (B, max_new+1)
        finished: jax.Array   # (B,)
        bias_state: BiasTrieState
        sum_lp: jax.Array
        rounds: jax.Array

    s_ch = int(n_chains)
    if s_ch < 1:
        raise ValueError(f"n_chains must be >= 1, got {n_chains}")
    chunk_len = 1 + s_ch * k

    def round_step(c: Carry) -> Carry:
        slot_cur = p + c.n - 1  # (B,) cache slot of cur

        # ---- propose: s_ch chains branching on head-1's top-s candidates
        # (chain mode, Medusa tree attention restricted to depth-1
        # branching); deeper depths take each head's argmax, shared across
        # chains. s_ch=1 reduces exactly to the linear K-proposal round.
        md = medusa_logits(params, medusa, c.hid[:, None, :])[:, :, 0, :]
        _, top1 = jax.lax.top_k(md[0], s_ch)              # (B, s)
        first = top1.astype(jnp.int32)[:, :, None]        # (B, s, 1)
        if k > 1:
            deep = jnp.argmax(md[1:], axis=-1).astype(jnp.int32)  # (K-1, B)
            chains = jnp.concatenate(
                [first, jnp.broadcast_to(deep.T[:, None, :],
                                         (b, s_ch, k - 1))], axis=2)
        else:
            chains = first                                # (B, s, K)
        chunk_in = jnp.concatenate(
            [c.cur[:, None], chains.reshape(b, s_ch * k)], axis=1)

        # ---- verify: ONE forward over 1 + s*K positions ------------------
        # per-depth position ids (same-depth chain tokens share a position)
        depth = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.tile(jnp.arange(1, k + 1, dtype=jnp.int32), s_ch)])
        # per-query chain mask over cache slots: a chain token sees the
        # committed cache + cur + its OWN chain's earlier slots only (the
        # tree-attention mask; sibling chains are invisible). Slot-causality
        # inside decode_tokens hides stale/future slots.
        t_idx = jnp.arange(cache_len, dtype=jnp.int32)
        rel = t_idx[None, :] - (slot_cur[:, None] + 1)    # (B, T)
        in_tail = (rel >= 0) & (rel < s_ch * k)
        c_t = jnp.where(in_tail, rel // k, -1)
        qi = jnp.arange(chunk_len, dtype=jnp.int32)
        c_q = jnp.where(qi > 0, (qi - 1) // k, -2)        # (S,)
        allow = (~in_tail[:, None, :]) | (c_t[:, None, :]
                                          == c_q[None, :, None])
        sm = key_mask[:, None, :] & allow                 # (B, S, T)

        lg, cache, hid = decode_tokens(
            params, cfg, chunk_in, cross_kv=cross, cache=c.cache,
            pos_offset=slot_cur,
            token_positions=c.pos_cur[:, None] + depth[None, :],
            self_mask=sm, return_hidden=True)
        lg = lg.astype(jnp.float32)

        # shared depth-0 target: cur's logits predict the next committed
        # token under the carried trie state (which has consumed cur)
        lg0 = bonused(lg[:, 0], c.bias_state)
        t0 = jnp.argmax(lg0, axis=-1).astype(jnp.int32)
        lp0 = jnp.take_along_axis(
            jax.nn.log_softmax(lg0, axis=-1), t0[:, None], axis=1)[:, 0]

        # per-chain targets: flatten chains into the batch axis, tile the
        # trie state, advance by the chain token BEFORE scoring its logits
        flat_lg = lg[:, 1:].reshape(b, s_ch, k, v).reshape(b * s_ch, k, v)
        flat_chains = chains.reshape(b * s_ch, k)
        if use_bias:
            st0 = BiasTrieState(
                jnp.repeat(c.bias_state.matched, s_ch, axis=0),
                jnp.repeat(c.bias_state.span_len, s_ch, axis=0))
            spans_t = jnp.repeat(bias_spans, s_ch, axis=0)
        else:
            st0 = jnp.int32(0)

        def chain_scan(state, xs):
            lg_j, tok_j = xs
            if use_bias:
                state = advance_bias_state(state, spans_t, tok_j)
                blg = lg_j + bias_bonus(state, spans_t, v, bias_boost)
            else:
                blg = lg_j
            t_j = jnp.argmax(blg, axis=-1).astype(jnp.int32)
            lp_j = jnp.take_along_axis(
                jax.nn.log_softmax(blg, axis=-1), t_j[:, None], axis=1)[:, 0]
            return state, (t_j, lp_j)

        _, (t_c, lp_c) = jax.lax.scan(
            chain_scan, st0,
            (jnp.swapaxes(flat_lg, 0, 1), jnp.swapaxes(flat_chains, 0, 1)))
        t_c = jnp.swapaxes(t_c, 0, 1).reshape(b, s_ch, k)
        lp_c = jnp.swapaxes(lp_c, 0, 1).reshape(b, s_ch, k)

        # acceptance per chain: token d's target is t0 (d=1) / t_c[d-2]
        targets = (jnp.concatenate(
            [jnp.broadcast_to(t0[:, None, None], (b, s_ch, 1)),
             t_c[:, :, : k - 1]], axis=2) if k > 1
            else jnp.broadcast_to(t0[:, None, None], (b, s_ch, 1)))
        acc = jnp.cumprod((chains == targets).astype(jnp.int32), axis=2)
        a_ch = jnp.sum(acc, axis=2)                       # (B, s)
        best = jnp.argmax(a_ch, axis=1)                   # (B,) first max
        a = jnp.take_along_axis(a_ch, best[:, None], axis=1)[:, 0]
        proposed = jnp.take_along_axis(
            chains, best[:, None, None], axis=1)[:, 0]    # (B, K)
        t_seq = jnp.concatenate(
            [t0[:, None],
             jnp.take_along_axis(t_c, best[:, None, None], axis=1)[:, 0]],
            axis=1)                                       # (B, K+1)
        lp_seq = jnp.concatenate(
            [lp0[:, None],
             jnp.take_along_axis(lp_c, best[:, None, None], axis=1)[:, 0]],
            axis=1)
        correction = jnp.take_along_axis(t_seq, a[:, None], axis=1)[:, 0]
        # the hidden at the last ACCEPTED input position proposes next round
        hpos = jnp.where(a == 0, 0, 1 + best * k + (a - 1))
        hid_new = jnp.take_along_axis(hid, hpos[:, None, None], axis=1)[:, 0]

        # ---- cache relocation: committed slots must be contiguous --------
        # The forward wrote chain c's K/V at slots slot_cur+1+c*k .. +k-1,
        # but subsequent rounds' slot-causal attention assumes committed
        # tokens occupy slot_cur+1 .. slot_cur+a contiguously. Move the best
        # chain's k slots down to the front of the tail (identity when
        # best==0; slots past the accept point are overwritten next round).
        if s_ch > 1:
            ar_k = jnp.arange(k, dtype=jnp.int32)
            src = slot_cur[:, None] + 1 + best[:, None] * k + ar_k[None, :]
            dst = slot_cur[:, None] + 1 + ar_k[None, :]
            rows_k = jnp.broadcast_to(jnp.arange(b)[:, None], (b, k))

            def reloc(x):  # (L, B, T, D)
                vals = jnp.take_along_axis(x, src[None, :, :, None], axis=2)
                return x.at[:, rows_k, dst].set(vals)

            cache = {"k": reloc(cache["k"]), "v": reloc(cache["v"])}

        chunk_out = jnp.concatenate([proposed, correction[:, None]], axis=1)
        jidx = jnp.arange(k + 1)[None, :]
        chunk_out = jnp.where(jidx == a[:, None], correction[:, None],
                              chunk_out)
        in_chunk = jidx <= a[:, None]
        is_eot = (chunk_out == eot_id) & in_chunk
        eot_before = jnp.cumsum(
            jnp.concatenate([jnp.zeros((b, 1), jnp.int32),
                             is_eot[:, :-1].astype(jnp.int32)], axis=1),
            axis=1) > 0
        capacity = (c.n[:, None] + jidx) < max_new
        valid = in_chunk & ~eot_before & capacity & ~c.finished[:, None]

        write_idx = jnp.where(valid, c.n[:, None] + jidx, max_new)
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, k + 1))
        out = c.out.at[rows.reshape(-1), write_idx.reshape(-1)].set(
            chunk_out.reshape(-1))

        emitted = jnp.sum(valid, axis=1)
        n = c.n + emitted
        sum_lp = c.sum_lp + jnp.sum(jnp.where(valid, lp_seq, 0.0), axis=1)
        finished = c.finished | jnp.any(is_eot & valid, axis=1) | (n >= max_new)
        cur = jnp.where(c.finished, c.cur, correction)
        hid_cur = jnp.where(c.finished[:, None], c.hid, hid_new)
        pos_cur = c.pos_cur + emitted

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

        return Carry(n, cur, pos_cur, hid_cur, cache, out, finished,
                     bias_state, sum_lp, c.rounds + 1)

    def cond(c: Carry):
        return jnp.any(~c.finished)

    init = Carry(jnp.ones((b,), jnp.int32), cur0, pos_cur0, hid0, cache,
                 out0, finished0, state_after_cur0, sum_lp0, jnp.int32(0))
    final = jax.lax.while_loop(cond, round_step, init)

    tokens = final.out[:, :max_new]
    is_eot = tokens == eot_id
    any_eot = jnp.any(is_eot, axis=1)
    lengths = jnp.where(any_eot, jnp.argmax(is_eot, axis=1),
                        max_new).astype(jnp.int32)
    return GreedyResult(tokens=tokens, lengths=lengths,
                        sum_logprob=final.sum_lp,
                        no_speech_prob=no_speech_prob,
                        spec_rounds=final.rounds)


def medusa_decode_batch(
    params,
    cfg: WhisperConfig,
    medusa: dict,
    tokenizer,
    input_features,
    contexts: list[list[int]] | None = None,
    max_new: int = 224,
    bias_spans=None,
    bias_boost: float = 0.0,
    pad_to_multiple: int | None = None,
    starts: list[list[int]] | None = None,
    mesh=None,
) -> list[list[int]]:
    """Host-side convenience mirroring ``decode.greedy.decode_batch``
    (incl. ``mesh=``: the decode batch axis shards over "data")."""
    import numpy as np

    from .bias_processor import sanitize_bias_spans
    from .greedy import pack_prefixes

    b = input_features.shape[0]
    if starts is None:
        starts = [[tokenizer.sot]] * b
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

        (feats, ids, mask, spans), _ = shard_decode_inputs(
            mesh, np.asarray(input_features), np.asarray(ids),
            np.asarray(mask), None if spans is None else np.asarray(spans))
    else:
        feats = jnp.asarray(input_features)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        spans = None if spans is None else jnp.asarray(spans)
    from ..models.medusa import split_medusa

    heads, n_chains = split_medusa(medusa)
    res = medusa_greedy_decode(
        params, cfg, heads, feats, ids, mask,
        max_new=max_new, eot_id=tokenizer.eot, n_chains=n_chains,
        bias_spans=spans, bias_boost=bias_boost, span_pad_id=tokenizer.eot)
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    return [toks[i, : lens[i]].tolist() for i in range(b)]
