"""Long-form (>30 s) transcription: sequential windows with robust seeking.

The reference pads/trims every utterance to one 30 s window (its corpus is
short clips); real deployments need arbitrary-length audio. This module
implements Whisper-style sequential decoding with the robustness machinery of
OpenAI's long-form loop:

  * **history conditioning** — each window's decode is conditioned on the
    previous window's text through the same ``<|startofprev|>`` prompt
    mechanism the biasing stack already uses, so bias lists and long-form
    context compose;
  * **timestamp-conditioned seeking** (``use_timestamps=True``) — the model
    decodes with timestamp tokens enabled; the window advances to the last
    *closed* segment boundary instead of a fixed 30 s, and the trailing
    partial segment is dropped and re-decoded whole in the next window
    (fixed-stride windowing splits any sentence that straddles a boundary);
  * **temperature fallback** — a window whose transcript is degenerate
    (zlib compression ratio above ``compression_ratio_threshold``) or
    low-confidence (average token logprob below ``logprob_threshold``) is
    re-decoded at increasing temperatures until it passes, mirroring the
    (0.0, 0.2, ..., 1.0) ladder of the public Whisper decoder.

Batched across files: the current windows of many files decode together in
one XLA program; per-file histories ride the left-padded ragged-prefix
support. Each distinct temperature compiles once (static jit arg) and is
reused for every subsequent window/batch.
"""

from __future__ import annotations

import zlib
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..audio.mel import N_SAMPLES, SAMPLE_RATE, log_mel_spectrogram_np
from ..models.config import WhisperConfig
from .greedy import GreedyResult, greedy_decode, pack_prefixes

MAX_PROMPT_TOKENS = 190  # the reference's desc-prompt truncation bound
DEFAULT_TEMPERATURES = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)


def unpack_long_form(out, *, return_segments: bool = False,
                     word_timestamps: bool = False,
                     return_window_info: bool = False):
    """Normalize the flag-dependent variadic return of
    ``transcribe_long_batch`` / ``transcribe_chunked`` (which both emit
    ``(outputs[, segments[, words]][, window_info])``, collapsing to bare
    ``outputs`` when no flag is set) into a fixed 4-tuple
    ``(outputs, segments, words, window_info)`` with ``None`` for elements
    the flags did not request. Call with the same flag values the transcribe
    call used — every caller should unpack through this instead of
    positional ``*rest`` dances, so adding a future optional element can't
    silently shift positions at a stale call site."""
    if not isinstance(out, tuple):
        return out, None, None, None
    parts = list(out)
    winfo = parts.pop() if return_window_info else None
    hyps = parts[0]
    segs = parts[1] if return_segments else None
    words = parts[2] if (return_segments and word_timestamps) else None
    return hyps, segs, words, winfo


def split_windows(audio: np.ndarray, window: int = N_SAMPLES) -> list[np.ndarray]:
    """Non-overlapping fixed windows; the tail is zero-padded."""
    audio = np.asarray(audio, dtype=np.float32)
    n = max(1, int(np.ceil(len(audio) / window)))
    out = []
    for i in range(n):
        chunk = audio[i * window : (i + 1) * window]
        if len(chunk) < window:
            chunk = np.pad(chunk, (0, window - len(chunk)))
        out.append(chunk)
    return out


def compression_ratio(text: str) -> float:
    """bytes(text) / bytes(zlib(text)): degenerate repetition compresses far
    better than natural language (the public Whisper repetition heuristic)."""
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def window_quality_ok(
    text: str,
    avg_logprob: float | None,
    *,
    compression_ratio_threshold: float = 2.4,
    logprob_threshold: float | None = -1.0,
) -> bool:
    """Accept a decoded window unless it looks like a repetition loop or is
    uniformly low-confidence."""
    if compression_ratio_threshold and compression_ratio(text) > compression_ratio_threshold:
        return False
    if (logprob_threshold is not None and avg_logprob is not None
            and avg_logprob < logprob_threshold):
        return False
    return True


def timestamp_seek(
    tokens: list[int], tokenizer
) -> tuple[list[int], float | None]:
    """Timestamp-conditioned window advance.

    Returns ``(kept_tokens, advance_seconds)``: tokens up to (and including)
    the last timestamp token — the trailing partial segment is dropped so the
    next window re-decodes it whole — and the seconds to advance the seek
    point by (None = no usable timestamp, advance a full window)."""
    last_idx = -1
    last_val = 0.0
    for i, t in enumerate(tokens):
        v = tokenizer.timestamp_value(int(t))
        if v is not None:
            last_idx, last_val = i, v
    if last_idx < 0 or last_val <= 0.0:
        return tokens, None
    return tokens[: last_idx + 1], last_val


def _best_beam_as_greedy(res, length_penalty: float,
                         early_stopping: str = "off") -> GreedyResult:
    """Project a BeamResult onto the ladder's GreedyResult contract: the
    best beam's tokens/length/score per row (selection repeats the decoder's
    own rule per mode, so it matches ``res.best``) plus the prefill
    no-speech probability. In the HF modes ``scores`` are already
    length-penalized (beam_decode docstring), so the quality ladder's
    ``sum/(len+1)`` average stays comparable to greedy's only at
    length_penalty ~ 1; the t=0 acceptance decision still keys off the
    compression ratio first."""
    toks = np.asarray(res.tokens)
    scores = np.asarray(res.scores)
    lens = np.asarray(res.lengths)
    if early_stopping == "off":
        penal = scores / np.maximum(lens, 1).astype(np.float32) ** length_penalty
        sum_lp = scores
    else:
        penal = scores  # pool scores: penalized at insertion
        sum_lp = scores * np.maximum(lens, 1).astype(np.float32) ** length_penalty
    bi = penal.argmax(axis=1)
    rows = np.arange(toks.shape[0])
    return GreedyResult(toks[rows, bi], lens[rows, bi], sum_lp[rows, bi],
                        None if res.no_speech_prob is None
                        else np.asarray(res.no_speech_prob))


def _content_tokens(tokens: list[int], tokenizer) -> list[int]:
    """Strip specials and timestamp tokens (prompt/history hygiene)."""
    return [t for t in tokens
            if not tokenizer.is_special(t) and t < tokenizer.timestamp_begin]


def sample_best_of(call, temperature: float, key, n: int) -> GreedyResult:
    """OpenAI's ``best_of`` rule for sampled fallback rungs.

    Draw ``n`` independent samples of the whole batch and keep, per row,
    the candidate with the highest average token logprob (``sum/(len+1)``,
    the same ranking the quality ladder uses). Serial calls on purpose:
    each reuses the rung's already-compiled program, where batch-tiling
    would compile a fresh ``B*n`` program per temperature (minutes on a
    tunneled TPU). Callers route only ``temperature > 0`` here — greedy
    rungs are deterministic, repeats would be identical.

    ``call(temperature, rng_key) -> GreedyResult`` must populate
    ``sum_logprob`` (all in-tree decode paths do); without it every sample
    ties at zero and the first one wins.
    """
    import jax

    best: list | None = None
    for _ in range(max(1, n)):
        key, sub = jax.random.split(key)
        res = call(temperature, sub)
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
        slp = (np.asarray(res.sum_logprob, np.float32)
               if res.sum_logprob is not None
               else np.zeros(len(lens), np.float32))
        avg = slp / (lens + 1)
        if best is None:
            best = [toks.copy(), lens.copy(), slp.copy(), avg,
                    res.no_speech_prob, res.spec_rounds]
        else:
            if toks.shape[1] != best[0].shape[1]:
                # injected decode_fns may size the token axis per call;
                # grow both to the wider width (pad value is never read —
                # rows are consumed as toks[i, :lens[i]])
                w = max(toks.shape[1], best[0].shape[1])
                toks = np.pad(toks, ((0, 0), (0, w - toks.shape[1])))
                best[0] = np.pad(best[0], ((0, 0), (0, w - best[0].shape[1])))
            better = avg > best[3]
            if better.any():
                best[0][better] = toks[better]
                best[1][better] = lens[better]
                best[2][better] = slp[better]
                best[3][better] = avg[better]
    return GreedyResult(best[0], best[1], best[2], best[4], best[5])


def transcribe_long_batch(
    params,
    cfg: WhisperConfig,
    tokenizer,
    audios: list[np.ndarray],
    *,
    mel_fn=None,
    max_new: int = 224,
    condition_on_previous: bool = True,
    prompt_reset_on_temperature: float | None = 0.5,
                                 # a window produced by a rung HOTTER than
                                 # this clears the file's history prompt so
                                 # possible hallucinations don't propagate
                                 # into later windows (faster-whisper's
                                 # rule and default); None disables
    contexts: list[list[int]] | None = None,   # static per-file context (e.g. bias desc)
    bias_spans: np.ndarray | None = None,       # (B, N, K) per file
    bias_boost: float = 0.0,
    use_timestamps: bool = False,
    temperatures: tuple[float, ...] = DEFAULT_TEMPERATURES,
    best_of: int = 1,            # >1: each SAMPLED rung draws n candidates
                                 # and keeps the best avg-logprob per row
                                 # (OpenAI's best_of; greedy rung unaffected)
    compression_ratio_threshold: float | None = 2.4,
    logprob_threshold: float | None = -1.0,
    no_speech_threshold: float | None = 0.6,
    decode_fn: Callable[..., GreedyResult] | None = None,
    rng_key=None,
    prefix_pad_to_multiple: int | None = None,
    return_segments: bool = False,
    return_window_info: bool = False,  # per-window QC dicts appended as the
                                       # LAST return element: start_s,
                                       # temperature, avg_logprob,
                                       # no_speech_prob, compression_ratio,
                                       # accepted (quality-ladder verdict)
    word_timestamps: bool = False,   # per-window cross-attention alignment
    alignment_heads: list[tuple[int, int]] | None = None,
    start_tokens: list[list[int]] | None = None,  # per-file decode starts
    window_samples: int = N_SAMPLES,  # 30 s for the standard configs
    vad: bool | dict = False,    # host-side energy VAD (audio/vad.py):
                                 # windows with no detected speech are
                                 # skipped BEFORE mel/encode/decode and the
                                 # seek jumps to the next speech onset;
                                 # dict = speech_segments() overrides
    draft: tuple | None = None,  # (params_draft, cfg_draft, k): speculative
                                 # decoding for the temperature-0 pass
                                 # (decode/speculative.py; exact output)
    medusa: dict | None = None,  # Medusa head tree: self-speculative t=0
                                 # rung (decode/medusa.py; wins over draft)
    num_beams: int = 1,          # >1: beam search drives the t=0 rung
                                 # (OpenAI long-form composition: beam at
                                 # temperature 0, sampling at the fallback
                                 # rungs); wins over `draft`/`medusa`
    length_penalty: float = 1.0,
    beam_early_stopping: str = "off",
    mesh=None,                   # each window call's decode batch (the file
                                 # axis) shards over the mesh's "data" axis
                                 # (params pre-sharded by the caller)
) -> list[list[int]]:
    """Returns per-file token lists (concatenated over windows; timestamp
    tokens are kept when ``use_timestamps`` so callers can segment with
    ``tokenizer.split_timestamp_segments``).

    ``return_segments=True`` returns ``(tokens, segments)`` where
    ``segments[i]`` is a list of ``(start_s, end_s | None, text)`` in
    *absolute* file time (window timestamps are offset by each window's seek
    position — required for subtitle output past the first 30 s window).
    Without ``use_timestamps`` each window becomes one segment spanning its
    audio.

    ``word_timestamps=True`` (with ``return_segments``) additionally returns
    per-file WordTiming lists: each emitted window's tokens are aligned via
    cross-attention DTW (decode/word_timestamps.py) in one batched pass per
    window iteration, with times offset into absolute file time.

    ``no_speech_threshold``: a window whose ``P(<|nospeech|>)`` at the sot
    position exceeds it AND whose avg logprob is below ``logprob_threshold``
    is treated as silence — nothing is emitted and the seek advances a full
    window (OpenAI's long-form silence rule; confident decodes override the
    silence signal).

    ``vad=True`` (or a dict of ``audio.vad.speech_segments`` overrides)
    gates windows on host-side energy VAD: silent regions are skipped
    without any device work and the seek jumps to the next speech onset.
    Audio with no detected speech at all produces no windows (empty
    output). A list of ``(start_s, end_s)`` ranges decodes ONLY those
    ranges (the clip_timestamps idiom — no energy detection involved).
    Complements — not replaces — the post-decode no-speech rule.

    ``decode_fn(mel, ids, mask, temperature, rng_key) -> GreedyResult`` can
    be injected (tests, beam variants); the default wraps ``greedy_decode``
    with this call's bias arguments. ``prefix_pad_to_multiple`` buckets the
    history-prompt length so serving paths reuse a handful of compiled
    decode programs instead of recompiling per window."""
    if mel_fn is None:
        mel_fn = lambda a: np.stack([log_mel_spectrogram_np(x, cfg.n_mels) for x in a])  # noqa: E731
    if decode_fn is None:
        spans = None if bias_spans is None else jnp.asarray(bias_spans)
        # per-row <|sot|> offsets: start sequences may differ per file
        # (e.g. auto-detected languages)
        sot_off = (jnp.asarray([len(st) for st in start_tokens], jnp.int32)
                   if start_tokens else 1)

        if draft is not None and draft[1].n_mels != cfg.n_mels:
            raise ValueError("long-form speculative decoding needs a draft "
                             "with the target's n_mels (mel_fn is shared)")

        def decode_fn(mel, ids, mask, temperature, key):
            ns_id = (tokenizer.no_speech
                     if no_speech_threshold is not None else None)
            sp, so = spans, sot_off
            if mesh is not None:
                from ..parallel import shard_decode_inputs

                soff = None if isinstance(so, int) else np.asarray(so)
                (mel, ids, mask, sp, soff), _ = shard_decode_inputs(
                    mesh, np.asarray(mel), np.asarray(ids), np.asarray(mask),
                    None if sp is None else np.asarray(sp), soff)
                if soff is not None:
                    so = soff
            # OpenAI timestamp rules for timestamp-mode decode: applied per
            # beam and on plain-greedy ladder rungs alike (greedy.py
            # apply_timestamp_rules); kept off when medusa/draft drive t=0
            # so the speculative-equals-greedy contract stays ladder-
            # consistent
            ts_begin = (tokenizer.timestamp_begin
                        if (use_timestamps and medusa is None
                            and draft is None) else None)
            if num_beams > 1 and temperature == 0.0:
                from .beam import beam_decode

                res = beam_decode(
                    params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                    jnp.asarray(mask), num_beams=num_beams, max_new=max_new,
                    eot_id=tokenizer.eot, bias_spans=sp,
                    bias_boost=bias_boost, span_pad_id=tokenizer.eot,
                    length_penalty=length_penalty,
                    early_stopping=beam_early_stopping,
                    no_speech_id=ns_id, sot_offset=so,
                    timestamp_begin=ts_begin)
                return _best_beam_as_greedy(res, length_penalty,
                                            beam_early_stopping)
            if temperature == 0.0 and (medusa is not None
                                        or draft is not None):
                from .speculative import t0_verified_decode

                return t0_verified_decode(
                    params, cfg, tokenizer, mel, ids, mask, max_new=max_new,
                    spans=sp, bias_boost=bias_boost, no_speech_id=ns_id,
                    sot_offset=so, medusa=medusa, draft=draft)
            return greedy_decode(
                params, cfg, jnp.asarray(mel), jnp.asarray(ids), jnp.asarray(mask),
                max_new=max_new, eot_id=tokenizer.eot,
                bias_spans=sp, bias_boost=bias_boost,
                span_pad_id=tokenizer.eot,
                temperature=temperature, rng_key=key,
                no_speech_id=ns_id,
                sot_offset=so,
                timestamp_begin=ts_begin,
            )
    # words are only reachable through the (tokens, segments, words) return:
    # without return_segments the DTW alignment would be pure wasted compute
    word_timestamps = word_timestamps and return_segments
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    if not temperatures:
        temperatures = (0.0,)

    b = len(audios)
    audios = [np.asarray(a, np.float32) for a in audios]
    vad_segs = None
    if vad is not None and vad is not False:  # NB: vad={} means defaults
        from ..audio.vad import (
            has_speech, next_onset, resolve_vad, vad_overlap_tol)

        vad_segs = [resolve_vad(vad, a) for a in audios]
        if all(s is None for s in vad_segs):  # e.g. vad=[] — no gating
            vad_segs = None
        # pad-only overlap is not speech (clamped: see chunked.py)
        vad_tol = min(vad_overlap_tol(vad), window_samples // 4)
    seek = [0] * b                      # sample offset of each file's window
    started = [False] * b               # zero-length audio still gets 1 window
    histories: list[list[int]] = [[] for _ in range(b)]
    outputs: list[list[int]] = [[] for _ in range(b)]
    segments: list[list[tuple[float, float | None, str]]] = [[] for _ in range(b)]
    words: list[list] = [[] for _ in range(b)]
    window_info: list[list[dict]] = [[] for _ in range(b)]

    def active(i):
        return not started[i] or seek[i] < len(audios[i])

    while any(active(i) for i in range(b)):
        if vad_segs is not None:
            # fast-forward silent regions: a window with no detected speech
            # never reaches the device; the seek jumps straight to the next
            # speech onset (or the end of the file)
            for i in range(b):
                if active(i) and not has_speech(
                        vad_segs[i], seek[i], seek[i] + window_samples,
                        tol=vad_tol):
                    onset = next_onset(vad_segs[i], seek[i], tol=vad_tol)
                    started[i] = True
                    seek[i] = len(audios[i]) if onset is None else onset
            if not any(active(i) for i in range(b)):
                break
        chunk = np.zeros((b, window_samples), np.float32)
        for i in range(b):
            if active(i):
                part = audios[i][seek[i] : seek[i] + window_samples]
                chunk[i, : len(part)] = part
        mel = mel_fn(chunk)

        prefixes = []
        for i in range(b):
            ctx: list[int] = []
            if contexts is not None and contexts[i]:
                ctx.extend(contexts[i])
            if condition_on_previous and histories[i]:
                room = MAX_PROMPT_TOKENS - len(ctx)
                if room > 0:
                    ctx.extend(histories[i][-room:])
            # a bare <|sot|> start leaves timestamp tokens unsuppressed
            # (reference-parity generation config, scripts/train.py:211);
            # start_tokens overrides it (language/task forcing)
            start = list(start_tokens[i]) if start_tokens else [tokenizer.sot]
            if ctx:
                prefixes.append([tokenizer.sop] + ctx + start)
            else:
                prefixes.append(start)
        ids, mask = pack_prefixes(prefixes, tokenizer.eot,
                                  pad_to_multiple=prefix_pad_to_multiple)

        # temperature fallback ladder: first acceptable decode per row wins;
        # rows that fail every rung keep the last (highest-temperature) one
        accepted: list[list[int] | None] = [None] * b
        last: list[list[int]] = [[] for _ in range(b)]
        last_avg_lp: list[float | None] = [None] * b
        last_temp: list[float] = [0.0] * b  # rung that produced each row
        nsp = None
        for ti, temperature in enumerate(temperatures):
            rng_key, sub = jax.random.split(rng_key)
            if temperature > 0 and best_of > 1:
                res = sample_best_of(
                    lambda t, k: decode_fn(mel, ids, mask, t, k),
                    temperature, sub, best_of)
            else:
                res = decode_fn(mel, ids, mask, temperature, sub)
            toks = np.asarray(res.tokens)
            lens = np.asarray(res.lengths)
            slp = np.asarray(res.sum_logprob) if res.sum_logprob is not None else None
            if (ti == 0 and no_speech_threshold is not None
                    and res.no_speech_prob is not None):
                nsp = np.asarray(res.no_speech_prob)  # prefill-derived:
                # identical at every rung, so read it once
            pending = False
            for i in range(b):
                if not active(i) or accepted[i] is not None:
                    continue
                row = toks[i, : lens[i]].tolist()
                last[i] = row
                last_temp[i] = float(temperature)
                avg_lp = None if slp is None else float(slp[i]) / (int(lens[i]) + 1)
                last_avg_lp[i] = avg_lp
                text = tokenizer.decode(row, skip_special_tokens=True)
                if window_quality_ok(
                    text, avg_lp,
                    compression_ratio_threshold=compression_ratio_threshold or 0.0,
                    logprob_threshold=logprob_threshold,
                ):
                    accepted[i] = row
                else:
                    pending = True
            if not pending:
                break

        # snapshot the ladder's verdict BEFORE the silence rule overwrites
        # accepted[i] — window_info's "accepted" field is the quality-ladder
        # verdict on every surface (chunked never overwrites, so this keeps
        # the two long-form modes reporting identically)
        ladder_ok = [accepted[i] is not None for i in range(b)]
        # window_info reports the compression ratio the ladder actually gated
        # on — the final rung's FULL row, before the silence rule empties it
        # and before timestamp_seek trims the incomplete trailing segment.
        # All three long-form surfaces compute this identically.
        ladder_cr = (
            [round(compression_ratio(tokenizer.decode(
                accepted[i] if accepted[i] is not None else last[i],
                skip_special_tokens=True)), 3) for i in range(b)]
            if return_window_info else None)

        # OpenAI's silence rule, applied AFTER the fallback ladder to its
        # final result: high P(<|nospeech|>) drops the window unless the
        # (possibly retried) decode ended up confident
        if nsp is not None:
            for i in range(b):
                if not active(i) or nsp[i] <= no_speech_threshold:
                    continue
                if not (logprob_threshold is not None
                        and last_avg_lp[i] is not None
                        and last_avg_lp[i] > logprob_threshold):
                    accepted[i] = []  # emit nothing, advance a full window

        # resolve each row's kept tokens and seek advance
        kept_rows: dict[int, list[int]] = {}
        advances: dict[int, int] = {}
        for i in range(b):
            if not active(i):
                continue
            row = accepted[i] if accepted[i] is not None else last[i]
            advance = window_samples
            if use_timestamps:
                kept, adv_s = timestamp_seek(row, tokenizer)
                if adv_s is not None:
                    # never stall: a sub-frame advance re-decodes forever
                    advance = max(int(adv_s * SAMPLE_RATE), window_samples // 100)
                    row = kept
            kept_rows[i], advances[i] = row, advance

        if word_timestamps:
            # one batched alignment pass over this iteration's emitted rows,
            # word times offset into absolute file time
            from .word_timestamps import find_word_timestamps

            act = [i for i in kept_rows if kept_rows[i]]
            if act:
                frames = [max(2, min(window_samples,
                                     max(len(audios[i]) - seek[i], 0)) // 320)
                          for i in act]
                starts_act = ([start_tokens[i] for i in act]
                              if start_tokens else None)
                timings = find_word_timestamps(
                    params, cfg, tokenizer, np.asarray(mel)[act],
                    [kept_rows[i] for i in act],
                    starts=starts_act, num_frames=frames,
                    alignment_heads=alignment_heads,
                    # static token axis: window hyp lengths vary, one
                    # compiled alignment program must serve them all
                    pad_to=max_new + 8)
                for i, ws in zip(act, timings):
                    offset = seek[i] / SAMPLE_RATE
                    for w in ws:
                        w.start = round(w.start + offset, 3)
                        w.end = round(w.end + offset, 3)
                    words[i].extend(ws)

        for i, row in kept_rows.items():
            if return_window_info:
                window_info[i].append({
                    "start_s": round(seek[i] / SAMPLE_RATE, 3),
                    "temperature": last_temp[i],
                    "avg_logprob": last_avg_lp[i],
                    "no_speech_prob": (float(nsp[i]) if nsp is not None
                                       else None),
                    "compression_ratio": ladder_cr[i],
                    "accepted": ladder_ok[i],
                })
            if return_segments:
                offset = seek[i] / SAMPLE_RATE
                if use_timestamps:
                    for a, e, text in tokenizer.split_timestamp_segments(row):
                        segments[i].append(
                            (offset + a, None if e is None else offset + e, text))
                else:
                    span = min(window_samples, max(len(audios[i]) - seek[i], 0))
                    text = tokenizer.decode(row, skip_special_tokens=True)
                    if text.strip():
                        segments[i].append(
                            (offset, offset + span / SAMPLE_RATE, text))
            started[i] = True
            seek[i] += advances[i]
            if (prompt_reset_on_temperature is not None
                    and last_temp[i] > prompt_reset_on_temperature):
                # a hot rung produced this window — do not propagate its
                # (possibly hallucinated) text into later windows' prompts
                histories[i] = []
            else:
                content = _content_tokens(row, tokenizer)
                histories[i] = (histories[i] + content)[-MAX_PROMPT_TOKENS:]
            outputs[i].extend(row)
    out: tuple = (outputs,)
    if return_segments:
        out += (segments,)
        if word_timestamps:
            out += (words,)
    if return_window_info:
        out += (window_info,)
    return out if len(out) > 1 else outputs


def transcribe_long(
    params, cfg, tokenizer, audio: np.ndarray, **kwargs
) -> str:
    """Single-file convenience: audio of any length -> text."""
    toks = transcribe_long_batch(params, cfg, tokenizer, [audio], **kwargs)[0]
    return tokenizer.decode(toks, skip_special_tokens=True)
