"""Chunked long-form transcription: ALL windows of a file decode in one
batch — the TPU-first throughput alternative to the sequential seek loop.

``long_form.transcribe_long_batch`` (the quality-optimal path) conditions
every window on the previous window's text, which makes windows inherently
sequential: a 60-minute file is 120 dependent decode calls. This module
trades that conditioning for parallelism: windows overlap by a stride,
decode independently — so every window of every file lands in one (or a
few) large decode batches that saturate the MXU — and the overlap regions
resolve boundary artifacts at merge time:

  * **timestamp mode** (default): windows decode with timestamp tokens; a
    segment belongs to the window in whose *core* region (the part not
    covered by a neighbour's core) its absolute start time falls. Each
    segment is owned by exactly one window, so concatenating owned segments
    in time order yields an artifact-free transcript.
  * **token mode** (``use_timestamps=False``): consecutive windows' token
    sequences are merged by a sliding longest-common-sequence alignment
    over the overlap (the published merge of the HF chunked-ASR algorithm,
    re-derived here), which needs no timestamps.

The per-window robustness machinery of the sequential loop is preserved and
stays batched: the temperature fallback ladder re-decodes only the failing
windows (all of them in one call per rung), and OpenAI's no-speech rule
drops silent windows. Bias spans / context prompts apply to every window of
their file, so contextual biasing composes exactly as in short-form decode.

Cost model: sequential decodes W windows in W dependent calls of batch B
(the number of files); chunked decodes ceil(W_total / max_batch) calls of
batch max_batch. For one long file on an idle chip that is ~W× more
parallel work per call — wall-clock follows the decode batch-scaling curve
(docs/PERF.md), an order of magnitude for typical podcast-length audio.

No reference counterpart (the reference pads/trims to one window,
data_utils/data_loader.py:60-75); the sequential twin is
``decode/long_form.py``.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from functools import partial

from ..audio.mel import N_SAMPLES, SAMPLE_RATE, log_mel_spectrogram_np
from ..models.config import WhisperConfig
from .greedy import greedy_decode, pack_prefixes
from .long_form import (
    DEFAULT_TEMPERATURES,
    MAX_PROMPT_TOKENS,
    compression_ratio,
    window_quality_ok,
)


@partial(jax.jit, static_argnames=("window",))
def _gather_windows(buf, starts, window: int):
    """(nb,) start offsets into the flat audio buffer -> (nb, window) slices.

    Device-side windowing: the caller uploads each file's samples ONCE (with
    a window of zero padding after each file so no slice can cross into the
    next file) and every window batch is a vmapped dynamic_slice — instead of
    re-uploading the overlapped window tensor per batch, which ships ~1.5x
    the file per pass and dominates wall time on bandwidth-limited
    host<->device links (measured: 61 MB H2D ~ 1 s vs 0.84 s for the whole
    batch-32 decode on the tunneled chip)."""
    out = jax.vmap(
        lambda s: jax.lax.dynamic_slice(buf, (s,), (window,)))(starts)
    if out.dtype == jnp.int16:
        # int16 PCM buffers halve the H2D bytes again; normalize on device
        # with the ingest convention (audio/io.py: i16 / 32768)
        out = out.astype(jnp.float32) * (1.0 / 32768.0)
    return out


def _flat_audio_buffer(audios, window_samples):
    """Concatenate files with ``window_samples`` of zero padding after each;
    returns (device buffer, per-file base offsets, offset of a known-zero
    window for batch-padding rows). int16 inputs stay int16 — the gather
    normalizes on device (see :func:`_gather_windows`)."""
    parts, base, off = [], [], 0
    pad = np.zeros(window_samples, audios[0].dtype)
    for a in audios:
        base.append(off)
        parts.append(a)
        parts.append(pad)
        off += len(a) + window_samples
    flat = np.concatenate(parts)
    # bucket the buffer length (2^21 samples = 131 s granularity) so the
    # gather program compiles per bucket, not per request length
    bucket = 1 << 21
    n = ((len(flat) + bucket - 1) // bucket) * bucket
    if n > len(flat):
        flat = np.concatenate([flat, np.zeros(n - len(flat), flat.dtype)])
    buf = jnp.asarray(flat)
    zero_off = base[-1] + len(audios[-1])  # the last file's zero pad
    return buf, base, zero_off


def chunk_layout(
    n_samples: int, window_samples: int = N_SAMPLES, stride_samples: int | None = None
) -> list[tuple[int, int, int]]:
    """Overlapping window layout: ``[(start, core_start, core_end), ...]``.

    Windows advance by ``window - 2*stride`` so consecutive windows overlap
    by ``2*stride``; each window owns the core ``[start+stride, start+window-stride)``
    except the first (owns from 0) and the last (owns to the end). Cores
    tile ``[0, n)`` exactly: every instant belongs to one window, and every
    core boundary is at least ``stride`` away from its window's edge — the
    region where boundary truncation artifacts live."""
    if stride_samples is None:
        stride_samples = window_samples // 6
    step = window_samples - 2 * stride_samples
    if step <= 0:
        raise ValueError("stride too large: window must exceed 2*stride")
    n = max(0, int(n_samples))
    if n <= window_samples:
        return [(0, 0, max(n, 1))]
    starts = list(range(0, n - window_samples, step))
    starts.append(n - window_samples)  # final window is right-aligned
    out = []
    for k, s in enumerate(starts):
        first, last = k == 0, k == len(starts) - 1
        core_start = 0 if first else s + stride_samples
        core_end = n if last else s + window_samples - stride_samples
        # right-aligning the last window can pull its core start before the
        # previous core's end; the earlier window wins the disputed region
        if not first:
            prev_end = out[-1][2]
            core_start = max(core_start, prev_end)
        out.append((s, core_start, core_end))
    return out


def split_token_segments(row, tokenizer):
    """Token-level twin of ``tokenizer.split_timestamp_segments``: returns
    ``[(start_s, end_s | None, tokens), ...]`` where ``tokens`` includes the
    bounding timestamp tokens, so merged outputs stay timestamped."""
    segments = []
    start_t = None
    start_tok = None
    buf = []
    for raw in row:
        raw = int(raw)
        t = tokenizer.timestamp_value(raw)
        if t is None:
            if not tokenizer.is_special(raw) and raw >= 0:
                buf.append(raw)
            continue
        if start_t is None:
            start_t, start_tok = t, raw
        elif buf:
            segments.append((start_t, t, [start_tok] + buf + [raw]))
            buf, start_t, start_tok = [], None, None
        else:
            start_t, start_tok = t, raw  # consecutive timestamps: reset
    if buf:
        seg = ([start_tok] if start_tok is not None else []) + buf
        segments.append((start_t or 0.0, None, seg))
    return segments


def merge_longest_common_sequence(seqs: list[list[int]]) -> list[int]:
    """Merge consecutive token sequences by the best sliding overlap.

    For each adjacent pair, every split ``(left tail, right head)`` of equal
    length is scored by match ratio with a mild length bonus (so long
    confident overlaps beat short accidental ones); the winning split keeps
    the left sequence up to its cut and continues with the right sequence
    from its cut. This is the HF chunked-ASR merge idea re-derived: exact
    equality is not required, so small disagreements in the overlap region
    resolve to one window's reading instead of duplicating."""
    if not seqs:
        return []
    merged = list(seqs[0])
    for nxt in seqs[1:]:
        nxt = list(nxt)
        if not merged:
            merged = nxt
            continue
        if not nxt:
            continue
        best = (0.0, len(merged), 0)  # (score, left_cut, right_cut)
        max_olap = min(len(merged), len(nxt))
        for k in range(1, max_olap + 1):
            left = merged[-k:]
            right = nxt[:k]
            matches = sum(1 for a, b in zip(left, right) if a == b)
            # eps-scaled length bonus: prefer longer overlaps at equal ratio
            score = matches / k + k / 10000.0
            if matches > 1 and score > best[0]:
                m = (k + 1) // 2  # one split index for both sides: the
                # result keeps exactly k overlap tokens, never k+1
                best = (score, len(merged) - k + m, m)
        _, lcut, rcut = best
        merged = merged[:lcut] + nxt[rcut:]
    return merged


def transcribe_chunked(
    params,
    cfg: WhisperConfig,
    tokenizer,
    audios: list[np.ndarray],
    *,
    mel_fn=None,
    max_new: int = 224,
    window_samples: int = N_SAMPLES,
    stride_samples: int | None = None,        # default window/6 (5 s at 30 s)
    max_batch: int = 64,
    use_timestamps: bool = True,
    contexts: list[list[int]] | None = None,  # per-file static context
    bias_spans: np.ndarray | None = None,     # (B, N, K) per file
    bias_boost: float = 0.0,
    temperatures: tuple[float, ...] = DEFAULT_TEMPERATURES,
    best_of: int = 1,                         # >1: sampled rungs draw n
                                              # candidates, best avg-logprob
                                              # per row wins (OpenAI best_of)
    compression_ratio_threshold: float | None = 2.4,
    logprob_threshold: float | None = -1.0,
    no_speech_threshold: float | None = 0.6,
    start_tokens: list[list[int]] | None = None,  # per-file decode starts
    decode_fn: Callable | None = None,
    rng_key=None,
    prefix_pad_to_multiple: int | None = None,
    return_segments: bool = False,
    return_window_info: bool = False,         # per-window QC dicts (file-
                                              # grouped) appended as the
                                              # LAST return element
    draft: tuple | None = None,               # (params, cfg, k) speculative
    pad_batches: bool = False,                # pad every call to max_batch so
                                              # ONE compiled program serves
                                              # all chunk counts (serving)
    medusa: dict | None = None,               # Medusa head tree: self-
                                              # speculative t=0 rung (wins
                                              # over `draft`)
    num_beams: int = 1,                       # >1: beam drives the t=0 rung
                                              # (wins over `draft`/`medusa`)
    length_penalty: float = 1.0,
    beam_early_stopping: str = "off",
    mesh=None,                                # window batches shard over the
                                              # mesh's "data" axis (params
                                              # pre-sharded by the caller) —
                                              # SURVEY §5: windows decoded in
                                              # parallel ACROSS the mesh
    vad: bool | dict = False,                 # host-side energy VAD
                                              # (audio/vad.py): windows with
                                              # no detected speech never
                                              # enter the work list; dict =
                                              # speech_segments() overrides
    word_timestamps: bool = False,            # per-word times via batched
                                              # cross-attention DTW, one
                                              # alignment call per decode
                                              # batch; words owned by the
                                              # same core tiling as segments
    alignment_heads: list[tuple[int, int]] | None = None,
    device_windows: bool | None = None,       # upload each file ONCE and
                                              # gather window batches on
                                              # device (default off-mesh);
                                              # mel_fn then receives a jax
                                              # array, not numpy
    phase_times: dict | None = None,          # filled with wall-clock phase
                                              # attribution: upload_s (flat-
                                              # buffer H2D, blocked), decode_s
                                              # (window gather+mel+decode+QC
                                              # ladder), merge_s, n_windows
                                              # (bench.py long-form metric)
):
    """Returns per-file token lists; with ``return_segments`` a
    ``(tokens, segments)`` pair, and with ``word_timestamps`` too a
    ``(tokens, segments, words)`` triple — segment/word times are absolute
    file time.

    All windows of all files are flattened into one work list and decoded
    in batches of ``max_batch`` — per-file bias spans / contexts / start
    tokens are gathered per window, so heterogeneous files batch together.
    Output token streams keep window-relative timestamp tokens (exactly as
    the sequential loop does); ``segments`` carry absolute times."""
    if device_windows is None:
        device_windows = mesh is None
    if mel_fn is None:
        if device_windows:
            # log_mel_spectrogram is already jitted (static n_mels); the
            # partial just pins the mel count
            from ..audio.mel import log_mel_spectrogram

            mel_fn = partial(log_mel_spectrogram, n_mels=cfg.n_mels)
        else:
            mel_fn = lambda a: np.stack(  # noqa: E731
                [log_mel_spectrogram_np(x, cfg.n_mels) for x in a])
    # words are only reachable through the (tokens, segments, words) return:
    # without return_segments the DTW alignment would be pure wasted compute
    word_timestamps = word_timestamps and return_segments
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    if not temperatures:
        temperatures = (0.0,)

    # int16 PCM passes through raw ONLY when the device-window path will
    # normalize it on device (half the H2D bytes of float32 — the upload is
    # the dominant cost of long files on the tunneled link, docs/PERF.md);
    # every host-side consumer must see [-1, 1] float32, so any other case
    # normalizes here with the ingest convention (audio/io.py: i16 / 32768)
    from ..audio.io import pcm_to_float32

    audios = [np.asarray(a) for a in audios]
    if not (device_windows and audios
            and all(a.dtype == np.int16 for a in audios)):
        audios = [pcm_to_float32(a) for a in audios]
    nfiles = len(audios)

    # ---- work list: (file, window start, core range) -----------------------
    # VAD gate: a window with no detected speech never enters the work list
    # (its core is silent too — core ⊆ window — so no segment is lost)
    vad_segs = None
    if vad is not None and vad is not False:  # NB: vad={} means defaults
        from ..audio.vad import has_speech, resolve_vad

        vad_segs = [resolve_vad(vad, a) for a in audios]
        if all(s is None for s in vad_segs):  # e.g. vad=[] — no gating
            vad_segs = None
    # ignore overlap that is only the detector's word-edge pad (clamped so a
    # pathological pad_ms override can never blind the gate to real speech)
    from ..audio.vad import vad_overlap_tol as _vot
    vad_tol = min(_vot(vad), window_samples // 4)
    work: list[tuple[int, int, int, int]] = []
    for fi, a in enumerate(audios):
        for s, c0, c1 in chunk_layout(len(a), window_samples, stride_samples):
            if vad_segs is not None and not has_speech(
                    vad_segs[fi], s, s + window_samples, tol=vad_tol):
                continue
            work.append((fi, s, c0, c1))

    # ---- per-window decode inputs -----------------------------------------
    def prefix_for(fi: int) -> list[int]:
        # keep the TAIL on overflow — the prompt-window-adjacent tokens,
        # matching the sequential loop's history convention ([-room:])
        ctx = (list(contexts[fi])[-MAX_PROMPT_TOKENS:]
               if contexts and contexts[fi] else [])
        start = list(start_tokens[fi]) if start_tokens else [tokenizer.sot]
        return ([tokenizer.sop] + ctx + start) if ctx else start

    results: list[list[int] | None] = [None] * len(work)
    window_words: list[list] = [[] for _ in range(len(work))]
    win_info: list[dict | None] = [None] * len(work)

    # device-side windowing: upload once, slice per batch on device — the
    # mesh path keeps host windows (shard_decode_inputs places host arrays)
    if device_windows and work:
        _t0 = time.perf_counter() if phase_times is not None else 0.0
        buf, base, zero_off = _flat_audio_buffer(audios, window_samples)
        if phase_times is not None:
            # block so the H2D transfer is attributed here, not to the
            # first decode batch that consumes the buffer
            jax.block_until_ready(buf)
            phase_times["upload_s"] = time.perf_counter() - _t0
    if phase_times is not None:
        phase_times.setdefault("upload_s", 0.0)
        phase_times["n_windows"] = len(work)
        _t_dec = time.perf_counter()

    for lo in range(0, len(work), max_batch):
        batch = work[lo : lo + max_batch]
        nb_real = len(batch)
        nb = max_batch if pad_batches else nb_real
        if device_windows:
            starts = np.asarray(
                [base[fi] + s for fi, s, _, _ in batch]
                + [zero_off] * (nb - nb_real), np.int32)
            chunk = _gather_windows(buf, jnp.asarray(starts), window_samples)
        else:
            chunk = np.zeros((nb, window_samples), np.float32)
            for j, (fi, s, _, _) in enumerate(batch):
                part = audios[fi][s : s + window_samples]
                chunk[j, : len(part)] = part
        mel = mel_fn(chunk)

        prefixes = [prefix_for(fi) for fi, _, _, _ in batch]
        prefixes += [[tokenizer.sot]] * (nb - nb_real)
        ids, mask = pack_prefixes(prefixes, tokenizer.eot,
                                  pad_to_multiple=prefix_pad_to_multiple)
        spans = None
        if bias_spans is not None:
            arr = np.asarray(bias_spans)
            rows = arr[[fi for fi, *_ in batch]]
            if nb > nb_real:  # pad rows carry no spans (all span-pad)
                pad = np.full((nb - nb_real,) + arr.shape[1:], tokenizer.eot,
                              arr.dtype)
                rows = np.concatenate([rows, pad])
            spans = jnp.asarray(rows)
        sot_off = (np.asarray([len(start_tokens[fi]) for fi, *_ in batch]
                              + [1] * (nb - nb_real), np.int32)
                   if start_tokens else 1)
        ns_id = tokenizer.no_speech if no_speech_threshold is not None else None
        # OpenAI timestamp rules for timestamp-mode decode: applied per beam
        # and on plain-greedy ladder rungs alike; kept off when medusa/draft
        # drive t=0 so their greedy-equivalence contract is ladder-consistent
        # (greedy.py apply_timestamp_rules)
        ts_begin = (tokenizer.timestamp_begin
                    if (use_timestamps and medusa is None and draft is None)
                    else None)

        if mesh is not None:
            from ..parallel import shard_decode_inputs

            soff = None if isinstance(sot_off, int) else sot_off
            (mel, ids, mask, spans, soff), _ = shard_decode_inputs(
                mesh, np.asarray(mel), np.asarray(ids), np.asarray(mask),
                None if spans is None else np.asarray(spans), soff)
            if soff is not None:
                sot_off = soff

        def run(temperature, key):
            if decode_fn is not None:
                return decode_fn(mel, ids, mask, temperature, key)
            if num_beams > 1 and temperature == 0.0:
                from .beam import beam_decode
                from .long_form import _best_beam_as_greedy

                res = beam_decode(
                    params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                    jnp.asarray(mask), num_beams=num_beams, max_new=max_new,
                    eot_id=tokenizer.eot, bias_spans=spans,
                    bias_boost=bias_boost, span_pad_id=tokenizer.eot,
                    length_penalty=length_penalty,
                    early_stopping=beam_early_stopping,
                    no_speech_id=ns_id, sot_offset=sot_off,
                    timestamp_begin=ts_begin)
                return _best_beam_as_greedy(res, length_penalty,
                                            beam_early_stopping)
            if temperature == 0.0 and (medusa is not None
                                        or draft is not None):
                from .speculative import t0_verified_decode

                if medusa is None and draft[1].n_mels != cfg.n_mels:
                    raise ValueError("chunked speculative decoding needs a "
                                     "draft with the target's n_mels")
                return t0_verified_decode(
                    params, cfg, tokenizer, mel, ids, mask, max_new=max_new,
                    spans=spans, bias_boost=bias_boost, no_speech_id=ns_id,
                    sot_offset=sot_off, medusa=medusa, draft=draft)
            return greedy_decode(
                params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                jnp.asarray(mask), max_new=max_new, eot_id=tokenizer.eot,
                bias_spans=spans, bias_boost=bias_boost,
                span_pad_id=tokenizer.eot, temperature=temperature,
                rng_key=key, no_speech_id=ns_id, sot_offset=sot_off,
                timestamp_begin=ts_begin)

        # temperature ladder over the whole batch; only failing REAL rows
        # pend (padding rows decode garbage and must not drive retries)
        accepted: list[list[int] | None] = [None] * nb_real
        last: list[list[int]] = [[] for _ in range(nb_real)]
        last_avg_lp: list[float | None] = [None] * nb_real
        last_temp: list[float] = [0.0] * nb_real
        nsp = None
        for ti, temperature in enumerate(temperatures):
            rng_key, sub = jax.random.split(rng_key)
            if temperature > 0 and best_of > 1:
                from .long_form import sample_best_of

                res = sample_best_of(run, temperature, sub, best_of)
            else:
                res = run(temperature, sub)
            toks = np.asarray(res.tokens)
            lens = np.asarray(res.lengths)
            slp = (np.asarray(res.sum_logprob)
                   if res.sum_logprob is not None else None)
            if (ti == 0 and no_speech_threshold is not None
                    and res.no_speech_prob is not None):
                nsp = np.asarray(res.no_speech_prob)
            pending = False
            for j in range(nb_real):
                if accepted[j] is not None:
                    continue
                row = toks[j, : lens[j]].tolist()
                last[j] = row
                last_temp[j] = float(temperature)
                avg_lp = (None if slp is None
                          else float(slp[j]) / (int(lens[j]) + 1))
                last_avg_lp[j] = avg_lp
                text = tokenizer.decode(row, skip_special_tokens=True)
                if window_quality_ok(
                    text, avg_lp,
                    compression_ratio_threshold=compression_ratio_threshold or 0.0,
                    logprob_threshold=logprob_threshold,
                ):
                    accepted[j] = row
                else:
                    pending = True
            if not pending:
                break

        for j in range(nb_real):
            row = accepted[j] if accepted[j] is not None else last[j]
            if nsp is not None and nsp[j] > no_speech_threshold:
                if not (logprob_threshold is not None
                        and last_avg_lp[j] is not None
                        and last_avg_lp[j] > logprob_threshold):
                    row = []  # silent window
            results[lo + j] = row
            if return_window_info:
                win_info[lo + j] = {
                    "start_s": round(batch[j][1] / SAMPLE_RATE, 3),
                    "temperature": last_temp[j],
                    "avg_logprob": last_avg_lp[j],
                    "no_speech_prob": (float(nsp[j]) if nsp is not None
                                       else None),
                    # CR the ladder gated on: final rung's full row, before
                    # the silence rule empties ``row`` (same rule as the
                    # sequential/streaming surfaces)
                    "compression_ratio": round(compression_ratio(
                        tokenizer.decode(
                            accepted[j] if accepted[j] is not None else last[j],
                            skip_special_tokens=True)), 3),
                    "accepted": accepted[j] is not None,
                }

        if word_timestamps:
            # one batched DTW alignment per decode batch, full decoded rows
            # (ownership filters words at merge time, exactly like segments)
            from .word_timestamps import find_word_timestamps

            act = [j for j in range(nb_real) if results[lo + j]]
            if act:
                frames = []
                for j in act:
                    fi, s, _, _ = batch[j]
                    frames.append(max(2, min(window_samples,
                                             max(len(audios[fi]) - s, 0))
                                      // 320))
                starts_act = ([list(start_tokens[batch[j][0]]) for j in act]
                              if start_tokens else None)
                timings = find_word_timestamps(
                    params, cfg, tokenizer, np.asarray(mel)[act],
                    [results[lo + j] for j in act],
                    starts=starts_act, num_frames=frames,
                    alignment_heads=alignment_heads, pad_to=max_new + 8)
                for j, ws in zip(act, timings):
                    window_words[lo + j] = ws

    # ---- merge per file ----------------------------------------------------
    if phase_times is not None:
        phase_times["decode_s"] = time.perf_counter() - _t_dec
        _t_merge = time.perf_counter()
    outputs: list[list[int]] = [[] for _ in range(nfiles)]
    segments: list[list[tuple[float, float | None, str]]] = [
        [] for _ in range(nfiles)]
    words: list[list] = [[] for _ in range(nfiles)]
    by_file: list[list[tuple[int, int, int, list[int], list]]] = [
        [] for _ in range(nfiles)]
    for (fi, s, c0, c1), row, ws in zip(work, results, window_words):
        by_file[fi].append((s, c0, c1, row or [], ws))

    for fi in range(nfiles):
        wins = sorted(by_file[fi], key=lambda w: w[0])
        if use_timestamps:
            for s, c0, c1, row, _ in wins:
                offset = s / SAMPLE_RATE
                core0, core1 = c0 / SAMPLE_RATE, c1 / SAMPLE_RATE
                for t0, t1, toks in split_token_segments(row, tokenizer):
                    abs0 = offset + (t0 or 0.0)
                    # ownership: the segment's start instant — each instant
                    # belongs to exactly one window's core (the first core
                    # starts at 0, so no instant can precede every core)
                    if core0 <= abs0 < core1:
                        outputs[fi].extend(toks)
                        if return_segments:
                            text = tokenizer.decode(
                                toks, skip_special_tokens=True)
                            if text.strip():
                                segments[fi].append(
                                    (abs0,
                                     None if t1 is None else offset + t1,
                                     text))
        else:
            merged = merge_longest_common_sequence(
                [row for _, _, _, row, _ in wins])
            outputs[fi] = merged
            if return_segments:
                text = tokenizer.decode(merged, skip_special_tokens=True)
                if text.strip():
                    segments[fi].append(
                        (0.0, len(audios[fi]) / SAMPLE_RATE, text))
        if word_timestamps:
            # word ownership mirrors segment ownership: the word's start
            # instant picks the unique window whose core contains it
            for s, c0, c1, _, ws in wins:
                offset = s / SAMPLE_RATE
                core0, core1 = c0 / SAMPLE_RATE, c1 / SAMPLE_RATE
                for w in ws:
                    abs_start = w.start + offset
                    if core0 <= abs_start < core1:
                        w.start = round(abs_start, 3)
                        w.end = round(w.end + offset, 3)
                        words[fi].append(w)

    if phase_times is not None:
        phase_times["merge_s"] = time.perf_counter() - _t_merge
    out: tuple = (outputs,)
    if return_segments:
        out += (segments,)
        if word_timestamps:
            out += (words,)
    if return_window_info:
        # work is built file-major with ascending window starts, so each
        # file's info lands already ordered by start_s
        info_by_file: list[list[dict]] = [[] for _ in range(nfiles)]
        for (fi, *_), info in zip(work, win_info):
            if info is not None:
                info_by_file[fi].append(info)
        out += (info_by_file,)
    return out if len(out) > 1 else outputs
