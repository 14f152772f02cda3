"""Word-level timestamps: DTW over cross-attention alignment matrices.

Pipeline (per batch of clips):
  1. teacher-forced decoder pass producing a (B, S, frames) alignment matrix
     in one XLA program (models/alignment.py) — the (L, B, H, S, frames)
     attention stack never leaves the device;
  2. host-side monotonic DTW through each clip's matrix mapping every token
     to its start frame (vectorized row recurrence: the inner min-plus scan
     is a prefix-sum + running-min, so the O(S*F) table fills in S numpy ops);
  3. tokens grouped into words at space/punctuation boundaries (byte-level
     BPE pieces are merged until they decode to whole unicode characters).

The reference has no timestamp support of any kind (text-only
``max_length=225`` generation, /root/reference/scripts/train.py:204-210);
this mirrors the openai-whisper / HF ``word_timestamps=True`` serving
capability. Frame rate: one encoder state per 0.02 s (two 10 ms mel hops).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

SECONDS_PER_FRAME = 0.02
SAMPLES_PER_FRAME = 320  # 16 kHz * 0.02 s


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode(params, cfg, mel):
    # compiled encoder for callers without precomputed states (long-form /
    # streaming alignment): eager op-by-op dispatch is far slower
    from ..models.whisper import encode_audio

    return encode_audio(params, cfg, mel)


@dataclass
class WordTiming:
    word: str
    start: float  # seconds
    end: float    # seconds
    tokens: list
    probability: float | None = None  # mean P(token | context, audio) over
                                      # the word's tokens (teacher-forced,
                                      # models/alignment.py with_probs)


def dtw_path(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW through ``cost`` (N tokens, M frames) from (0,0) to
    (N-1, M-1); steps are down / right / diagonal. Returns the path as
    (text_indices, time_indices).

    The table fills row-by-row: within a row,
    ``c[j] = v[j] + min(a[j], c[j-1])`` (with ``a`` the min of the two
    upper predecessors) unrolls to ``c[j] = S[j] + min_{k<=j}(a[k] -
    S[k-1])`` over prefix sums S — a cumulative minimum, so each row is a
    handful of vectorized ops instead of an M-length Python loop."""
    n, m = cost.shape
    table = np.full((n + 1, m + 1), np.inf, np.float64)
    table[0, 0] = 0.0
    v_all = cost.astype(np.float64)
    for i in range(1, n + 1):
        v = v_all[i - 1]
        a = np.minimum(table[i - 1, 1:], table[i - 1, :-1])  # up, diag
        s = np.cumsum(v)
        shifted = np.concatenate(([0.0], s[:-1]))
        best = np.minimum.accumulate(a - shifted)
        table[i, 1:] = s + best
    # traceback: ALWAYS step to a minimum-cost predecessor (diagonal
    # preferred on ties, then up). The openai-style if/elif/else falls
    # through to 'left' whenever nothing is strictly smallest, which picks
    # a provably worse predecessor on exact ties — systematic in plateau
    # regions (silence/padding frames with identical columns)
    i, j = n, m
    text_idx, time_idx = [], []
    while i > 1 or j > 1:
        text_idx.append(i - 1)
        time_idx.append(j - 1)
        moves = ((table[i - 1, j - 1], 0), (table[i - 1, j], 1),
                 (table[i, j - 1], 2))
        _, pick = min(moves, key=lambda t: (t[0], t[1]))
        if pick == 0:
            i, j = i - 1, j - 1
        elif pick == 1:
            i -= 1
        else:
            j -= 1
    text_idx.append(0)
    time_idx.append(0)
    return np.asarray(text_idx[::-1]), np.asarray(time_idx[::-1])


# the standard whisper punctuation conventions: opening marks attach to the
# following word, closing marks to the previous
PREPEND_PUNCTUATIONS = "\"'“¿([{-"
APPEND_PUNCTUATIONS = "\"'.。,，!！?？:：”)]}、"


def merge_punctuations(
    words: list[str], word_tokens: list[list[int]],
    prepended: str = PREPEND_PUNCTUATIONS,
    appended: str = APPEND_PUNCTUATIONS,
) -> tuple[list[str], list[list[int]]]:
    """Two-pass punctuation merge (openai-whisper timing semantics): a
    standalone opening mark joins the word after it, a standalone closing
    mark joins the word before it."""
    words = list(words)
    word_tokens = [list(t) for t in word_tokens]
    # prepended: walk backwards so chains ("¿(" + word) collapse fully
    i, j = len(words) - 2, len(words) - 1
    while i >= 0:
        if words[i].startswith(" ") and words[i].strip() in prepended:
            words[j] = words[i] + words[j]
            word_tokens[j] = word_tokens[i] + word_tokens[j]
            words[i], word_tokens[i] = "", []
        else:
            j = i
        i -= 1
    # appended: walk forwards
    i, j = 0, 1
    while j < len(words):
        if not words[i].endswith(" ") and words[j] in appended:
            words[i] = words[i] + words[j]
            word_tokens[i] = word_tokens[i] + word_tokens[j]
            words[j], word_tokens[j] = "", []
        else:
            i = j
        j += 1
    keep = [k for k, w in enumerate(words) if w]
    return [words[k] for k in keep], [word_tokens[k] for k in keep]


def split_words(tokenizer, tokens: list[int]) -> tuple[list[str], list[list[int]]]:
    """Group text tokens into space/punctuation-delimited words.

    Byte-level BPE pieces are first merged until they decode without a
    trailing replacement character (whole unicode chars), then merged into
    words at space boundaries; punctuation attaches per
    :func:`merge_punctuations` (opening marks forward, closing marks back)."""
    sub_texts, sub_tokens = [], []
    current: list[int] = []
    for tok in tokens:
        current.append(tok)
        decoded = tokenizer.decode(current, skip_special_tokens=True)
        if decoded and not decoded.endswith("�"):
            sub_texts.append(decoded)
            sub_tokens.append(current)
            current = []
    if current:
        sub_texts.append(tokenizer.decode(current, skip_special_tokens=True))
        sub_tokens.append(current)

    words: list[str] = []
    word_tokens: list[list[int]] = []
    for text, toks in zip(sub_texts, sub_tokens):
        if text.startswith(" ") or not words:
            words.append(text)
            word_tokens.append(list(toks))
        else:
            words[-1] += text
            word_tokens[-1].extend(toks)
    return merge_punctuations(words, word_tokens)


def find_word_timestamps(
    params,
    cfg,
    tokenizer,
    mel,                      # (B, n_mels, T_mel)
    hyps: list[list[int]],    # decoded token lists (prefix-stripped)
    *,
    starts: list[list[int]] | None = None,  # per-clip decode start sequences
    num_frames: list[int] | int | None = None,  # per-clip content frames
    alignment_heads: list[tuple[int, int]] | None = None,
    medfilt_width: int = 7,
    pad_to: int | None = None,
    enc_out=None,  # precomputed (B, T, D) encoder states: skip re-encoding
) -> list[list[WordTiming]]:
    """Per-clip word timings for already-decoded hypotheses.

    ``num_frames``: frames actually covered by audio (``n_samples // 320``);
    defaults to the full window. Timestamps are clamped to it so words never
    extend into padding silence.

    ``pad_to``: pad the token axis to this length so serving batches with
    varying hypothesis lengths reuse one compiled alignment program (the
    frame axis is always the full encoder context in that case)."""
    from ..models.alignment import alignment_matrix, resolve_alignment_mask

    b = mel.shape[0]
    if starts is None:
        starts = [[tokenizer.sot]] * b
    # resolution order: explicit heads > the published stock-model set for
    # this config's geometry (models/alignment.py ALIGNMENT_HEADS) > the
    # top-half heuristic for custom checkpoints
    head_mask = resolve_alignment_mask(cfg, alignment_heads)

    # strip any special tokens that leaked into hypotheses (timestamps etc.)
    text_hyps = [[t for t in h if not tokenizer.is_special(t)] for h in hyps]
    seqs = [list(st) + h + [tokenizer.eot] for st, h in zip(starts, text_hyps)]
    max_s = max(len(s) for s in seqs)
    if pad_to is not None:
        max_s = max(max_s, int(pad_to))
    toks = np.full((b, max_s), tokenizer.eot, np.int32)
    tok_mask = np.zeros((b, max_s), np.float32)
    for i, s in enumerate(seqs):
        toks[i, : len(s)] = s
        tok_mask[i, : len(s)] = 1.0

    enc = enc_out if enc_out is not None else _encode(params, cfg, jnp.asarray(mel))
    total_frames = enc.shape[1]
    if num_frames is None:
        frames = [total_frames] * b
    elif isinstance(num_frames, int):
        frames = [num_frames] * b
    else:
        frames = list(num_frames)
    frames = [max(2, min(int(f), total_frames)) for f in frames]

    static_frames = total_frames if pad_to is not None else max(frames)
    matrix, tok_probs = alignment_matrix(
        params, cfg, jnp.asarray(toks), enc, head_mask,
        jnp.asarray(tok_mask), num_frames=static_frames,
        medfilt_width=medfilt_width, with_probs=True,
    )
    matrix = np.asarray(matrix)  # (B, S, F)
    tok_probs = np.asarray(tok_probs)  # (B, S)

    out: list[list[WordTiming]] = []
    for i in range(b):
        n_prefix = len(starts[i])
        text = text_hyps[i]
        if not text:
            out.append([])
            continue
        # rows for the text tokens + eot; DTW wants the eot row so the last
        # word's end lands where attention leaves the content
        rows = matrix[i, n_prefix : n_prefix + len(text) + 1, : frames[i]]
        text_idx, time_idx = dtw_path(-rows)
        jumps = np.concatenate(([True], np.diff(text_idx) > 0))
        jump_times = time_idx[jumps] * SECONDS_PER_FRAME  # start frame per row
        words, word_tokens = split_words(tokenizer, text)
        timings: list[WordTiming] = []
        pos = 0
        clip_end = frames[i] * SECONDS_PER_FRAME
        for word, wtoks in zip(words, word_tokens):
            start_t = float(jump_times[pos]) if pos < len(jump_times) else clip_end
            nxt = pos + len(wtoks)
            end_t = float(jump_times[nxt]) if nxt < len(jump_times) else clip_end
            prob = float(np.mean(tok_probs[i, n_prefix + pos : n_prefix + nxt]))
            timings.append(WordTiming(word=word, start=round(start_t, 3),
                                      end=round(max(end_t, start_t), 3),
                                      tokens=list(wtoks),
                                      probability=round(prob, 6)))
            pos = nxt
        out.append(timings)
    return out
