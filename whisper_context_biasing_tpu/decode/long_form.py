"""Long-form (>30 s) transcription by sequential 30 s windows.

The reference pads/trims every utterance to one 30 s window (its corpus is
short clips); real deployments need arbitrary-length audio. This module
implements Whisper-style sequential decoding: windows are transcribed in
order and each window's decode is conditioned on the previous window's
tokens through the same ``<|startofprev|>`` prompt mechanism the biasing
stack already uses — so bias lists and long-form context compose.

Batched across files: the i-th windows of many files decode together in one
XLA program; per-file histories ride the left-padded ragged-prefix support.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..audio.mel import N_SAMPLES, log_mel_spectrogram_np
from ..models.config import WhisperConfig
from .greedy import greedy_decode, pack_prefixes

MAX_PROMPT_TOKENS = 190  # the reference's desc-prompt truncation bound


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


def transcribe_long_batch(
    params,
    cfg: WhisperConfig,
    tokenizer,
    audios: list[np.ndarray],
    *,
    mel_fn=None,
    max_new: int = 224,
    condition_on_previous: bool = True,
    contexts: list[list[int]] | None = None,   # static per-file context (e.g. bias desc)
    bias_spans: np.ndarray | None = None,       # (B, N, K) per file
    bias_boost: float = 0.0,
) -> list[list[int]]:
    """Returns per-file token lists (concatenated over windows, specials
    stripped by the caller via decode)."""
    if mel_fn is None:
        mel_fn = lambda a: np.stack([log_mel_spectrogram_np(x, cfg.n_mels) for x in a])  # noqa: E731

    b = len(audios)
    windows = [split_windows(a) for a in audios]
    n_rounds = max(len(w) for w in windows)
    histories: list[list[int]] = [[] for _ in range(b)]
    outputs: list[list[int]] = [[] for _ in range(b)]

    for r in range(n_rounds):
        chunk = np.stack([
        w[r] if r < len(w) else np.zeros(N_SAMPLES, np.float32) for w in windows
        ])
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
            if ctx:
                prefixes.append([tokenizer.sop] + ctx + [tokenizer.sot])
            else:
                prefixes.append([tokenizer.sot])
        ids, mask = pack_prefixes(prefixes, tokenizer.eot)
        res = greedy_decode(
            params, cfg, jnp.asarray(mel), jnp.asarray(ids), jnp.asarray(mask),
            max_new=max_new, eot_id=tokenizer.eot,
            bias_spans=None if bias_spans is None else jnp.asarray(bias_spans),
            bias_boost=bias_boost, span_pad_id=tokenizer.eot,
        )
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
        for i in range(b):
            if r >= len(windows[i]):
                continue  # file already exhausted; decoded garbage discarded
            new = toks[i, : lens[i]].tolist()
            # drop special tokens from the rolling history (prompt hygiene)
            content = [t for t in new if not tokenizer.is_special(t)]
            histories[i] = (histories[i] + content)[-MAX_PROMPT_TOKENS:]
            outputs[i].extend(new)
    return outputs


def transcribe_long(
    params, cfg, tokenizer, audio: np.ndarray, **kwargs
) -> str:
    """Single-file convenience: audio of any length -> text."""
    toks = transcribe_long_batch(params, cfg, tokenizer, [audio], **kwargs)[0]
    return tokenizer.decode(toks, skip_special_tokens=True)
