"""Language identification (multilingual models).

Whisper detects the spoken language from the decoder's first-step
distribution after ``<|startoftranscript|>``, restricted to the 99 language
tokens (the capability HF exposes as
``WhisperGenerationMixin.detect_language``; the reference pins English
models, scripts/train.py:96, so never needs it — this is serving surface for
the multilingual family the framework also supports).

One jitted program per (model, batch) shape: encoder + a single decoder step;
the language softmax is computed over the masked logits in-graph so only a
(B, n_lang) probability matrix comes back to the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import WhisperConfig
from ..models.whisper import decode_tokens, encode_audio


@functools.partial(jax.jit, static_argnames=("cfg", "sot_id", "lang_ids"))
def _language_probs_from_enc(
    params, cfg: WhisperConfig, enc: jax.Array, sot_id: int,
    lang_ids: tuple[int, ...],
) -> jax.Array:
    """(B, T, D) encoder states -> (B, n_lang) language probabilities."""
    b = enc.shape[0]
    tokens = jnp.full((b, 1), sot_id, jnp.int32)
    logits, _ = decode_tokens(params, cfg, tokens, enc_out=enc)
    lg = logits[:, 0].astype(jnp.float32)  # (B, V)
    ids = jnp.asarray(lang_ids, jnp.int32)
    lang_lg = lg[:, ids]  # (B, n_lang)
    return jax.nn.softmax(lang_lg, axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "sot_id", "lang_ids"))
def _language_probs(
    params, cfg: WhisperConfig, mel: jax.Array, sot_id: int,
    lang_ids: tuple[int, ...],
) -> jax.Array:
    """(B, n_mels, T) -> (B, n_lang) language probabilities."""
    enc = encode_audio(params, cfg, mel)
    return _language_probs_from_enc(params, cfg, enc, sot_id, lang_ids)


def resolve_start_tokens(
    tokenizer,
    n: int,
    language: str | None = None,
    task: str = "transcribe",
    detect=None,
) -> tuple[list[list[int]] | None, list[str | None]]:
    """The ONE place start sequences for language/task forcing are built
    (transcribe CLI, HTTP server, Pipeline, and streaming all route here).

    Returns ``(starts, langs)`` for ``n`` rows: ``None`` starts means the
    default bare ``[<|sot|>]`` prefix. ``language`` is a code, ``"auto"``,
    or None; ``task="translate"`` without a language implies detection.
    ``detect`` is a zero-arg callable returning per-row ``(lang, prob)``
    pairs, required only when detection is implied. Raises ``ValueError``
    for unknown codes, non-multilingual misuse, or a missing detector."""
    if not tokenizer.multilingual:
        if language or task == "translate":
            raise ValueError(
                "language/task forcing needs a multilingual model/tokenizer")
        return None, [None] * n
    if not language and task == "transcribe":
        return None, [None] * n
    task_id = tokenizer.translate if task == "translate" else tokenizer.transcribe
    if language and language != "auto":
        from ..tokenizer.whisper_tokenizer import LANGUAGES

        # validate against the language list, not the special-token map —
        # every special ("transcribe", "0.00", ...) has a <|...|> token
        if language not in LANGUAGES[: tokenizer.num_languages]:
            raise ValueError(f"unknown language code: {language}")
        lid = tokenizer.convert_tokens_to_ids(f"<|{language}|>")
        return [[tokenizer.sot, lid, task_id]] * n, [language] * n
    if detect is None:
        raise ValueError(
            "language detection needed (language='auto', or translate "
            "without a language) but no detector was provided")
    starts, langs = [], []
    for lang, _ in detect():
        starts.append(
            [tokenizer.sot, tokenizer.convert_tokens_to_ids(f"<|{lang}|>"),
             task_id])
        langs.append(lang)
    return starts, langs


def detect_language(
    params, cfg: WhisperConfig, tokenizer, mel=None, *, enc_out=None,
) -> list[tuple[str, float]]:
    """Per-clip ``(language_code, probability)`` for a batch of log-mels
    (or precomputed encoder states via ``enc_out`` — avoids re-encoding when
    the caller already has them, e.g. alongside word alignment).

    Requires a multilingual tokenizer (language tokens exist only in the
    multilingual special-token layout)."""
    if not tokenizer.multilingual:
        raise ValueError("language detection needs a multilingual model/tokenizer")
    from ..tokenizer.whisper_tokenizer import LANGUAGES

    langs = LANGUAGES[: tokenizer.num_languages]
    lang_ids = tuple(tokenizer.convert_tokens_to_ids(f"<|{l}|>") for l in langs)
    if enc_out is not None:
        probs = np.asarray(_language_probs_from_enc(
            params, cfg, enc_out, tokenizer.sot, lang_ids))
    else:
        probs = np.asarray(_language_probs(
            params, cfg, jnp.asarray(mel), tokenizer.sot, lang_ids))
    best = probs.argmax(axis=-1)
    return [(langs[i], float(probs[r, i])) for r, i in enumerate(best)]
