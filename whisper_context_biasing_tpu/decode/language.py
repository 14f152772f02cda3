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
def _language_probs(
    params, cfg: WhisperConfig, mel: jax.Array, sot_id: int,
    lang_ids: tuple[int, ...],
) -> jax.Array:
    """(B, n_mels, T) -> (B, n_lang) language probabilities."""
    enc = encode_audio(params, cfg, mel)
    b = mel.shape[0]
    tokens = jnp.full((b, 1), sot_id, jnp.int32)
    logits, _ = decode_tokens(params, cfg, tokens, enc_out=enc)
    lg = logits[:, 0].astype(jnp.float32)  # (B, V)
    ids = jnp.asarray(lang_ids, jnp.int32)
    lang_lg = lg[:, ids]  # (B, n_lang)
    return jax.nn.softmax(lang_lg, axis=-1)


def detect_language(
    params, cfg: WhisperConfig, tokenizer, mel,
) -> list[tuple[str, float]]:
    """Per-clip ``(language_code, probability)`` for a batch of log-mels.

    Requires a multilingual tokenizer (language tokens exist only in the
    multilingual special-token layout)."""
    if not tokenizer.multilingual:
        raise ValueError("language detection needs a multilingual model/tokenizer")
    from ..tokenizer.whisper_tokenizer import LANGUAGES

    langs = LANGUAGES[: tokenizer.num_languages]
    lang_ids = tuple(tokenizer.convert_tokens_to_ids(f"<|{l}|>") for l in langs)
    probs = np.asarray(_language_probs(
        params, cfg, jnp.asarray(mel), tokenizer.sot, lang_ids
    ))
    best = probs.argmax(axis=-1)
    return [(langs[i], float(probs[r, i])) for r, i in enumerate(best)]
