#!/usr/bin/env python
"""Inspection harness for the weighted-CE loss (reference
scripts/check_WeightCE.py parity): fabricates labels/logits from a sample
sentence + bias words, prints the per-position token/weight/match table, and
cross-checks the vectorized JAX implementation against a literal host-side
replica of the harness algorithm."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

# the out-of-tree TPU plugin wins the backend election even under
# JAX_PLATFORMS=cpu (see tests/conftest.py); this host-side harness must
# pin CPU or its tiny checks dispatch through the tunnel and crawl
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp  # noqa: E402

from whisper_context_biasing_tpu.tokenizer import load_tokenizer
from whisper_context_biasing_tpu.train import bias_span_weights, weighted_ce_loss

PAD = 50256
WHISPER_SPECIAL_TOKENS = {50256, 50257, 50258, 50358, 50362}


def get_sample_data(tokenizer, max_len=76, vocab=51864, seed=0):
    """Sample fabrication mirroring reference scripts/check_WeightCE.py:72-106."""
    text = ("Rekool-L tab, which contains rabeprazole, helps alleviate "
            "symptoms of acid reflux and heartburn.")
    bias_words = ["Rekool-L", "rabeprazole", "acid reflux", "heartburn"]

    tokens = tokenizer.encode(text.lower())
    labels = [-100] * 10 + tokens
    labels = labels[:max_len] + [-100] * max(0, max_len - len(labels))

    spans = [tokenizer.encode(w.lower(), add_special_tokens=False) for w in bias_words]
    k = max(len(s) for s in spans)
    spans = [s + [PAD] * (k - len(s)) for s in spans]

    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((1, max_len, vocab)).astype(np.float32)
    return logits, np.asarray([labels], np.int32), np.asarray([spans], np.int32), bias_words


def main():
    tokenizer = load_tokenizer()
    logits, labels, spans, bias_words = get_sample_data(tokenizer)

    weights = np.asarray(bias_span_weights(jnp.asarray(labels), jnp.asarray(spans), 1.5))
    loss = float(weighted_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  jnp.asarray(spans), 1.5))
    print(f"Computed Loss: {loss:.6f}\n")

    for i in range(labels.shape[0]):
        print(f"=== Sample {i} ===")
        print(f"Bias words: {bias_words}")
        print(f"{'Position':<10} {'Label Token':<14} {'Decoded':<22} {'Weight':<8} {'Match'}")
        print("-" * 70)
        for pos in range(labels.shape[1]):
            tok = int(labels[i, pos])
            decoded = tokenizer.decode([tok]) if tok >= 0 else "(masked)"
            w = float(weights[i, pos])
            match = "Yes" if w != 1.0 else "No"
            print(f"{pos:<10} {tok:<14} {decoded[:20]:<22} {w:<8.2f} {match}")

    # cross-check vs the literal harness algorithm
    ref_w = np.ones(labels.shape, np.float32)
    for i in range(labels.shape[0]):
        for span in spans[i]:
            span = [int(t) for t in span if t != PAD]
            if not span:
                continue
            L = len(span)
            for j in range(labels.shape[1] - L + 1):
                if labels[i, j:j + L].tolist() == span:
                    for kk in range(L):
                        if int(labels[i, j + kk]) not in WHISPER_SPECIAL_TOKENS:
                            ref_w[i, j + kk] = 1.5
    assert np.array_equal(weights, ref_w), "weight mismatch vs harness replica!"
    print("\nOK: vectorized weights identical to the harness replica.")


if __name__ == "__main__":
    main()
