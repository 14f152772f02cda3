"""Medusa heads: multi-token prediction for self-speculative decoding.

"Whisper in Medusa's Ear" (arXiv:2409.15869) applies Medusa (Cai et al.)
to Whisper: K small heads on the decoder's final hidden state predict
tokens t+2 .. t+K+1, so ONE decoder forward both verifies the previous
round's proposal and produces the next one — speculative decoding without
a separate draft model, draft cache, or second weight set
(decode/medusa.py runs the loop; train/medusa.py fits the heads).

Head j is the Medusa-1 residual block with the vocab projection TIED to
the model's token embedding:

    h_j = hidden + silu(hidden @ w_j + b_j)        w_j: (d, d)
    logits_j = project_vocab(h_j)                  (no per-head vocab matrix)

Tying keeps the whole K-head stack at K·d² params (~0.6M per head for
base.en) and reuses the model's own output geometry, which is also what
makes untrained heads harmless: verification guarantees the emitted
sequence equals plain greedy regardless of head quality — heads only set
the speed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig
from .whisper import project_vocab


def init_medusa_params(cfg: WhisperConfig, n_heads: int,
                       key: jax.Array | int = 0) -> dict:
    """{"w": (K, d, d), "b": (K, d)} — near-zero init so untrained heads
    start as the identity residual (proposals = the model's own next-token
    distribution applied K times, a sane cold start)."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    d = cfg.d_model
    w = jax.random.normal(key, (n_heads, d, d), jnp.float32) * 1e-3
    return {"w": w, "b": jnp.zeros((n_heads, d), jnp.float32)}


def medusa_logits(params, medusa: dict, hidden: jax.Array) -> jax.Array:
    """(B, S, D) hidden -> (K, B, S, V) per-head logits."""
    dt = hidden.dtype

    def one(wb):
        w, b = wb
        h = hidden + jax.nn.silu(hidden @ w.astype(dt) + b.astype(dt))
        return project_vocab(params, h)

    return jax.lax.map(one, (medusa["w"], medusa["b"]))


def save_medusa(path: str, medusa: dict) -> None:
    extra = {}
    if "n_chains" in medusa:
        extra["n_chains"] = np.int32(medusa["n_chains"])
    np.savez(path, w=np.asarray(medusa["w"]), b=np.asarray(medusa["b"]),
             **extra)


def load_medusa(path: str, n_chains: int | None = None) -> dict:
    """Load saved heads; ``n_chains`` (when truthy) overrides any stored
    chain setting — the one place every CLI's ``--medusa_chains`` routes
    through instead of stamping the dict by hand."""
    with np.load(path) as z:
        md = {"w": jnp.asarray(z["w"]), "b": jnp.asarray(z["b"])}
        if "n_chains" in z:
            md["n_chains"] = int(z["n_chains"])
    if n_chains:
        md["n_chains"] = int(n_chains)
    return md


def split_medusa(medusa: dict) -> tuple[dict, int]:
    """(heads, n_chains): strip the optional ``n_chains`` decode setting
    bundled in a medusa dict. n_chains is a STATIC jit argument
    (decode/medusa.py) and must not reach the traced head pytree."""
    return ({"w": medusa["w"], "b": medusa["b"]},
            int(medusa.get("n_chains", 1)))
