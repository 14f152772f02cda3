"""SpecAugment for Whisper fine-tuning — in-graph mel masking.

The reference's only augmentation is the 5% text-prompt perturbation
(data_utils/data_loader.py:214-223); the spectrogram itself is never
augmented. This module adds the classic SpecAugment policy (frequency and
time masking, Park et al. 2019) as a pure jittable transform applied inside
the training step — no host-side work, no data-pipeline changes, and the
eval path is untouched.

TPU notes: masks are built from broadcasted ``arange`` comparisons (VPU
elementwise only, no gathers/scatters), widths and counts are static so one
program serves every step, and randomness derives from
``fold_in(seed_key, state.step)`` so runs are reproducible and resumable
without threading an rng through the step API.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SpecAugmentConfig:
    n_freq_masks: int = 2
    max_freq_width: int = 27      # of 80/128 mel bins (LibriSpeech LD policy)
    n_time_masks: int = 2
    max_time_frac: float = 0.05   # per mask, fraction of the frame axis


def _axis_masks(key, b: int, axis_len: int, n_masks: int, max_width: int):
    """(B, axis_len) bool: union of ``n_masks`` random [start, start+w) runs
    per row, w ~ U[0, max_width], start ~ U[0, axis_len-1]. Runs are clipped
    at the axis end (the standard implementation's behavior)."""
    idx = jnp.arange(axis_len)
    mask = jnp.zeros((b, axis_len), bool)
    for k in jax.random.split(key, n_masks):
        kw, ks = jax.random.split(k)
        w = jax.random.randint(kw, (b,), 0, max_width + 1)
        s = jax.random.randint(ks, (b,), 0, max(axis_len, 1))
        mask |= (idx[None, :] >= s[:, None]) & (idx[None, :] < (s + w)[:, None])
    return mask


def apply_spec_augment(
    feats: jax.Array,              # (B, n_mels, T) log-mel features
    key: jax.Array,
    cfg: SpecAugmentConfig = SpecAugmentConfig(),
) -> jax.Array:
    """Masked regions are replaced by each sample's mean log-mel value (the
    'mean' fill of the original paper; Whisper mels are globally scaled, so
    zeros would be an out-of-distribution energy)."""
    b, m, t = feats.shape
    kf, kt = jax.random.split(key)
    fmask = _axis_masks(kf, b, m, cfg.n_freq_masks, cfg.max_freq_width)
    max_t = max(1, int(t * cfg.max_time_frac))
    tmask = _axis_masks(kt, b, t, cfg.n_time_masks, max_t)
    masked = fmask[:, :, None] | tmask[:, None, :]
    fill = jnp.mean(feats, axis=(1, 2), keepdims=True)
    return jnp.where(masked, fill.astype(feats.dtype), feats)
