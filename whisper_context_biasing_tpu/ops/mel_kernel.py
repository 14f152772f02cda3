"""Fused Pallas log-mel frontend kernel.

Fuses the frontend's FLOPs — Hann window, real-DFT matmul, power spectrum,
mel projection — into one kernel, so the (frames, 402) complex spectrum and
the (frames, 201) power spectrum never touch HBM (in the XLA version each is
a materialized intermediate). Framing itself (an overlapping gather) stays in
XLA, which lowers it to an efficient dynamic-slice copy; Mosaic cannot
re-tile a 1-D sample stream into (frames, 400) windows in-register.

The DFT basis is zero-padded to lane-aligned width (402 -> 2*256) so the MXU
runs full tiles; the mel filterbank consumes the padded power columns with
zero rows. The final log10/dynamic-range clamp stays in XLA (it needs a
global max over the whole spectrogram and fuses into the consumer anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.mel import (
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    dft_basis,
    hann_window_periodic,
    mel_filter_bank,
)

FRAME_BLOCK = 200          # 3000 frames = 15 blocks; 200 % 8 == 0
N_BINS = N_FFT // 2 + 1    # 201
BINS_PAD = 256             # lane-aligned


@functools.lru_cache(maxsize=2)
def _windowed_basis() -> np.ndarray:
    """(400, 2*BINS_PAD): [cos | 0-pad | -sin | 0-pad], with the Hann window
    folded into the basis rows (one matmul does window+DFT)."""
    b = dft_basis() * hann_window_periodic()[:, None]  # (400, 402)
    out = np.zeros((N_FFT, 2 * BINS_PAD), np.float32)
    out[:, :N_BINS] = b[:, :N_BINS]
    out[:, BINS_PAD : BINS_PAD + N_BINS] = b[:, N_BINS:]
    return out


@functools.lru_cache(maxsize=4)
def _padded_fb(n_mels: int) -> np.ndarray:
    """(BINS_PAD, n_mels): mel filterbank, zero rows beyond bin 201."""
    fb = mel_filter_bank(n_mels=n_mels)  # (n_mels, 201)
    out = np.zeros((BINS_PAD, n_mels), np.float32)
    out[:N_BINS] = fb.T
    return out


def _mel_kernel(frames_ref, basis_ref, fb_ref, out_ref):
    """Grid cell: one block of frames. frames: (F, 400) f32."""
    spec = jax.lax.dot_general(
        frames_ref[...], basis_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (F, 2*BINS_PAD)
    power = spec[:, :BINS_PAD] ** 2 + spec[:, BINS_PAD:] ** 2
    out_ref[...] = jax.lax.dot_general(
        power, fb_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_spectrogram_fused(
    audio: jax.Array, n_mels: int = 80, interpret: bool = False
) -> jax.Array:
    """Batched fused frontend: (B, 480000) f32 -> (B, n_mels, 3000) f32.
    Numerically equivalent to ``audio.mel.log_mel_spectrogram``."""
    if audio.ndim == 1:
        audio = audio[None]
    b = audio.shape[0]
    n_frames = audio.shape[1] // HOP_LENGTH
    padded = jnp.pad(audio, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    idx = jnp.arange(n_frames)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    frames = padded[:, idx].reshape(b * n_frames, N_FFT)  # (B*T, 400)

    basis = jnp.asarray(_windowed_basis())
    fb = jnp.asarray(_padded_fb(n_mels))

    total = b * n_frames
    pad_rows = (-total) % FRAME_BLOCK
    if pad_rows:
        frames = jnp.pad(frames, ((0, pad_rows), (0, 0)))
    grid = ((total + pad_rows) // FRAME_BLOCK,)
    mel = pl.pallas_call(
        _mel_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((FRAME_BLOCK, N_FFT), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FRAME_BLOCK, n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total + pad_rows, n_mels), jnp.float32),
        interpret=interpret,
    )(frames, basis, fb)

    mel = mel[:total].reshape(b, n_frames, n_mels)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    peak = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    out = (log_spec + 4.0) / 4.0
    return jnp.transpose(out, (0, 2, 1))
