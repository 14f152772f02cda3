"""Whisper log-mel frontend.

The reference computes features host-side via HF ``WhisperFeatureExtractor``
(data_utils/data_loader.py:171). Here the frontend is a *jittable JAX function*
designed for the MXU: the STFT is expressed as a framed matmul against a real
DFT basis (400x402) fused with the mel projection (201x n_mels) — two dense
matmuls XLA tiles directly onto the systolic array, instead of an FFT op the
TPU backend handles poorly at n_fft=400.

Public Whisper parameters: 16 kHz audio padded/trimmed to 30 s (480000
samples), n_fft=400, hop=160, periodic Hann window, centered frames (reflect
pad), 80 mel filters (128 for large-v3), Slaney scale + Slaney norm, fmax=8k,
``log10(clamp(.,1e-10))`` → per-utterance dynamic-range clamp at max-8 →
``(x+4)/4``.

A numpy reference implementation is kept alongside for bit-level diffing
against HF's extractor (tests/test_mel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


def _hertz_to_mel_slaney(freq):
    """Slaney mel scale (public formula): linear below 1 kHz, log above."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    safe = np.maximum(freq, 1e-12)  # avoid log(0) in the unselected branch
    return np.where(freq >= min_log_hz, min_log_mel + np.log(safe / min_log_hz) * logstep, mels)


def _mel_to_hertz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(mels >= min_log_mel, 1000.0 * np.exp(logstep * (mels - min_log_mel)), freq)


@functools.lru_cache(maxsize=4)
def mel_filter_bank(
    n_freqs: int = N_FFT // 2 + 1,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_freqs).
    Matches HF ``mel_filter_bank(..., norm="slaney", mel_scale="slaney")``."""
    fft_freqs = np.linspace(0.0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(_hertz_to_mel_slaney(f_min), _hertz_to_mel_slaney(f_max), n_mels + 2)
    hz_pts = _mel_to_hertz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up)).T  # (n_mels, n_freqs)

    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=1)
def hann_window_periodic(n: int = N_FFT) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


@functools.lru_cache(maxsize=2)
def dft_basis(n_fft: int = N_FFT) -> np.ndarray:
    """Real DFT basis: (n_fft, 2*(n_fft//2+1)) with [cos | -sin] columns so that
    frames @ basis = [Re(rfft) | Im(rfft)]."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(np.float32)


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Host-side pad/trim to the fixed 30 s window (static shapes for XLA)."""
    audio = np.asarray(audio, dtype=np.float32)
    if audio.shape[-1] >= length:
        return audio[..., :length]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - audio.shape[-1])]
    return np.pad(audio, pad)


# ---------------------------------------------------------------------------
# numpy reference (bit-diffed against HF WhisperFeatureExtractor in tests)
# ---------------------------------------------------------------------------

def log_mel_spectrogram_np(audio: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """Reference implementation, one utterance: (480000,) -> (n_mels, 3000)."""
    audio = pad_or_trim(audio).astype(np.float64)
    padded = np.pad(audio, N_FFT // 2, mode="reflect")
    idx = np.arange(N_FRAMES + 1)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    frames = padded[idx] * hann_window_periodic().astype(np.float64)
    spec = np.fft.rfft(frames, axis=-1)
    power = np.abs(spec[:-1]) ** 2  # drop the trailing frame -> 3000
    mel = power @ mel_filter_bank(n_mels=n_mels).astype(np.float64).T
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return (((log_spec + 4.0) / 4.0).T).astype(np.float32)  # (n_mels, frames)


# ---------------------------------------------------------------------------
# JAX implementation (jittable, batched, MXU-friendly)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_mels",))
def log_mel_spectrogram(audio: jax.Array, n_mels: int = 80) -> jax.Array:
    """Batched log-mel: (B, n_samples) float32 -> (B, n_mels, n_samples/160).

    STFT-as-matmul: framed signal (B*T, 400) @ DFT basis (400, 402) on the
    MXU, power, then mel projection (.., 201) @ (201, n_mels). n_samples is
    480000 for the standard 30 s window; shorter (hop-aligned) windows are
    supported for bucketed short-utterance serving."""
    if audio.ndim == 1:
        audio = audio[None]
    b = audio.shape[0]
    n_frames = audio.shape[1] // HOP_LENGTH
    window = jnp.asarray(hann_window_periodic())
    basis = jnp.asarray(dft_basis())
    fb = jnp.asarray(mel_filter_bank(n_mels=n_mels))
    n_bins = N_FFT // 2 + 1

    padded = jnp.pad(audio, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    # frame gather: (B, T, 400); the trailing (T+1th) frame is never built
    idx = jnp.arange(n_frames)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    frames = padded[:, idx] * window  # (B, T, 400)

    # precision=HIGHEST: the default matmul precision truncates f32 operands
    # (bf16 passes on TPU), which costs ~3 decades of dynamic range in the
    # low-power bins; the frontend is ~1 GFLOP/clip so full f32 is free.
    spec = jnp.einsum(
        "btn,nk->btk", frames, basis,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # (B, 3000, 402)
    power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2
    mel = jnp.einsum(
        "btf,mf->btm", power, fb,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    peak = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    out = (log_spec + 4.0) / 4.0
    return jnp.transpose(out, (0, 2, 1)).reshape(b, n_mels, n_frames)


def select_mel_frontend():
    """The log-mel frontend for the effective dispatch platform.

    The fused Pallas kernel on TPU, this module's bit-diffed pure-jnp
    frontend everywhere else (the kernel only compiles on TPU). The ONE
    gate shared by ``Pipeline._mel``, ``scripts/serve.py`` and
    ``scripts/transcribe.py`` — fix platform handling here, not per caller.
    Returns a callable ``(audio, n_mels=80) -> (B, n_mels, T)``.
    """
    from ..utils import effective_platform

    if effective_platform() == "tpu":
        from ..ops.mel_kernel import log_mel_spectrogram_fused

        return log_mel_spectrogram_fused
    return log_mel_spectrogram
