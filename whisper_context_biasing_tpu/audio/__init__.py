"""Audio layer: host-side loading/resampling and the jittable log-mel frontend."""

from .io import load_audio, resample
from .mel import (
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    log_mel_spectrogram_np,
    mel_filter_bank,
    pad_or_trim,
)

__all__ = [
    "load_audio",
    "resample",
    "log_mel_spectrogram",
    "log_mel_spectrogram_np",
    "mel_filter_bank",
    "pad_or_trim",
    "SAMPLE_RATE",
    "N_FFT",
    "N_FRAMES",
    "N_SAMPLES",
    "HOP_LENGTH",
]
