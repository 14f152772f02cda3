"""Log-mel frontend parity tests.

The numpy reference is bit-diffed against HF's locally-constructible
``WhisperFeatureExtractor`` (the exact implementation the reference calls at
data_utils/data_loader.py:171), and the JAX/MXU matmul-STFT implementation is
diffed against the numpy reference (<1e-4, SURVEY.md §7 step 3)."""

import numpy as np
import pytest

from whisper_context_biasing_tpu.audio import (
    N_FRAMES,
    N_SAMPLES,
    load_audio,
    log_mel_spectrogram,
    log_mel_spectrogram_np,
    mel_filter_bank,
    pad_or_trim,
    resample,
)


def _test_signal(seed=0, n=N_SAMPLES, sr=16000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1337 * t)
        + 0.05 * rng.standard_normal(n)
    )
    return sig.astype(np.float32)


@pytest.fixture(scope="module")
def hf_extractor():
    from transformers import WhisperFeatureExtractor

    return WhisperFeatureExtractor()


class TestMelFilterBank:
    def test_matches_hf(self, hf_extractor):
        ours = mel_filter_bank(n_mels=80)
        theirs = np.asarray(hf_extractor.mel_filters, dtype=np.float32)
        # HF stores (n_freqs, n_mels)
        assert ours.shape == (80, 201)
        np.testing.assert_allclose(ours, theirs.T, atol=1e-7)

    def test_128_mels_for_large_v3(self):
        fb = mel_filter_bank(n_mels=128)
        assert fb.shape == (128, 201)
        assert np.all(fb >= 0)


class TestNumpyReference:
    @pytest.mark.parametrize("seed,length", [(0, N_SAMPLES), (1, 16000), (2, 123456)])
    def test_matches_hf_extractor(self, hf_extractor, seed, length):
        sig = _test_signal(seed, length)
        theirs = np.asarray(
            hf_extractor(sig, sampling_rate=16000).input_features[0], dtype=np.float32
        )
        ours = log_mel_spectrogram_np(sig)
        assert ours.shape == theirs.shape == (80, 3000)
        # HF evaluates parts of the pipeline in float32; residual is pure
        # rounding noise (observed max ~2.5e-5 on the log scale).
        np.testing.assert_allclose(ours, theirs, atol=5e-5)

    def test_silence(self, hf_extractor):
        sig = np.zeros(N_SAMPLES, dtype=np.float32)
        theirs = np.asarray(hf_extractor(sig, sampling_rate=16000).input_features[0])
        ours = log_mel_spectrogram_np(sig)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestJaxFrontend:
    def test_matches_numpy_reference(self):
        sig = _test_signal(3)
        ref = log_mel_spectrogram_np(sig)
        out = np.asarray(log_mel_spectrogram(sig[None]))[0]
        assert out.shape == (80, N_FRAMES)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_batched(self):
        sigs = np.stack([_test_signal(i) for i in range(3)])
        out = np.asarray(log_mel_spectrogram(sigs))
        assert out.shape == (3, 80, N_FRAMES)
        for i in range(3):
            np.testing.assert_allclose(out[i], log_mel_spectrogram_np(sigs[i]), atol=1e-4)

    def test_128_mel(self):
        sig = _test_signal(4)
        out = np.asarray(log_mel_spectrogram(sig[None], n_mels=128))
        assert out.shape == (1, 128, N_FRAMES)
        np.testing.assert_allclose(out[0], log_mel_spectrogram_np(sig, n_mels=128), atol=1e-4)

    def test_output_range(self):
        out = np.asarray(log_mel_spectrogram(_test_signal(5)[None]))
        # (log+4)/4 with an 8-decade dynamic-range clamp -> bounded window
        assert out.min() >= (out.max() - 2.0) - 1e-6


class TestPadTrimAndIO:
    def test_pad(self):
        assert pad_or_trim(np.ones(100, np.float32)).shape == (N_SAMPLES,)

    def test_trim(self):
        assert pad_or_trim(np.ones(N_SAMPLES + 7, np.float32)).shape == (N_SAMPLES,)

    def test_wav_roundtrip(self, tmp_path):
        import wave

        sig = (_test_signal(6, 32000) * 32767).astype(np.int16)
        p = tmp_path / "t.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(sig.tobytes())
        loaded = load_audio(str(p))
        np.testing.assert_allclose(loaded, sig.astype(np.float32) / 32768.0, atol=1e-6)

    def test_stereo_downmix_and_resample(self, tmp_path):
        import wave

        sig = (_test_signal(7, 32000) * 16384).astype(np.int16)
        inter = np.empty(2 * len(sig), dtype=np.int16)
        inter[0::2] = sig
        inter[1::2] = sig
        p = tmp_path / "s.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(32000)
            w.writeframes(inter.tobytes())
        loaded = load_audio(str(p), sample_rate=16000)
        assert loaded.ndim == 1
        assert abs(len(loaded) - 16000) <= 1

    def test_resample_identity(self):
        x = _test_signal(8, 16000)
        assert resample(x, 16000, 16000) is x

    def test_keep_int16_passthrough_and_fallback(self, tmp_path):
        """keep_int16 returns raw PCM only when no processing is needed;
        a file requiring resample falls back to the float32 contract."""
        import wave

        sig = (_test_signal(9, 16000) * 32767).astype(np.int16)
        p = tmp_path / "i.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(sig.tobytes())
        raw = load_audio(str(p), keep_int16=True)
        assert raw.dtype == np.int16
        np.testing.assert_array_equal(raw, sig)

        q = tmp_path / "r.wav"
        with wave.open(str(q), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(32000)
            w.writeframes(sig.tobytes())
        out = load_audio(str(q), sample_rate=16000, keep_int16=True)
        assert out.dtype == np.float32
        assert abs(len(out) - len(sig) // 2) <= 1


@pytest.mark.slow
class TestShortWindows:
    """Bucketed short-utterance serving: any hop-aligned window length."""

    def test_short_window_jax_matches_fused(self):
        import jax.numpy as jnp
        from whisper_context_biasing_tpu.ops.mel_kernel import log_mel_spectrogram_fused

        sig = _test_signal(9, n=128000)  # 8 s -> 800 frames
        a = np.asarray(log_mel_spectrogram(jnp.asarray(sig[None])))
        b = np.asarray(log_mel_spectrogram_fused(jnp.asarray(sig[None]), interpret=True))
        assert a.shape == b.shape == (1, 80, 800)
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_short_context_encoder_and_decode(self):
        import jax.numpy as jnp
        from whisper_context_biasing_tpu.decode import greedy_decode, pack_prefixes
        from whisper_context_biasing_tpu.models import (
            encode_audio, init_params, tiny_test_config,
        )

        cfg = tiny_test_config()  # n_audio_ctx 64
        params = init_params(cfg, 0)
        rng = np.random.default_rng(0)
        mel_short = jnp.asarray((rng.standard_normal((1, 80, 64)) * 0.5).astype(np.float32))
        enc = encode_audio(params, cfg, mel_short)
        assert enc.shape == (1, 32, cfg.d_model)  # half the max context
        ids, mask = pack_prefixes([[50257]], 50256)
        r = greedy_decode(params, cfg, mel_short, jnp.asarray(ids), jnp.asarray(mask), max_new=4)
        assert np.asarray(r.tokens).shape == (1, 4)
