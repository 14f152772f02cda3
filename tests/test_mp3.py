"""MP3 ingestion tests: the corpus audio is .mp3 (SURVEY.md §2.2; every
``file`` key in the reference jsonl). Fixtures are encoded on the fly with
libmp3lame (test-only dependency) and decoded through the production
``load_audio`` path (libmpg123 binding + polyphase resample)."""

import ctypes
import ctypes.util
import os

import numpy as np
import pytest

from whisper_context_biasing_tpu.audio import load_audio
from whisper_context_biasing_tpu.audio.mp3 import available as mpg123_available


def _find_lame():
    cands = []
    found = ctypes.util.find_library("mp3lame")
    if found:
        cands.append(found)
    cands += ["libmp3lame.so.0", "libmp3lame.so",
              "/usr/lib/x86_64-linux-gnu/libmp3lame.so.0"]
    for c in cands:
        try:
            return ctypes.CDLL(c)
        except OSError:
            continue
    return None


_LAME = _find_lame()

pytestmark = pytest.mark.skipif(
    _LAME is None or not mpg123_available(),
    reason="libmp3lame / libmpg123 not available for MP3 fixtures",
)


def lame_encode(path: str, sig: np.ndarray, sr: int, stereo: bool = False):
    """Encode float32 [-1,1] (n,) or (2, n) to an MP3 file (test fixture)."""
    lame = _LAME
    lame.lame_init.restype = ctypes.c_void_p
    h = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(h, sr)
    lame.lame_set_num_channels(h, 2 if stereo else 1)
    lame.lame_set_mode(h, 0 if stereo else 3)  # 0=stereo, 3=mono
    lame.lame_set_brate(h, 96)
    assert lame.lame_init_params(h) >= 0
    if stereo:
        left = (sig[0] * 32767).astype(np.int16)
        right = (sig[1] * 32767).astype(np.int16)
    else:
        left = (sig * 32767).astype(np.int16)
        right = left
    n = left.shape[0]
    out = ctypes.create_string_buffer(n * 5 // 4 + 7200)
    ln = lame.lame_encode_buffer(
        h, left.ctypes.data_as(ctypes.c_void_p),
        right.ctypes.data_as(ctypes.c_void_p), n, out, len(out),
    )
    assert ln >= 0
    data = out.raw[:ln]
    ln = lame.lame_encode_flush(h, out, len(out))
    data += out.raw[:ln]
    lame.lame_close(h)
    with open(path, "wb") as f:
        f.write(data)


def _dominant_freq(x: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return float(np.fft.rfftfreq(len(x), 1.0 / sr)[int(np.argmax(spec))])


class TestMp3Ingestion:
    @pytest.mark.parametrize("src_sr", [16000, 24000, 44100])
    def test_sine_roundtrip_resampled_to_16k(self, tmp_path, src_sr):
        """load_audio on an MP3 matches the librosa contract: mono float32
        at 16 kHz with the signal content intact."""
        f0 = 440.0
        t = np.arange(int(src_sr * 1.0)) / src_sr
        sig = (0.6 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
        p = str(tmp_path / f"tone_{src_sr}.mp3")
        lame_encode(p, sig, src_sr)

        out = load_audio(p, sample_rate=16000)
        assert out.dtype == np.float32 and out.ndim == 1
        # ~1 s of audio survives (codec delay pads a few hundred samples)
        assert abs(len(out) - 16000) < 4000
        body = out[4000:12000]  # skip encoder warmup
        assert abs(_dominant_freq(body, 16000) - f0) < 10.0
        peak = np.abs(body).max()
        assert 0.4 < peak < 0.8  # amplitude preserved through codec+resample

    def test_stereo_downmix(self, tmp_path):
        sr = 32000
        t = np.arange(sr) / sr
        left = 0.5 * np.sin(2 * np.pi * 300 * t)
        right = 0.5 * np.sin(2 * np.pi * 300 * t)
        sig = np.stack([left, right]).astype(np.float32)
        p = str(tmp_path / "stereo.mp3")
        lame_encode(p, sig, sr, stereo=True)
        out = load_audio(p, sample_rate=16000)
        assert out.ndim == 1
        body = out[4000:12000]
        assert abs(_dominant_freq(body, 16000) - 300.0) < 10.0

    def test_corpus_contract_jsonl_mp3_keys_loadable(self, tmp_path):
        """End-to-end dataset path: a jsonl row pointing at an .mp3 file
        (the reference corpus schema) produces mel features."""
        import json

        from whisper_context_biasing_tpu.data import PromptWhisperDataset
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        sr = 24000
        t = np.arange(sr) / sr
        sig = (0.4 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
        audio_dir = tmp_path / "audio" / "test"
        audio_dir.mkdir(parents=True)
        lame_encode(str(audio_dir / "u0.mp3"), sig, sr)
        jd = tmp_path / "jsonl"
        jd.mkdir()
        with open(jd / "test.jsonl", "w") as f:
            f.write(json.dumps({
                "id": "0", "file": "u0.mp3", "text": "five hundred hertz",
                "description": "a tone", "bias_words": ["hertz"],
            }) + "\n")

        tok = load_tokenizer()
        ds = PromptWhisperDataset(
            base_path=str(tmp_path / "audio"), jsonl_data=str(jd),
            phase="test", tokenizer=tok,
        )
        item = ds[0]
        assert item["input_features"].shape[0] == 80
        assert np.isfinite(item["input_features"]).all()
