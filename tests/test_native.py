"""Native C++ audio runtime tests: build, WAV decode parity vs the Python
loader, resampling quality, threaded batch decode, and error paths."""

import shutil
import wave

import numpy as np
import pytest

from whisper_context_biasing_tpu.audio import load_audio
from whisper_context_biasing_tpu.audio import native

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module", autouse=True)
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("native library failed to build")
    return lib


def write_wav(path, sig_i16, sr=16000, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(sig_i16.tobytes())


def tone(n, sr=16000, f=440.0, amp=0.4, seed=None):
    t = np.arange(n) / sr
    sig = amp * np.sin(2 * np.pi * f * t)
    if seed is not None:
        sig += 0.01 * np.random.default_rng(seed).standard_normal(n)
    return sig.astype(np.float32)


class TestDecode:
    def test_matches_python_loader(self, tmp_path):
        sig = (tone(16000, seed=0) * 32767).astype(np.int16)
        p = tmp_path / "a.wav"
        write_wav(p, sig)
        ours = native.decode_audio(str(p))
        ref = load_audio(str(p))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_stereo_downmix(self, tmp_path):
        left = (tone(8000, f=300) * 16384).astype(np.int16)
        right = (tone(8000, f=700) * 16384).astype(np.int16)
        inter = np.empty(16000, np.int16)
        inter[0::2] = left
        inter[1::2] = right
        p = tmp_path / "s.wav"
        write_wav(p, inter, channels=2)
        ours = native.decode_audio(str(p))
        ref = load_audio(str(p))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_resample_quality(self, tmp_path):
        # 32k -> 16k of a band-limited tone: compare against scipy polyphase
        sig = (tone(32000, sr=32000, f=1000) * 32767).astype(np.int16)
        p = tmp_path / "r.wav"
        write_wav(p, sig, sr=32000)
        ours = native.decode_audio(str(p))
        ref = load_audio(str(p))  # scipy resample_poly
        n = min(len(ours), len(ref))
        # ignore filter edge transients
        a, b = ours[200 : n - 200], ref[200 : n - 200]
        err = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(b**2))
        assert err < 0.005, f"relative RMS {err}"

    def test_missing_file(self):
        with pytest.raises(RuntimeError, match="cannot read file"):
            native.decode_audio("/nonexistent/x.wav")

    def test_garbage_file(self, tmp_path):
        p = tmp_path / "bad.wav"
        p.write_bytes(b"not a wav at all, definitely not 44 bytes of RIFF")
        with pytest.raises(RuntimeError, match="RIFF"):
            native.decode_audio(str(p))


class TestBatch:
    def test_parallel_batch_pad_trim(self, tmp_path):
        paths = []
        for i, n in enumerate([8000, 16000, 24000]):
            sig = (tone(n, f=200 * (i + 1)) * 32767).astype(np.int16)
            p = tmp_path / f"b{i}.wav"
            write_wav(p, sig)
            paths.append(str(p))
        fixed = 16000
        out = native.decode_batch(paths, fixed_len=fixed, num_threads=3)
        assert out.shape == (3, fixed)
        # short file zero-padded
        assert np.all(out[0, 8000:] == 0)
        ref0 = load_audio(paths[0])
        np.testing.assert_allclose(out[0, :8000], ref0, atol=1e-6)
        # long file trimmed
        ref2 = load_audio(paths[2])
        np.testing.assert_allclose(out[2], ref2[:fixed], atol=1e-6)

    def test_batch_error_reports_file(self, tmp_path):
        good = tmp_path / "g.wav"
        write_wav(good, (tone(4000) * 32767).astype(np.int16))
        with pytest.raises(RuntimeError, match="missing.wav"):
            native.decode_batch([str(good), str(tmp_path / "missing.wav")],
                                fixed_len=4000)


class TestReviewRegressions:
    def test_extensible_wav_decodes(self, tmp_path):
        """WAVE_FORMAT_EXTENSIBLE (fmt tag 0xFFFE) wrapping plain PCM16 —
        the container pro-audio tools emit — must decode natively."""
        import struct

        from whisper_context_biasing_tpu.audio import native

        if not native.available():
            pytest.skip("no native lib")
        sr, n = 16000, 1600
        pcm = (np.sin(2 * np.pi * 440 * np.arange(n) / sr) * 20000).astype("<i2")
        # 40-byte extensible fmt chunk: tag 0xFFFE, cbSize 22, PCM SubFormat
        pcm_guid = (b"\x01\x00\x00\x00\x00\x00\x10\x00"
                    b"\x80\x00\x00\xaa\x00\x38\x9b\x71")
        fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 1, sr, sr * 2, 2, 16,
                          22, 16, 0x1) + pcm_guid
        data = pcm.tobytes()
        riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
            + b"data" + struct.pack("<I", len(data)) + data
        path = tmp_path / "ext.wav"
        path.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
        sig = native.decode_audio(str(path), sr)
        assert len(sig) == n
        np.testing.assert_allclose(sig, pcm.astype(np.float32) / 32768.0,
                                   atol=1e-4)

    def test_over_capacity_raises_and_load_audio_falls_back(self, tmp_path):
        import wave as _wave

        from whisper_context_biasing_tpu.audio import load_audio, native

        if not native.available():
            pytest.skip("no native lib")
        path = str(tmp_path / "long.wav")
        n = 16000 * 4
        with _wave.open(path, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(np.ones(n, np.int16).tobytes())
        with pytest.raises(RuntimeError, match="capacity"):
            native.decode_audio(path, 16000, max_len=16000)
        # the io-level entry point falls back to the Python decoder
        sig = load_audio(path, prefer_native=True)
        assert len(sig) == n
