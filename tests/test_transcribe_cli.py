"""CLI-surface smoke tests for scripts/transcribe.py — the one entry point
previously covered only through its library building blocks. Drives main()
in-process (sys.argv monkeypatched) with the real tiny.en config on CPU, so
the flag surface, routing (short-form vs --long --vad), and output formats
are locked by tests like the other scripts are."""

import importlib.util
import json
import os
import sys
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _load_transcribe():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "transcribe.py")
    spec = importlib.util.spec_from_file_location("transcribe_mod", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["transcribe_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_wav(path, parts, rng):
    """parts: (kind, seconds) with kind 'sil'|'sp'."""
    chunks = []
    for kind, secs in parts:
        n = int(secs * 16000)
        chunks.append(np.zeros(n, np.int16) if kind == "sil"
                      else (rng.standard_normal(n) * 3000).astype(np.int16))
    sig = np.concatenate(chunks)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())
    return len(sig) / 16000


class TestTranscribeCli:
    def test_short_form_json(self, tmp_path, monkeypatch, capsys):
        mod = _load_transcribe()
        rng = np.random.default_rng(0)
        wav = tmp_path / "a.wav"
        _write_wav(wav, [("sp", 2)], rng)
        monkeypatch.setattr(sys, "argv", [
            "transcribe.py", "--model", "tiny.en", "--audio", str(wav),
            "--max_tokens", "2", "--format", "json"])
        mod.main()
        lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.startswith("{")]
        assert lines, "no JSON output line"
        rec = json.loads(lines[-1])
        assert rec["file"] == str(wav) and "text" in rec

    def test_long_vad_clip_json(self, tmp_path, monkeypatch, capsys):
        """--long --vad on a silence-heavy file: runs end to end and emits
        the JSON contract; the silent prefix produces no segments."""
        mod = _load_transcribe()
        rng = np.random.default_rng(1)
        wav = tmp_path / "b.wav"
        _write_wav(wav, [("sil", 32), ("sp", 3)], rng)
        monkeypatch.setattr(sys, "argv", [
            "transcribe.py", "--model", "tiny.en", "--audio", str(wav),
            "--long", "--vad", "--max_tokens", "2", "--format", "json",
            "--temperatures", "0.0",
            "--logprob_threshold", "nan", "--no_speech_threshold", "nan"])
        mod.main()
        lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.startswith("{")]
        rec = json.loads(lines[-1])
        assert "segments" in rec
        # every segment starts after the 32 s silent prefix was skipped
        for seg in rec["segments"]:
            assert seg["start"] >= 31.0

    def test_clip_without_long_warns(self, tmp_path, monkeypatch, capsys):
        mod = _load_transcribe()
        rng = np.random.default_rng(2)
        wav = tmp_path / "c.wav"
        _write_wav(wav, [("sp", 1)], rng)
        monkeypatch.setattr(sys, "argv", [
            "transcribe.py", "--model", "tiny.en", "--audio", str(wav),
            "--clip_timestamps", "0-1", "--max_tokens", "2"])
        mod.main()
        err = capsys.readouterr().err
        assert "gate long-form/chunked windows" in err
