"""Acceptance-harness unit tests (scripts/acceptance.py): weight resolution,
corpus staging, and the offline metric-parity asserts against the committed
reference artifacts (VERDICT r2 ask #2)."""

import importlib.util
import json
import os
import wave

import numpy as np
import pytest

from conftest import requires_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def acc():
    spec = importlib.util.spec_from_file_location(
        "wcb_acceptance", os.path.join(REPO, "scripts", "acceptance.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestResolveWeights:
    def test_resolution_order_and_misses(self, acc, tmp_path):
        assert acc.resolve_weights(None, "tiny.en") is None
        assert acc.resolve_weights(str(tmp_path), "tiny.en") is None

        flat = tmp_path / "tiny.en.safetensors"
        flat.write_bytes(b"x")
        assert acc.resolve_weights(str(tmp_path), "tiny.en") == str(flat)

        # <dir>/<model>/model.safetensors wins over the flat file
        nested = tmp_path / "tiny.en"
        nested.mkdir()
        (nested / "model.safetensors").write_bytes(b"x")
        assert acc.resolve_weights(str(tmp_path), "tiny.en") == str(
            nested / "model.safetensors")

    def test_native_checkpoint_dir(self, acc, tmp_path):
        d = tmp_path / "base.en"
        d.mkdir()
        assert acc.resolve_weights(str(tmp_path), "base.en") is None  # no params
        (d / "params.npz").write_bytes(b"x")
        assert acc.resolve_weights(str(tmp_path), "base.en") == str(d)


class TestLoadRows:
    @requires_reference
    def test_reads_reference_jsonl_with_limit(self, acc):
        rows = acc.load_rows(os.path.join(acc.REFERENCE_ROOT, "data"),
                             "medical-united-syn-med-test-jsonl/test.jsonl", 3)
        assert len(rows) == 3
        assert {"id", "file", "text", "description", "bias_words"} <= set(rows[0])

    def test_builtin_fallback(self, acc, tmp_path):
        rows = acc.load_rows(str(tmp_path), "missing.jsonl", 2)
        assert len(rows) == 2 and rows[0]["bias_words"] == ["aspirin"]


class TestStageCorpus:
    def test_synthesizes_missing_audio(self, acc, tmp_path):
        rows = [{"id": "0", "file": "x.mp3", "text": "t", "description": "",
                 "bias_words": []}]
        base, jsonl_dir, audio_s, real = acc.stage_corpus(
            str(tmp_path), "test", rows, "", "")
        assert not real and audio_s == pytest.approx(2.0)
        with open(os.path.join(jsonl_dir, "test.jsonl")) as f:
            staged = [json.loads(l) for l in f]
        # mp3 pointer rewritten to the synthesized wav
        assert staged[0]["file"] == "x.wav"
        path = os.path.join(base, "test", "x.wav")
        with wave.open(path) as w:
            assert w.getframerate() == 16000
            assert w.getnframes() == 32000

    def test_uses_real_audio_when_present(self, acc, tmp_path):
        d = tmp_path / "aud" / "test"
        d.mkdir(parents=True)
        sig = (np.zeros(8000)).astype(np.int16)
        with wave.open(str(d / "r.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(sig.tobytes())
        rows = [{"id": "0", "file": "r.wav", "text": "t", "description": "",
                 "bias_words": []}]
        base, _, audio_s, real = acc.stage_corpus(
            str(tmp_path / "out"), "test", rows, str(tmp_path), "aud")
        assert real and base == str(tmp_path / "aud")
        assert audio_s == pytest.approx(0.5)


@requires_reference
class TestMetricParity:
    def test_offline_asserts_pass_on_committed_artifacts(self, acc):
        out = acc.metric_parity_asserts(0.01)
        assert [a["status"] for a in out] == ["pass", "pass"]
        by = {a["assert"]: a for a in out}
        assert by["metric_parity:desc_only_dev"]["wer"] == pytest.approx(8.33, abs=0.005)
        assert by["metric_parity:baseline_test"]["bias_wer"] == pytest.approx(
            57.287, abs=0.005)
