"""Tests for aux subsystems (logging, profiling, debug checks) and the
offline data-preparation pipeline."""

import json
import os

import numpy as np
import pytest

from whisper_context_biasing_tpu.data.prepare import (
    build_manifest,
    extract_bias_words,
    label_descriptions,
    lexicon_from_labeled,
    split_train_dev,
    write_jsonl,
)
from whisper_context_biasing_tpu.utils import (
    RtfMeter,
    RunLogger,
    StepTimer,
    assert_shape,
    finite_check,
)


class TestLogger:
    def test_jsonl_log(self, tmp_path):
        lg = RunLogger(str(tmp_path), echo=False)
        lg.log({"loss": 1.5}, step=10)
        lg.log({"eval_wer": 42.0}, step=20)
        lg.close()
        lines = [json.loads(x) for x in open(lg.path)]
        assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 10
        assert lines[1]["eval_wer"] == 42.0

    def test_wandb_gracefully_disabled(self, tmp_path):
        lg = RunLogger(str(tmp_path), use_wandb=True, echo=False)  # offline
        lg.log({"x": 1.0}, step=1)
        lg.close()


class TestProfiling:
    def test_step_timer_warmup(self):
        t = StepTimer(warmup=1)
        for _ in range(3):
            with t:
                pass
        assert len(t.times) == 2
        assert t.best <= t.mean

    def test_rtf_meter(self):
        m = RtfMeter()
        m.add(audio_seconds=60.0, wall_seconds=2.0)
        m.add(audio_seconds=30.0, wall_seconds=1.0)
        assert m.rtf == pytest.approx(30.0)


class TestDebug:
    def test_finite_check_passes(self):
        finite_check({"a": np.ones(3), "b": [np.zeros(2)]})

    def test_finite_check_raises(self):
        with pytest.raises(FloatingPointError, match="bad"):
            finite_check({"bad": np.asarray([1.0, np.nan])}, name="bad")

    def test_assert_shape(self):
        assert_shape(np.zeros((2, 3)), (2, None))
        with pytest.raises(ValueError):
            assert_shape(np.zeros((2, 3)), (3, None), "x")


class TestPrepare:
    def _rows(self):
        return [
            {"id": "0", "file": "a.mp3", "text": "Take zovirax daily for relief."},
            {"id": "1", "file": "b.mp3", "text": "The nebulizer helps with asthma."},
            {"id": "2", "file": "c.mp3", "text": "Check with your doctor before use."},
        ]

    def test_manifest_from_jsonl(self, tmp_path):
        p = tmp_path / "src.jsonl"
        write_jsonl(self._rows(), str(p))
        rows = build_manifest(str(p))
        assert len(rows) == 3 and rows[0]["text"].startswith("Take")

    def test_manifest_from_dir(self, tmp_path):
        d = tmp_path / "utts"
        d.mkdir()
        for r in self._rows():
            with open(d / f"{r['id']}.json", "w") as f:
                json.dump({"id": r["id"], "text": r["text"]}, f)
        rows = build_manifest(str(d))
        assert len(rows) == 3
        assert rows[0]["file"].endswith(".mp3")

    def test_split(self):
        rows = [{"id": str(i)} for i in range(10)]
        tr, dv = split_train_dev(rows, 7, 3, seed=1)
        assert len(tr) == 7 and len(dv) == 3
        assert {r["id"] for r in tr} | {r["id"] for r in dv} == {str(i) for i in range(10)}
        with pytest.raises(ValueError):
            split_train_dev(rows, 9, 5)

    def test_descriptions_fallback(self):
        out = label_descriptions(self._rows())
        assert all(r["description"] == r["text"] for r in out)

    def test_descriptions_llm(self):
        out = label_descriptions(self._rows(), llm=lambda p: "A clinical note. ")
        assert all(r["description"] == "A clinical note." for r in out)

    def test_bias_rule_based(self):
        out = extract_bias_words(self._rows())
        words0 = [w.lower() for w in out[0]["bias_words"]]
        assert "zovirax" in words0          # rare brand-like token found
        assert "daily" not in words0        # common word excluded
        assert out[2]["bias_words"] == [] or "doctor" not in [
            w.lower() for w in out[2]["bias_words"]
        ]

    def test_bias_lexicon(self, tmp_path):
        labeled = [{"id": "x", "entities": [
            {"word": "zovirax", "type": "DRUGCHEMICAL"},
            {"word": "nebulizer", "type": "MEDDEVICETECHNIQUE"},
            {"word": "asthma", "type": "DISEASESYMPTOM"},  # excluded category
        ]}]
        p = tmp_path / "ner.jsonl"
        write_jsonl(labeled, str(p))
        lex = lexicon_from_labeled(str(p))
        assert lex == {"zovirax", "nebulizer"}
        out = extract_bias_words(self._rows(), lexicon=lex)
        assert [w.lower() for w in out[0]["bias_words"]] == ["zovirax"]
        assert [w.lower() for w in out[1]["bias_words"]] == ["nebulizer"]

    def test_bias_llm_json(self):
        out = extract_bias_words(self._rows(), llm=lambda p: '["Zovirax"]')
        assert out[0]["bias_words"] == ["Zovirax"]
        out = extract_bias_words(self._rows(), llm=lambda p: "not json")
        assert out[0]["bias_words"] == []

    def test_roundtrip_into_dataset(self, tmp_path):
        """The pipeline's output is directly consumable by PromptWhisperDataset."""
        from whisper_context_biasing_tpu.data import PromptWhisperDataset
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        rows = extract_bias_words(label_descriptions(self._rows()))
        d = tmp_path / "jsonl"
        write_jsonl(rows, str(d / "test.jsonl"))
        ds = PromptWhisperDataset(
            base_path=str(tmp_path), jsonl_data=str(d), phase="test",
            tokenizer=load_tokenizer(), prompt=True,
        )
        assert len(ds) == 3
        seq = ds.build_label_sequence(0)
        assert seq[0] == ds.tokenizer.sop


class TestMultihost:
    def test_single_process_noop(self):
        from whisper_context_biasing_tpu.parallel import (
            host_local_batch_slice, initialize_multihost,
        )

        # single process: auto-detect path returns False (or already-init)
        assert initialize_multihost() in (True, False)
        start, stop = host_local_batch_slice(32)
        assert (start, stop) == (0, 32)

    def test_slice_covers_batch(self):
        from whisper_context_biasing_tpu.parallel import host_local_batch_slice

        start, stop = host_local_batch_slice(8)
        assert stop - start == 8  # single process owns the whole batch


@pytest.mark.slow
class TestMelOnDeviceTraining:
    def test_audio_batch_train_step(self):
        import jax.numpy as jnp
        import numpy as np
        from whisper_context_biasing_tpu.models import init_params, tiny_test_config
        from whisper_context_biasing_tpu.train import (
            init_train_state, make_optimizer, make_train_step,
        )

        # tiny cfg has n_audio_ctx=64 -> the fused mel (3000 frames) doesn't
        # fit; use a cfg with the real audio geometry but tiny dims
        cfg = tiny_test_config(n_audio_ctx=1500)
        params = init_params(cfg, 0)
        rng = np.random.default_rng(0)
        batch = {
            "audio": jnp.asarray((rng.standard_normal((2, 480000)) * 0.1).astype(np.float32)),
            "decoder_input_ids": jnp.asarray([[50257, 5, 6, 7]] * 2, jnp.int32),
            "labels": jnp.asarray([[5, 6, 7, 50256]] * 2, jnp.int32),
        }
        opt = make_optimizer(peak_lr=1e-4, warmup_steps=0, total_steps=5)
        step = make_train_step(cfg, opt, donate=False, mel_on_device=True)
        # fused kernel needs interpret mode on CPU: monkeypatch via flash flags
        import whisper_context_biasing_tpu.ops.mel_kernel as mk
        orig = mk.log_mel_spectrogram_fused
        mk.log_mel_spectrogram_fused = lambda a, n_mels=80: orig(a, n_mels, interpret=True)
        try:
            state, m = step(init_train_state(params, opt), batch)
        finally:
            mk.log_mel_spectrogram_fused = orig
        assert np.isfinite(float(m["loss"]))


class TestFiniteCheckBf16:
    def test_bf16_nan_detected(self):
        """Regression: numpy classifies ml_dtypes bfloat16 as kind 'V', so
        np.issubdtype silently skipped the default compute dtype."""
        import jax.numpy as jnp

        from whisper_context_biasing_tpu.utils.debug import finite_check

        bad = {"x": jnp.asarray([1.0, float("nan")], jnp.bfloat16)}
        with pytest.raises(FloatingPointError, match="x"):
            finite_check(bad, "params")
        finite_check({"x": jnp.asarray([1.0, 2.0], jnp.bfloat16)}, "params")


class TestLoadPretrainedOverrides:
    def test_overrides_apply_to_checkpoint_paths(self, tmp_path):
        from whisper_context_biasing_tpu.models import (
            init_params, load_pretrained, save_safetensors, tiny_test_config,
        )

        cfg = tiny_test_config()
        save_safetensors(init_params(cfg, 0), cfg, str(tmp_path))
        _, loaded = load_pretrained(str(tmp_path / "model.safetensors"),
                                    dtype="float32", quantize_cross_kv=True)
        assert loaded.dtype == "float32"
        assert loaded.quantize_cross_kv is True


class TestFlopsModel:
    """utils/flops.py — the explicit FLOPs model behind the benches' MFU
    lines. Structural checks: linearity in batch/accum/layers, window
    scaling, device-peak resolution."""

    def _cfg(self, **kw):
        from whisper_context_biasing_tpu.models import get_config

        return get_config("base.en", **kw)

    def test_train_step_linear_in_batch_and_accum(self):
        from whisper_context_biasing_tpu.utils.flops import train_step_flops

        cfg = self._cfg()
        one = train_step_flops(cfg, 1, 128, 1)
        assert train_step_flops(cfg, 8, 128, 4) == pytest.approx(32 * one)

    def test_freeze_encoder_drops_encoder_backward(self):
        from whisper_context_biasing_tpu.utils.flops import (
            encoder_flops, train_step_flops,
        )

        cfg = self._cfg()
        full = train_step_flops(cfg, 1, 128, 1)
        frozen = train_step_flops(cfg, 1, 128, 1, freeze_encoder=True)
        assert full - frozen == pytest.approx(2 * encoder_flops(cfg))

    def test_bucketed_window_scales_encoder(self):
        from whisper_context_biasing_tpu.utils.flops import encoder_flops

        cfg = self._cfg()
        # a 10 s window (1000 mel frames) costs well under half the 30 s
        # window (attention is quadratic in T)
        assert encoder_flops(cfg, 1000) < encoder_flops(cfg, 3000) / 2.5

    def test_decode_flops_monotonic_in_tokens(self):
        from whisper_context_biasing_tpu.utils.flops import decode_flops

        cfg = self._cfg()
        f32, f224 = decode_flops(cfg, 32), decode_flops(cfg, 224)
        assert 0 < f32 < f224
        # per-token decode cost is small next to the encoder at base size:
        # 7x the tokens must cost well under 7x the program
        assert f224 < 3 * f32

    def test_train_flops_magnitude_matches_known_estimate(self):
        # base.en b8 x accum4 seq128 ~ 10-12 TFLOPs/step (VERDICT r3's
        # independent estimate was ~11.6; the model must land in that band)
        from whisper_context_biasing_tpu.utils.flops import train_step_flops

        tf = train_step_flops(self._cfg(), 8, 128, 4) / 1e12
        assert 9.0 < tf < 13.0

    def test_device_peak_env_override_and_unknown(self, monkeypatch):
        from whisper_context_biasing_tpu.utils.flops import device_peak_flops

        monkeypatch.setenv("BENCH_PEAK_TFLOPS", "123")
        assert device_peak_flops(object()) == pytest.approx(123e12)
        monkeypatch.delenv("BENCH_PEAK_TFLOPS")

        class Fake:
            device_kind = "TPU v5 lite"

        assert device_peak_flops(Fake()) == pytest.approx(197e12)

        class Cpu:
            device_kind = "cpu"

        assert device_peak_flops(Cpu()) is None
