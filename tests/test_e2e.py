"""End-to-end slice (SURVEY.md §7 step 5-6): synthetic WAV corpus -> dataset
-> collator -> WeightCE fine-tune -> greedy decode eval -> refs_and_pred.txt
artifact -> WER + B-WER, with checkpointing/early-stop plumbing exercised."""

import json
import os
import wave

import numpy as np
import pytest
import jax

from whisper_context_biasing_tpu.audio import log_mel_spectrogram_np
from whisper_context_biasing_tpu.data import PromptWhisperDataset, SpeechSeq2SeqCollator
from whisper_context_biasing_tpu.metrics import compute_bias_wer, parse_refs_and_pred_file
from whisper_context_biasing_tpu.models import init_params, tiny_test_config
from whisper_context_biasing_tpu.tokenizer import load_tokenizer
from whisper_context_biasing_tpu.train import (
    TrainingConfig,
    evaluate_wer,
    list_checkpoints,
    train_and_evaluate,
)

ROWS = [
    {"id": "0", "file": "a0.wav", "text": "take aspirin daily",
     "description": "aspirin for heart", "bias_words": ["aspirin"]},
    {"id": "1", "file": "a1.wav", "text": "promisec treats pressure",
     "description": "promisec for pressure", "bias_words": ["promisec"]},
    {"id": "2", "file": "a2.wav", "text": "use the nebulizer now",
     "description": "nebulizer for asthma", "bias_words": ["nebulizer"]},
    {"id": "3", "file": "a3.wav", "text": "plain words here",
     "description": "plain", "bias_words": []},
]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    jsonl_dir = root / "jsonl"
    jsonl_dir.mkdir()
    rng = np.random.default_rng(0)
    for phase in ("train", "dev", "test"):
        with open(jsonl_dir / f"{phase}.jsonl", "w") as f:
            for r in ROWS:
                f.write(json.dumps(r) + "\n")
        d = root / "audio" / phase
        d.mkdir(parents=True, exist_ok=True)
        for r in ROWS:
            sig = (rng.standard_normal(16000) * 3000).astype(np.int16)
            with wave.open(str(d / r["file"]), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(sig.tobytes())
    return {"base": str(root / "audio"), "jsonl": str(jsonl_dir)}


def _short_mel(audio):
    # tiny model: n_audio_ctx=64 -> 128 mel frames
    return log_mel_spectrogram_np(audio)[:, :128]


def _make_ds(corpus, tok, phase, **kw):
    return PromptWhisperDataset(
        base_path=corpus["base"], jsonl_data=corpus["jsonl"], phase=phase,
        tokenizer=tok, feature_extractor=_short_mel, **kw,
    )


@pytest.mark.slow
class TestEndToEnd:
    def test_full_pipeline(self, corpus, tmp_path):
        tok = load_tokenizer()
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        collator = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id,
            decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop,
            pad_to_multiple=16,
        )
        train_ds = _make_ds(corpus, tok, "train", prompt=True)
        dev_ds = _make_ds(corpus, tok, "dev", prompt=True)
        out = str(tmp_path / "out")

        tcfg = TrainingConfig(
            output_dir=out,
            per_device_train_batch_size=2,
            per_device_eval_batch_size=2,
            gradient_accumulation_steps=2,
            learning_rate=1e-4,
            num_train_epochs=4,
            warmup_steps=1,
            eval_steps=2,
            save_steps=2,
            logging_steps=1,
            early_stopping_patience=50,
            generation_max_length=8,
        )
        params_out, log_history = train_and_evaluate(
            cfg, params, tok, train_ds, dev_ds, collator, tcfg
        )

        assert any("loss" in e for e in log_history)
        assert any("eval_wer" in e for e in log_history)
        assert list_checkpoints(out)
        assert os.path.isfile(os.path.join(out, "refs_and_pred.txt"))

        # artifact is parseable and row-aligned with the eval set
        refs, preds = parse_refs_and_pred_file(os.path.join(out, "refs_and_pred.txt"))
        assert len(refs) == len(dev_ds)
        # refs decode back to the (normalized) transcripts, prompt-free
        assert "aspirin" in " ".join(refs)
        assert not any("<|" in r for r in refs)

        # final test-set eval + B-WER from the artifact
        test_ds = _make_ds(corpus, tok, "test")
        rp = str(tmp_path / "rp.txt")
        result = evaluate_wer(params_out, cfg, tok, test_ds, collator, 2, 8,
                              refs_pred_file=rp)
        assert "wer" in result and np.isfinite(result["wer"])
        bias = compute_bias_wer(rp, test_ds.all_bias_spans(), tok)
        assert "bias_wer" in bias

    def test_prompted_eval_compiles_few_programs(self, corpus, tmp_path):
        """VERDICT r1 weak#5: a prompted+biased eval pass must reuse a
        handful of decode programs (bucketed prefixes, padded final batch,
        bucketed span dims) instead of recompiling per batch shape."""
        from whisper_context_biasing_tpu.decode.greedy import greedy_decode

        tok = load_tokenizer()
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        collator = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop, pad_to_multiple=16,
        )
        test_ds = _make_ds(corpus, tok, "test", prompt=True)
        before = greedy_decode.cache_size()
        # batch 3 over 4 rows -> one full + one padded partial batch
        result = evaluate_wer(params, cfg, tok, test_ds, collator, 3, 8,
                              prompt_generation=True, bias_boost=0.5)
        assert "wer" in result
        assert greedy_decode.cache_size() - before <= 2

    def test_resume(self, corpus, tmp_path):
        tok = load_tokenizer()
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        collator = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop, pad_to_multiple=16,
        )
        train_ds = _make_ds(corpus, tok, "train")
        dev_ds = _make_ds(corpus, tok, "dev")
        out = str(tmp_path / "resume")
        tcfg = TrainingConfig(
            output_dir=out, per_device_train_batch_size=2,
            per_device_eval_batch_size=2, gradient_accumulation_steps=1,
            num_train_epochs=1, eval_steps=2, save_steps=2, logging_steps=1,
            warmup_steps=0, generation_max_length=6, early_stopping_patience=50,
            load_best_model_at_end=False,
        )
        train_and_evaluate(cfg, params, tok, train_ds, dev_ds, collator, tcfg)
        first = {os.path.basename(c) for c in list_checkpoints(out)}
        assert first
        # resume continues past the previous step count
        tcfg2 = TrainingConfig(**{**tcfg.__dict__, "num_train_epochs": 2})
        _, hist = train_and_evaluate(
            cfg, params, tok, train_ds, dev_ds, collator, tcfg2, resume=True
        )
        assert max(e["step"] for e in hist) > max(
            int(c.split("-")[1]) for c in first
        ) - 1

    def test_evaluate_wer_medusa_matches_plain(self, corpus, tmp_path):
        """evaluate_wer(medusa=...) writes identical predictions and WER —
        the self-speculative eval path is output-invariant."""
        from whisper_context_biasing_tpu.models import init_medusa_params
        from whisper_context_biasing_tpu.train import evaluate_wer

        tok = load_tokenizer()
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        collator = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop, pad_to_multiple=16,
        )
        ds = _make_ds(corpus, tok, "test")
        f1 = str(tmp_path / "plain.txt")
        f2 = str(tmp_path / "medusa.txt")
        r1 = evaluate_wer(params, cfg, tok, ds, collator, 2, 6,
                          refs_pred_file=f1)
        r2 = evaluate_wer(params, cfg, tok, ds, collator, 2, 6,
                          refs_pred_file=f2,
                          medusa=init_medusa_params(cfg, 2, 0))
        assert r1 == r2
        assert open(f1).read() == open(f2).read()

    def test_lora_training_end_to_end(self, corpus, tmp_path):
        """lora_rank>0: the loop trains adapters, checkpoints hold the tiny
        adapter tree, and the returned params are merged dense weights with
        the base shapes (consumable by eval/export/serving unchanged)."""
        tok = load_tokenizer()
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        full_shapes = [a.shape for a in jax.tree.leaves(params)]
        n_full = sum(int(a.size) for a in jax.tree.leaves(params))
        collator = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop, pad_to_multiple=16,
        )
        train_ds = _make_ds(corpus, tok, "train")
        dev_ds = _make_ds(corpus, tok, "dev")
        out = str(tmp_path / "lora")
        tcfg = TrainingConfig(
            output_dir=out, per_device_train_batch_size=2,
            per_device_eval_batch_size=2, gradient_accumulation_steps=1,
            num_train_epochs=1, eval_steps=2, save_steps=2, logging_steps=1,
            warmup_steps=0, generation_max_length=6,
            early_stopping_patience=50, load_best_model_at_end=False,
            lora_rank=2, learning_rate=1e-3,
        )
        final, hist = train_and_evaluate(
            cfg, params, tok, train_ds, dev_ds, collator, tcfg)
        # merged dense output: same leaf shapes as the base params
        assert [a.shape for a in jax.tree.leaves(final)] == full_shapes
        # checkpoints hold the small adapter tree, stamped with the config
        import json as _json

        ckpts = list_checkpoints(out)
        assert ckpts
        with np.load(os.path.join(ckpts[0], "params.npz")) as z:
            n_adapter = sum(int(np.prod(z[k].shape)) for k in z.files)
        assert n_adapter < n_full / 20
        with open(os.path.join(ckpts[0], "trainer_state.json")) as f:
            meta = _json.load(f)
        assert meta["lora_rank"] == 2
        assert any("eval_wer" in h for h in hist)

    def test_resume_orbax_backend(self, corpus, tmp_path):
        """checkpoint_backend='orbax' writes tensorstore checkpoints the
        loop can resume from (incl. optimizer state), interchangeably with
        the npz loaders."""
        tok = load_tokenizer()
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        collator = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop, pad_to_multiple=16,
        )
        train_ds = _make_ds(corpus, tok, "train")
        dev_ds = _make_ds(corpus, tok, "dev")
        out = str(tmp_path / "resume_ocp")
        tcfg = TrainingConfig(
            output_dir=out, per_device_train_batch_size=2,
            per_device_eval_batch_size=2, gradient_accumulation_steps=1,
            num_train_epochs=1, eval_steps=2, save_steps=2, logging_steps=1,
            warmup_steps=0, generation_max_length=6, early_stopping_patience=50,
            load_best_model_at_end=False, checkpoint_backend="orbax",
        )
        train_and_evaluate(cfg, params, tok, train_ds, dev_ds, collator, tcfg)
        ckpts = list_checkpoints(out)
        assert ckpts
        assert all(os.path.isdir(os.path.join(c, "params_ocp")) for c in ckpts)
        assert not any(os.path.isfile(os.path.join(c, "params.npz"))
                       for c in ckpts)
        tcfg2 = TrainingConfig(**{**tcfg.__dict__, "num_train_epochs": 2})
        _, hist = train_and_evaluate(
            cfg, params, tok, train_ds, dev_ds, collator, tcfg2, resume=True
        )
        assert max(e["step"] for e in hist) > 0
