"""Data layer tests — replicate the reference's inspection harnesses as
assertions (check_data_loader.py / check_data_collator.py golden semantics)."""

import json
import os
import wave

import numpy as np
import pytest

from whisper_context_biasing_tpu.data import (
    BIAS_SPAN_PAD_ID,
    IGNORE_INDEX,
    PromptWhisperDataset,
    SpeechSeq2SeqCollator,
)
from whisper_context_biasing_tpu.tokenizer import load_tokenizer

ROWS = [
    {"id": "0", "file": "a0.wav", "text": "Take aspirin daily for heart health.",
     "description": "Aspirin is used for cardiovascular protection.",
     "bias_words": ["aspirin"]},
    {"id": "1", "file": "a1.wav", "text": "Promisec treats high blood pressure.",
     "description": "Promisec is a common blood pressure medication.",
     "bias_words": ["Promisec"]},
    {"id": "2", "file": "a2.wav", "text": "Use the nebulizer with salbutamol sulfate.",
     "description": "A nebulizer delivers salbutamol for asthma.",
     "bias_words": ["nebulizer", "salbutamol sulfate"]},
    {"id": "3", "file": "a3.wav", "text": "No special words here.",
     "description": "Plain sentence.",
     "bias_words": []},
]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    jsonl_dir = root / "jsonl"
    audio_dir = root / "audio" / "test"
    jsonl_dir.mkdir()
    audio_dir.mkdir(parents=True)
    with open(jsonl_dir / "test.jsonl", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    # train split = same rows (to exercise the 5% perturbation path)
    with open(jsonl_dir / "train.jsonl", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    rng = np.random.default_rng(0)
    for r in ROWS:
        sig = (rng.standard_normal(16000) * 3000).astype(np.int16)
        for phase in ("test", "train"):
            d = root / "audio" / phase
            d.mkdir(exist_ok=True)
            with wave.open(str(d / r["file"]), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(sig.tobytes())
    return {"base": str(root / "audio"), "jsonl": str(jsonl_dir)}


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer()


def make_ds(corpus, tok, phase="test", **kw):
    return PromptWhisperDataset(
        base_path=corpus["base"], jsonl_data=corpus["jsonl"], phase=phase,
        tokenizer=tok, **kw,
    )


class TestPools:
    def test_pools(self, corpus, tok):
        ds = make_ds(corpus, tok)
        assert ds.bias_pool == {"aspirin", "promisec", "nebulizer", "salbutamol sulfate"}
        assert "daily" in ds.non_bias_pool
        # punctuation stripped from non-bias words
        assert "health" in ds.non_bias_pool and "health." not in ds.non_bias_pool
        assert len(ds.prompt_pool) == 4
        assert len(ds) == 4


class TestBiasSpans:
    def test_spans_lowercased_no_specials(self, corpus, tok):
        ds = make_ds(corpus, tok)
        spans = ds.get_bias_spans(1)
        assert spans == [tok.encode("promisec", add_special_tokens=False)]

    def test_no_audio_needed(self, corpus, tok):
        ds = make_ds(corpus, tok)
        ds.base_path = "/nonexistent"  # spans must not touch audio
        assert ds.all_bias_spans()[0]


class TestPromptStrategies:
    def _split(self, tok, seq):
        """context (after sop, before sot) and transcript (sot..) parts."""
        assert seq[0] == tok.sop
        sot_at = seq.index(tok.sot)
        return seq[1:sot_at], seq[sot_at:]

    def test_no_prompt(self, corpus, tok):
        ds = make_ds(corpus, tok)
        seq = ds.build_label_sequence(0)
        assert seq == tok.encode(ROWS[0]["text"].lower())
        assert seq[0] == tok.sot and seq[-1] == tok.eot

    def test_strategy1_desc_only(self, corpus, tok):
        ds = make_ds(corpus, tok, prompt=True)
        seq = ds.build_label_sequence(0)
        ctx, transcript = self._split(tok, seq)
        assert ctx == tok.encode(ROWS[0]["description"].lower(), add_special_tokens=False)
        assert transcript == tok.encode(ROWS[0]["text"].lower())

    def test_strategy1_truncation_190(self, corpus, tok):
        ds = make_ds(corpus, tok, prompt=True)
        ds.data[0][1] = "word " * 400  # very long description
        ctx, _ = self._split(tok, ds.build_label_sequence(0))
        assert len(ctx) == 190

    def test_strategy2_bias_list(self, corpus, tok):
        ds = make_ds(corpus, tok, bias_list=True, bias_nums=3)
        seq = ds.build_label_sequence(0)
        ctx, transcript = self._split(tok, seq)
        words = tok.decode(ctx).split()
        assert len(words) >= 3  # multiword pool entries split on spaces
        assert "aspirin" in words  # own bias word always included first
        assert tok.decode(ctx).startswith("aspirin")
        assert transcript == tok.encode(ROWS[0]["text"].lower())

    def test_strategy2_fill_from_pool(self, corpus, tok):
        ds = make_ds(corpus, tok, bias_list=True, bias_nums=4)
        ctx, _ = self._split(tok, ds.build_label_sequence(3))  # sample with no bias words
        text = tok.decode(ctx)
        pool_hits = [w for w in ds.bias_pool if w in text]
        assert len(pool_hits) >= 2

    def test_strategy3_desc_then_relate(self, corpus, tok):
        ds = make_ds(corpus, tok, prompt=True, bias_list=True, bias_nums=2)
        ctx, _ = self._split(tok, ds.build_label_sequence(1))
        text = tok.decode(ctx)
        assert "Relate terms: " in text
        desc_part = text.split("Relate terms: ")[0]
        assert desc_part == ROWS[1]["description"].lower()
        bias_part = text.split("Relate terms: ")[1]
        assert "promisec" in bias_part

    def test_strategy3_truncation_150(self, corpus, tok):
        ds = make_ds(corpus, tok, prompt=True, bias_list=True, bias_nums=2)
        ds.data[0][1] = "word " * 400
        ctx, _ = self._split(tok, ds.build_label_sequence(0))
        relate = tok.encode("Relate terms: ", add_special_tokens=False)
        # first 150 tokens are the truncated description, then the marker
        for k in range(len(ctx) - len(relate) + 1):
            if ctx[k : k + len(relate)] == relate:
                break
        assert k == 150

    def test_strategy4_reversed(self, corpus, tok):
        ds = make_ds(corpus, tok, prompt=True, bias_list=True, bias_nums=2, bias_desc=True)
        ctx, _ = self._split(tok, ds.build_label_sequence(1))
        text = tok.decode(ctx)
        assert text.startswith("Relate terms: ")
        assert text.endswith(ROWS[1]["description"].lower())

    def test_perturbation_train_only(self, corpus, tok):
        # with random=True in a train phase, ~5% of draws use a random
        # prompt; draws are keyed on (seed, epoch_hint, idx) — deterministic
        # under threaded loading, fresh per epoch (BatchLoader bumps the hint)
        ds = make_ds(corpus, tok, phase="train", prompt=True, random=True, seed=123)
        ds.data[0][2] = "a clearly different random prompt"  # ensure distinguishable
        own = tok.encode(ROWS[0]["description"].lower(), add_special_tokens=False)
        swapped = 0
        for epoch in range(400):
            ds.epoch_hint = epoch
            ctx, _ = self._split(tok, ds.build_label_sequence(0))
            if ctx != own:
                swapped += 1
        assert 2 <= swapped <= 60  # ~5% of 400 = 20
        # same (seed, epoch, idx) -> identical draw, any thread order
        ds.epoch_hint = 7
        a = ds.build_label_sequence(0)
        b = ds.build_label_sequence(0)
        assert a == b

    def test_no_perturbation_in_test_phase(self, corpus, tok):
        ds = make_ds(corpus, tok, phase="test", prompt=True, random=True, seed=123)
        own = tok.encode(ROWS[0]["description"].lower(), add_special_tokens=False)
        for _ in range(50):
            ctx, _ = self._split(tok, ds.build_label_sequence(0))
            assert ctx == own

    def test_empty_pool_raises(self, corpus, tok, tmp_path):
        jd = tmp_path / "jsonl"
        jd.mkdir()
        with open(jd / "test.jsonl", "w") as f:
            f.write(json.dumps({"id": "0", "file": "x.wav", "text": "hi", "description": "d",
                                "bias_words": []}) + "\n")
        ds = PromptWhisperDataset(base_path=str(tmp_path), jsonl_data=str(jd),
                                  phase="test", tokenizer=tok, bias_list=True, bias_nums=2)
        with pytest.raises(ValueError, match="bias_pool is empty"):
            ds.build_label_sequence(0)


class TestGetItem:
    def test_item_contract(self, corpus, tok):
        ds = make_ds(corpus, tok, prompt=True)
        item = ds[0]
        assert item["input_features"].shape == (80, 3000)
        assert item["input_features"].dtype == np.float32
        assert item["labels"].dtype == np.int32
        assert item["bias_spans"] == ds.get_bias_spans(0)

    def test_return_audio(self, corpus, tok):
        ds = make_ds(corpus, tok, return_audio=True)
        item = ds[0]
        assert "audio" in item and item["audio"].shape == (16000,)

    def test_speed_perturb_train_only_and_deterministic(self, corpus, tok):
        """Speed factors stretch the raw audio (train phase only); the draw
        is deterministic per (seed, epoch, idx) and re-drawn across epochs;
        factor 1.0 is the identity."""
        kw = dict(return_audio=True, speed_perturb=(0.5, 2.0))
        tr = make_ds(corpus, tok, phase="train", **kw)
        lens = {len(tr[i]["audio"]) for i in range(len(tr))}
        # 0.5x -> ~32000 samples, 2.0x -> ~8000; never the raw 16000
        assert lens <= {32000, 8000}
        again = make_ds(corpus, tok, phase="train", **kw)
        assert [len(again[i]["audio"]) for i in range(len(again))] == [
            len(tr[i]["audio"]) for i in range(len(tr))]
        tr.epoch_hint = 1  # new epoch may re-draw (streams differ)
        assert all(len(tr[i]["audio"]) in (32000, 8000) for i in range(len(tr)))
        # eval phases never perturb
        ev = make_ds(corpus, tok, phase="test", **kw)
        assert all(len(ev[i]["audio"]) == 16000 for i in range(len(ev)))
        # identity factor is a no-op
        one = make_ds(corpus, tok, phase="train", return_audio=True,
                      speed_perturb=(1.0,))
        assert all(len(one[i]["audio"]) == 16000 for i in range(len(one)))

    def test_n_mels_large_v3(self, corpus, tok):
        """Regression: large-v3 expects 128-mel features; the CLIs pass
        cfg.n_mels through so the default extractor matches the model."""
        ds = make_ds(corpus, tok, n_mels=128)
        assert ds[0]["input_features"].shape == (128, 3000)


class TestCollator:
    def _items(self, corpus, tok, **kw):
        ds = make_ds(corpus, tok, **kw)
        return ds, [ds[i] for i in range(len(ds))]

    def test_shift_and_mask(self, corpus, tok):
        ds, items = self._items(corpus, tok, prompt=True)
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id,
            decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop,
        )
        batch = coll(items)
        B = len(items)
        assert batch["input_features"].shape == (B, 80, 3000)
        labels, dec = batch["labels"], batch["decoder_input_ids"]
        assert labels.shape == dec.shape

        for i in range(B):
            seq = ds.build_label_sequence(i)
            # teacher forcing: dec[t] = seq[t], labels[t] = seq[t+1]
            assert list(dec[i][: len(seq) - 1]) == seq[:-1]
            sot_pos = seq.index(tok.sot)
            # prompt tokens (before sot in the shifted labels) masked
            assert (labels[i][: sot_pos - 1] == IGNORE_INDEX).all()
            assert labels[i][sot_pos - 1] == tok.sot
            # transcript portion intact
            assert list(labels[i][sot_pos - 1 : len(seq) - 1]) == seq[sot_pos:]
            # padding masked
            assert (labels[i][len(seq) - 1 :] == IGNORE_INDEX).all()

    def test_no_sot_row_unmasked_quirk(self, tok):
        # a row without SOT: argmax returns 0 -> nothing masked (reference quirk)
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop,
        )
        ids = tok.encode("hello", add_special_tokens=False)
        batch = coll([{"labels": np.asarray(ids + ids, np.int32), "bias_spans": []}])
        assert (batch["labels"] != IGNORE_INDEX).all()

    def test_bias_span_padding(self, corpus, tok):
        ds, items = self._items(corpus, tok)
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop,
        )
        batch = coll(items)
        spans = batch["bias_spans"]
        B = len(items)
        max_n = max(len(it["bias_spans"]) for it in items)
        max_k = max(len(s) for it in items for s in it["bias_spans"])
        assert spans.shape == (B, max_n, max_k)
        # sample 3 has no spans -> fully padded row
        assert (spans[3] == BIAS_SPAN_PAD_ID).all()
        # sample 1's single span is intact
        s1 = items[1]["bias_spans"][0]
        assert list(spans[1, 0, : len(s1)]) == s1
        assert (spans[1, 0, len(s1) :] == BIAS_SPAN_PAD_ID).all()

    def test_all_empty_fallback_zeros(self, tok):
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop,
        )
        batch = coll([
            {"labels": np.asarray(tok.encode("a"), np.int32), "bias_spans": []},
            {"labels": np.asarray(tok.encode("b"), np.int32), "bias_spans": []},
        ])
        assert batch["bias_spans"].shape == (2, 1, 1)
        assert (batch["bias_spans"] == 0).all()

    def test_static_shapes(self, corpus, tok):
        ds, items = self._items(corpus, tok)
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop,
            max_target_length=64, max_spans=(8, 32),
        )
        batch = coll(items)
        assert batch["labels"].shape == (len(items), 63)
        assert batch["bias_spans"].shape == (len(items), 8, 32)

    def test_pad_to_multiple(self, corpus, tok):
        ds, items = self._items(corpus, tok)
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop, pad_to_multiple=32,
        )
        batch = coll(items)
        assert (batch["labels"].shape[1] + 1) % 32 == 0
