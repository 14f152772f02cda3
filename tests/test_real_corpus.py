"""Contract tests against the REAL reference corpus (tokenizer-only paths —
the mirror has no audio): jsonl schema, pools, all four prompt strategies,
span collection, collation, and the data-prep lexicon on the committed
NER file."""

import os

import numpy as np
import pytest

from whisper_context_biasing_tpu.data import PromptWhisperDataset, SpeechSeq2SeqCollator
from whisper_context_biasing_tpu.data.prepare import lexicon_from_labeled
from whisper_context_biasing_tpu.tokenizer import load_tokenizer
from conftest import REFERENCE_ROOT, requires_reference

pytestmark = requires_reference

JSONL = os.path.join(REFERENCE_ROOT, "data/medical-united-syn-med-test-jsonl")


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer()


def make_ds(tok, **kw):
    return PromptWhisperDataset(
        base_path="/nonexistent-audio", jsonl_data=JSONL, phase="test",
        tokenizer=tok, **kw,
    )


class TestRealCorpus:
    def test_row_count_and_pools(self, tok):
        ds = make_ds(tok)
        assert len(ds) == 339
        assert "ostovit" in ds.bias_pool
        assert "promisec" in ds.bias_pool
        assert len(ds.prompt_pool) == 339
        assert len(ds.non_bias_pool) > 100

    @pytest.mark.parametrize("kw", [
        dict(prompt=True),
        dict(bias_list=True, bias_nums=10),
        dict(prompt=True, bias_list=True, bias_nums=10),
        dict(prompt=True, bias_list=True, bias_nums=10, bias_desc=True),
    ])
    def test_all_strategies_over_corpus(self, tok, kw):
        ds = make_ds(tok, **kw)
        for i in range(0, len(ds), 37):
            seq = ds.build_label_sequence(i)
            assert seq[0] == tok.sop
            assert tok.sot in seq and seq[-1] == tok.eot
            text = ds.data[i][3]
            sot_at = seq.index(tok.sot)
            assert seq[sot_at:] == tok.encode(text.lower())

    def test_spans_roundtrip(self, tok):
        ds = make_ds(tok)
        spans = ds.all_bias_spans()
        assert len(spans) == 339
        for i in (0, 1, 100):
            words = [w.lower() for w in ds.data[i][4]]
            decoded = [tok.decode(s) for s in spans[i]]
            assert decoded == words

    def test_collation_over_real_labels(self, tok):
        ds = make_ds(tok, prompt=True)
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop,
        )
        items = [
            {"labels": np.asarray(ds.build_label_sequence(i), np.int32),
             "bias_spans": ds.get_bias_spans(i)}
            for i in range(6)
        ]
        batch = coll(items)
        assert batch["labels"].shape == batch["decoder_input_ids"].shape
        # every row's prompt region is masked, transcript intact
        for i in range(6):
            row = batch["labels"][i]
            valid = row[row != -100]
            decoded = tok.decode(valid.tolist(), skip_special_tokens=True)
            assert decoded == ds.data[i][3].lower()

    def test_lexicon_from_committed_ner_file(self):
        lex = lexicon_from_labeled(
            os.path.join(REFERENCE_ROOT, "data/bias_words_labeled.jsonl")
        )
        assert len(lex) > 100
        assert all(w == w.lower() for w in list(lex)[:20])
