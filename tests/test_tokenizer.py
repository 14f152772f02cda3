"""Tokenizer layout + roundtrip tests.

Pins the Whisper .en special-token id layout the reference depends on
(scripts/check_WeightCE.py:9, data_utils/data_collator.py:100,119)."""

import pytest

from whisper_context_biasing_tpu.tokenizer import (
    ByteLevelBPE,
    WhisperTokenizer,
    load_tokenizer,
)


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer()  # .en byte-fallback


class TestSpecialLayoutEn:
    def test_canonical_ids(self, tok):
        assert tok.convert_tokens_to_ids("<|endoftext|>") == 50256
        assert tok.convert_tokens_to_ids("<|startoftranscript|>") == 50257
        assert tok.convert_tokens_to_ids("<|en|>") == 50258
        assert tok.convert_tokens_to_ids("<|translate|>") == 50357
        assert tok.convert_tokens_to_ids("<|transcribe|>") == 50358
        assert tok.convert_tokens_to_ids("<|startoflm|>") == 50359
        assert tok.convert_tokens_to_ids("<|startofprev|>") == 50360
        assert tok.convert_tokens_to_ids("<|nospeech|>") == 50361
        assert tok.convert_tokens_to_ids("<|notimestamps|>") == 50362
        assert tok.timestamp_begin == 50363
        assert tok.vocab_size == 51864

    def test_check_weightce_special_set_is_special(self, tok):
        # the set named in reference scripts/check_WeightCE.py:9
        for tid in (50256, 50257, 50258, 50358, 50362):
            assert tok.is_special(tid)

    def test_pad_and_eos(self, tok):
        assert tok.pad_token_id == 50256
        assert tok.eos_token_id == 50256

    def test_prefix_en(self, tok):
        assert tok.prefix_tokens == [50257, 50362]


class TestSpecialLayoutMultilingual:
    def test_multilingual_ids(self):
        t = load_tokenizer(multilingual=True)
        assert t.convert_tokens_to_ids("<|endoftext|>") == 50257
        assert t.convert_tokens_to_ids("<|startoftranscript|>") == 50258
        assert t.convert_tokens_to_ids("<|en|>") == 50259
        assert t.convert_tokens_to_ids("<|notimestamps|>") == 50363
        assert t.vocab_size == 51865

    def test_large_v3_layout(self):
        t = load_tokenizer(multilingual=True, num_languages=100)
        assert t.vocab_size == 51866
        assert t.convert_tokens_to_ids("<|notimestamps|>") == 50364

    def test_multilingual_prefix(self):
        t = load_tokenizer(multilingual=True, language="en", task="transcribe")
        assert t.prefix_tokens == [50258, 50259, 50359, 50363]


class TestEncodingRoundtrip:
    @pytest.mark.parametrize(
        "text",
        [
            "hello world",
            "rekool-l tab, which contains rabeprazole, helps alleviate symptoms.",
            " leading space",
            "unicode: naïve café — ≥5 µg",
            "",
        ],
    )
    def test_roundtrip_without_specials(self, tok, text):
        ids = tok.encode(text, add_special_tokens=False)
        assert tok.decode(ids) == text

    def test_encode_with_specials_shape(self, tok):
        ids = tok.encode("take aspirin")
        assert ids[:2] == [50257, 50362]
        assert ids[-1] == 50256
        assert tok.decode(ids, skip_special_tokens=True) == "take aspirin"

    def test_decode_skips_negative_fill(self, tok):
        ids = [-100, -100] + tok.encode("ok", add_special_tokens=False)
        assert tok.decode(ids, skip_special_tokens=True) == "ok"

    def test_special_token_rendering(self, tok):
        ids = [50360] + tok.encode("ctx", add_special_tokens=False) + [50257]
        s = tok.decode(ids, skip_special_tokens=False)
        assert s == "<|startofprev|>ctx<|startoftranscript|>"

    def test_byte_fallback_ids_are_bytes(self):
        bpe = ByteLevelBPE.byte_fallback()
        assert bpe.encode("ab") == [97, 98]
        assert bpe.decode([104, 105]) == "hi"

    def test_timestamp_tokens(self, tok):
        assert tok.convert_tokens_to_ids("<|0.00|>") == 50363
        assert tok.convert_tokens_to_ids("<|30.00|>") == 51863


class TestBPEWithMerges:
    def test_merge_application(self):
        # tiny vocab: bytes + one merged token "he"
        from whisper_context_biasing_tpu.tokenizer.bpe import bytes_to_unicode

        b2u = bytes_to_unicode()
        encoder = {b2u[b]: b for b in range(256)}
        encoder[b2u[ord("h")] + b2u[ord("e")]] = 256
        bpe = ByteLevelBPE(encoder, [(b2u[ord("h")], b2u[ord("e")])])
        assert bpe.encode("he") == [256]
        assert bpe.encode("hel") == [256, ord("l")]
        assert bpe.decode([256, ord("l")]) == "hel"

    def test_merge_priority(self):
        from whisper_context_biasing_tpu.tokenizer.bpe import bytes_to_unicode

        b2u = bytes_to_unicode()
        encoder = {b2u[b]: b for b in range(256)}
        ab = b2u[ord("a")] + b2u[ord("b")]
        bc = b2u[ord("b")] + b2u[ord("c")]
        encoder[ab] = 256
        encoder[bc] = 257
        # "ab" merge ranks higher than "bc": "abc" -> [ab, c]
        bpe = ByteLevelBPE(encoder, [(b2u[ord("a")], b2u[ord("b")]), (b2u[ord("b")], b2u[ord("c")])])
        assert bpe.encode("abc") == [256, ord("c")]


class TestVocabFiles:
    def _tiny_vocab(self):
        from whisper_context_biasing_tpu.tokenizer.bpe import bytes_to_unicode

        b2u = bytes_to_unicode()
        vocab = {b2u[b]: b for b in range(256)}
        he = b2u[ord("h")] + b2u[ord("e")]
        vocab[he] = 256
        merges = [(b2u[ord("h")], b2u[ord("e")])]
        return vocab, merges

    def test_from_files(self, tmp_path):
        import json

        vocab, merges = self._tiny_vocab()
        vp = tmp_path / "vocab.json"
        mp = tmp_path / "merges.txt"
        vp.write_text(json.dumps(vocab))
        mp.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
        bpe = ByteLevelBPE.from_files(str(vp), str(mp))
        assert bpe.encode("he") == [256]

    def test_from_tokenizer_json(self, tmp_path):
        import json

        vocab, merges = self._tiny_vocab()
        tj = tmp_path / "tokenizer.json"
        tj.write_text(json.dumps({
            "model": {"type": "BPE", "vocab": vocab,
                      "merges": [f"{a} {b}" for a, b in merges]}
        }))
        bpe = ByteLevelBPE.from_tokenizer_json(str(tj))
        assert bpe.encode("he") == [256]
        assert bpe.decode([256]) == "he"

    def test_load_tokenizer_with_tokenizer_json(self, tmp_path):
        import json

        vocab, merges = self._tiny_vocab()
        tj = tmp_path / "tokenizer.json"
        tj.write_text(json.dumps({
            "model": {"type": "BPE", "vocab": vocab,
                      "merges": [list(m) for m in merges]}
        }))
        t = load_tokenizer(str(tj))
        assert t.convert_tokens_to_ids("<|startoftranscript|>") == 50257
        assert t.encode("he", add_special_tokens=False) == [256]


class TestTimestampSegments:
    def test_segments(self, tok):
        ts = tok.timestamp_begin
        text1 = tok.encode("hello there", add_special_tokens=False)
        text2 = tok.encode("next part", add_special_tokens=False)
        ids = [50257, ts + 0] + text1 + [ts + 50, ts + 50] + text2 + [ts + 100, 50256]
        segs = tok.split_timestamp_segments(ids)
        assert len(segs) == 2
        (s0, e0, t0), (s1, e1, t1) = segs
        assert (s0, e0, t0) == (0.0, 1.0, "hello there")
        assert (s1, e1, t1) == (1.0, 2.0, "next part")

    def test_timestamp_value(self, tok):
        assert tok.timestamp_value(tok.timestamp_begin) == 0.0
        assert tok.timestamp_value(tok.timestamp_begin + 1500) == pytest.approx(30.0)
        assert tok.timestamp_value(100) is None

    def test_unterminated_segment(self, tok):
        ts = tok.timestamp_begin
        ids = [ts + 10] + tok.encode("tail", add_special_tokens=False)
        segs = tok.split_timestamp_segments(ids)
        assert segs == [(0.2, None, "tail")]
