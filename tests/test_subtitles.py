"""Subtitle formatting (SRT/VTT) and absolute-time long-form segments."""

import numpy as np
import pytest

from whisper_context_biasing_tpu.decode.word_timestamps import WordTiming
from whisper_context_biasing_tpu.utils.subtitles import (
    close_open_segments,
    format_srt,
    format_vtt,
    words_to_segments,
)


class TestFormats:
    def test_srt(self):
        out = format_srt([(0.0, 1.5, " hello"), (62.25, 3723.004, "world")])
        lines = out.split("\n")
        assert lines[0] == "1"
        assert lines[1] == "00:00:00,000 --> 00:00:01,500"
        assert lines[2] == "hello"
        assert lines[3] == ""
        assert lines[4] == "2"
        assert lines[5] == "00:01:02,250 --> 01:02:03,004"

    def test_vtt(self):
        out = format_vtt([(0.5, 2.0, "hi")])
        lines = out.split("\n")
        assert lines[0] == "WEBVTT"
        assert lines[2] == "00:00:00.500 --> 00:00:02.000"
        assert lines[3] == "hi"

    def test_negative_time_clamped(self):
        assert "00:00:00,000" in format_srt([(-0.5, 1.0, "x")])


class TestWordsToSegments:
    def test_gap_splits(self):
        words = [WordTiming("a", 0.0, 0.5, [1]),
                 WordTiming("b", 0.6, 1.0, [2]),
                 WordTiming("c", 5.0, 5.5, [3])]  # 4 s gap
        segs = words_to_segments(words, max_gap=1.0)
        assert len(segs) == 2
        assert segs[0] == (0.0, 1.0, "a b")
        assert segs[1] == (5.0, 5.5, "c")

    def test_max_words_splits(self):
        words = [WordTiming(f"w{i}", i * 0.1, i * 0.1 + 0.05, [i])
                 for i in range(5)]
        segs = words_to_segments(words, max_words=2, max_gap=10, max_duration=10)
        assert [len(s[2].split()) for s in segs] == [2, 2, 1]

    def test_max_duration_splits(self):
        words = [WordTiming(f"w{i}", i * 2.0, i * 2.0 + 1.0, [i])
                 for i in range(4)]
        segs = words_to_segments(words, max_words=100, max_gap=10, max_duration=3.0)
        assert len(segs) > 1

    def test_empty(self):
        assert words_to_segments([]) == []


class TestCloseOpenSegments:
    def test_none_end_uses_next_start(self):
        segs = close_open_segments([(0.0, None, "a"), (4.0, 5.0, "b")])
        assert segs[0] == (0.0, 4.0, "a")

    def test_trailing_none_uses_fallback_clamped(self):
        segs = close_open_segments([(9.0, None, "a")],
                                   fallback_duration=2.0, clip_end=10.0)
        assert segs[0] == (9.0, 10.0, "a")


@pytest.mark.slow
class TestLongFormSegments:
    def test_absolute_offsets_across_windows(self):
        """Segments from the second 30 s window must be offset by the seek
        position, not restart at zero."""
        from whisper_context_biasing_tpu.decode.long_form import (
            transcribe_long_batch,
        )
        from whisper_context_biasing_tpu.decode.greedy import GreedyResult
        from whisper_context_biasing_tpu.models import tiny_test_config
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        tok = load_tokenizer()
        cfg = tiny_test_config()
        word = tok.encode(" hello", add_special_tokens=False)
        ts0 = tok.timestamp_begin  # <|0.00|>
        ts_end = tok.timestamp_begin + 1500  # <|30.00|> closes the segment

        def decode_fn(mel, ids, mask, temperature, key):
            b = mel.shape[0]
            row = [ts0] + word + [ts_end, tok.eot]
            toks = np.tile(np.asarray(row, np.int32), (b, 1))
            return GreedyResult(
                tokens=toks, lengths=np.full((b,), len(row) - 1, np.int32),
                sum_logprob=np.zeros((b,), np.float32))

        audio = np.zeros(16000 * 45, np.float32)  # 1.5 windows

        def mel_fn(chunk):
            return np.zeros((chunk.shape[0], cfg.n_mels, 3000), np.float32)

        _, segments = transcribe_long_batch(
            params=None, cfg=cfg, tokenizer=tok, audios=[audio],
            mel_fn=mel_fn, decode_fn=decode_fn, use_timestamps=True,
            temperatures=(0.0,), return_segments=True)
        segs = segments[0]
        assert len(segs) == 2
        assert segs[0][0] == pytest.approx(0.0)
        # second window starts at the 30 s seek point
        assert segs[1][0] == pytest.approx(30.0)
        assert segs[1][1] == pytest.approx(60.0)
        assert all("hello" in s[2] for s in segs)

    def test_no_timestamps_one_segment_per_window(self):
        from whisper_context_biasing_tpu.decode.long_form import (
            transcribe_long_batch,
        )
        from whisper_context_biasing_tpu.decode.greedy import GreedyResult
        from whisper_context_biasing_tpu.models import tiny_test_config
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        tok = load_tokenizer()
        cfg = tiny_test_config()
        word = tok.encode(" hi", add_special_tokens=False)

        def decode_fn(mel, ids, mask, temperature, key):
            b = mel.shape[0]
            row = word + [tok.eot]
            toks = np.tile(np.asarray(row, np.int32), (b, 1))
            return GreedyResult(
                tokens=toks, lengths=np.full((b,), len(word), np.int32),
                sum_logprob=np.zeros((b,), np.float32))

        audio = np.zeros(16000 * 35, np.float32)

        def mel_fn(chunk):
            return np.zeros((chunk.shape[0], cfg.n_mels, 3000), np.float32)

        _, segments = transcribe_long_batch(
            params=None, cfg=cfg, tokenizer=tok, audios=[audio],
            mel_fn=mel_fn, decode_fn=decode_fn, use_timestamps=False,
            temperatures=(0.0,), return_segments=True)
        segs = segments[0]
        assert len(segs) == 2
        assert segs[0] == (0.0, 30.0, " hi")
        # tail window spans only the remaining 5 s of audio
        assert segs[1][0] == pytest.approx(30.0)
        assert segs[1][1] == pytest.approx(35.0)
