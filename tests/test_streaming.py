"""StreamingTranscriber: chunked feeding must reproduce the batch long-form
loop exactly (the equivalence contract pinned in decode/streaming.py)."""

import numpy as np
import pytest

from whisper_context_biasing_tpu.decode import StreamingTranscriber
from whisper_context_biasing_tpu.decode.greedy import GreedyResult
from whisper_context_biasing_tpu.decode.long_form import transcribe_long_batch
from whisper_context_biasing_tpu.models import tiny_test_config
from whisper_context_biasing_tpu.tokenizer import load_tokenizer

SR = 16000


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer()


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


def _mel_fn(cfg):
    """Deterministic 'mel' carrying the window's first-sample value so the
    fake decode_fn can tell windows apart."""
    def mel_fn(chunk):
        m = np.zeros((chunk.shape[0], cfg.n_mels, 3000), np.float32)
        m[:, 0, 0] = chunk[:, 0]
        return m
    return mel_fn


def _scripted_decode_fn(tok, *, seg_end_s=20.0, text=" hello"):
    """Emits one closed timestamp segment [0, seg_end_s] whose content token
    depends on the window's first sample — so windows are distinguishable
    and timestamp seeking advances by seg_end_s (partial-window re-decode)."""
    word = tok.encode(text, add_special_tokens=False)
    ts0 = tok.timestamp_begin
    ts_end = tok.timestamp_begin + int(seg_end_s / 0.02)

    def decode_fn(mel, ids, mask, temperature, key):
        b = mel.shape[0]
        marker = (np.abs(mel[:, 0, 0]) * 100).astype(np.int32) % 50  # per-window
        rows = np.stack([
            np.asarray([ts0] + [w + int(marker[i]) for w in word] + [ts_end, tok.eot],
                       np.int32)
            for i in range(b)
        ])
        lens = np.full((b,), rows.shape[1] - 1, np.int32)
        return GreedyResult(rows, lens, np.zeros((b,), np.float32),
                            np.zeros((b,), np.float32))

    return decode_fn


def _make_audio(seconds):
    """Each sample holds (second_index+1)/100 so window starts differ."""
    n = int(seconds * SR)
    return ((np.arange(n) // SR + 1) / 100.0).astype(np.float32)


class TestEquivalence:
    @pytest.mark.parametrize("chunk_s", [0.5, 7.0, 31.0])
    def test_matches_batch_loop(self, tok, cfg, chunk_s):
        audio = _make_audio(75)
        kwargs = dict(
            mel_fn=_mel_fn(cfg), use_timestamps=True, temperatures=(0.0,),
            no_speech_threshold=0.6, logprob_threshold=-1.0,
        )
        ref_tokens, ref_segs = transcribe_long_batch(
            params=None, cfg=cfg, tokenizer=tok, audios=[audio],
            decode_fn=_scripted_decode_fn(tok), return_segments=True, **kwargs)

        st = StreamingTranscriber(None, cfg, tok,
                                  decode_fn=_scripted_decode_fn(tok), **kwargs)
        segs = []
        step = int(chunk_s * SR)
        for i in range(0, len(audio), step):
            segs.extend(st.feed(audio[i : i + step]))
        segs.extend(st.finish())

        assert st.tokens == ref_tokens[0]
        assert segs == st.segments
        assert [(round(a, 4), e if e is None else round(e, 4), t)
                for a, e, t in segs] == \
               [(round(a, 4), e if e is None else round(e, 4), t)
                for a, e, t in ref_segs[0]]

    def test_no_timestamp_mode_matches(self, tok, cfg):
        audio = _make_audio(40)

        word = tok.encode(" hi", add_special_tokens=False)

        def decode_fn(mel, ids, mask, temperature, key):
            b = mel.shape[0]
            rows = np.tile(np.asarray(word + [tok.eot], np.int32), (b, 1))
            return GreedyResult(rows, np.full((b,), len(word), np.int32),
                                np.zeros((b,), np.float32),
                                np.zeros((b,), np.float32))

        kwargs = dict(mel_fn=_mel_fn(cfg), use_timestamps=False,
                      temperatures=(0.0,))
        ref_tokens, ref_segs = transcribe_long_batch(
            params=None, cfg=cfg, tokenizer=tok, audios=[audio],
            decode_fn=decode_fn, return_segments=True, **kwargs)
        st = StreamingTranscriber(None, cfg, tok, decode_fn=decode_fn, **kwargs)
        st.feed(audio)
        st.finish()
        assert st.tokens == ref_tokens[0]
        assert st.segments == ref_segs[0]


class TestIncrementalBehavior:
    def test_partial_window_waits_for_more_audio(self, tok, cfg):
        st = StreamingTranscriber(None, cfg, tok, mel_fn=_mel_fn(cfg),
                                  decode_fn=_scripted_decode_fn(tok),
                                  temperatures=(0.0,))
        out = st.feed(_make_audio(10))
        assert out == [] and st.tokens == []
        out = st.feed(_make_audio(25))  # crosses the 30 s window
        assert len(out) >= 1

    def test_history_conditioning_present(self, tok, cfg):
        seen_prefix_lens = []

        def decode_fn(mel, ids, mask, temperature, key):
            seen_prefix_lens.append(int(np.asarray(mask).sum()))
            b = mel.shape[0]
            word = tok.encode(" word", add_special_tokens=False)
            rows = np.tile(np.asarray(word + [tok.eot], np.int32), (b, 1))
            return GreedyResult(rows, np.full((b,), len(word), np.int32),
                                np.zeros((b,), np.float32),
                                np.zeros((b,), np.float32))

        st = StreamingTranscriber(None, cfg, tok, mel_fn=_mel_fn(cfg),
                                  decode_fn=decode_fn, use_timestamps=False,
                                  temperatures=(0.0,))
        st.feed(_make_audio(65))
        st.finish()
        # the second window's prefix carries <|sop|> + history
        assert seen_prefix_lens[1] > seen_prefix_lens[0]

    def test_empty_stream_decodes_one_window(self, tok, cfg):
        calls = []

        def decode_fn(mel, ids, mask, temperature, key):
            calls.append(1)
            b = mel.shape[0]
            rows = np.full((b, 1), tok.eot, np.int32)
            return GreedyResult(rows, np.zeros((b,), np.int32),
                                np.zeros((b,), np.float32),
                                np.zeros((b,), np.float32))

        st = StreamingTranscriber(None, cfg, tok, mel_fn=_mel_fn(cfg),
                                  decode_fn=decode_fn, temperatures=(0.0,))
        st.finish()
        assert len(calls) == 1

    def test_feed_after_finish_raises(self, tok, cfg):
        st = StreamingTranscriber(None, cfg, tok, mel_fn=_mel_fn(cfg),
                                  decode_fn=_scripted_decode_fn(tok))
        st.finish()
        with pytest.raises(RuntimeError, match="finished"):
            st.feed(np.zeros(100, np.float32))

    def test_silence_rule_applies(self, tok, cfg):
        def decode_fn(mel, ids, mask, temperature, key):
            b = mel.shape[0]
            word = tok.encode(" garbage", add_special_tokens=False)
            rows = np.tile(np.asarray(word + [tok.eot], np.int32), (b, 1))
            return GreedyResult(rows, np.full((b,), len(word), np.int32),
                                np.full((b,), -50.0, np.float32),   # low conf
                                np.full((b,), 0.95, np.float32))    # no-speech

        st = StreamingTranscriber(None, cfg, tok, mel_fn=_mel_fn(cfg),
                                  decode_fn=decode_fn, use_timestamps=False,
                                  temperatures=(0.0, 0.5),
                                  no_speech_threshold=0.6,
                                  logprob_threshold=-1.0)
        st.feed(_make_audio(31))
        st.finish()
        assert st.tokens == []


@pytest.mark.slow
class TestStreamingRealModel:
    def test_matches_batch_with_real_decode(self, tok, cfg):
        from whisper_context_biasing_tpu.models import init_params

        params = init_params(cfg, 0)
        win = cfg.n_audio_ctx * 320
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(win + win // 2) * 0.1).astype(np.float32)

        def mel_fn(chunk):
            r = np.random.default_rng(
                int(abs(chunk).sum() * 1e3) % 2**31)
            return (r.standard_normal((chunk.shape[0], cfg.n_mels, 128)) * 0.5
                    ).astype(np.float32)

        kwargs = dict(mel_fn=mel_fn, max_new=6, use_timestamps=False,
                      temperatures=(0.0,), window_samples=win,
                      no_speech_threshold=None)
        ref = transcribe_long_batch(params, cfg, tok, [audio], **kwargs)
        st = StreamingTranscriber(params, cfg, tok, **kwargs)
        for i in range(0, len(audio), 10000):
            st.feed(audio[i : i + 10000])
        st.finish()
        assert st.tokens == ref[0]

    def test_accelerators_match_plain_stream(self, tok, cfg):
        """Medusa heads and a draft model in the streaming session both
        reproduce the plain stream's tokens exactly (verification sets
        correctness, accelerators set speed)."""
        from whisper_context_biasing_tpu.models import (
            init_medusa_params,
            init_params,
            tiny_test_config,
        )

        params = init_params(cfg, 0)
        win = cfg.n_audio_ctx * 320
        rng = np.random.default_rng(1)
        audio = (rng.standard_normal(win + win // 3) * 0.1).astype(np.float32)

        def mel_fn(chunk):
            r = np.random.default_rng(int(abs(chunk).sum() * 1e3) % 2**31)
            return (r.standard_normal((chunk.shape[0], cfg.n_mels, 128)) * 0.5
                    ).astype(np.float32)

        kwargs = dict(mel_fn=mel_fn, max_new=5, use_timestamps=False,
                      temperatures=(0.0,), window_samples=win,
                      no_speech_threshold=None)

        def run(**extra):
            st = StreamingTranscriber(params, cfg, tok, **kwargs, **extra)
            st.feed(audio)
            st.finish()
            return st.tokens

        ref = run()
        md = init_medusa_params(cfg, 2, 0)
        assert run(medusa=md) == ref
        dcfg = tiny_test_config(n_audio_layers=1, n_text_layers=1,
                                d_model=32, n_heads=2)
        dparams = init_params(dcfg, 7)
        assert run(draft=(dparams, dcfg, 3)) == ref


@pytest.mark.slow
class TestStreamingWordTimestamps:
    def test_words_accumulate_in_absolute_time(self, tok, cfg):
        from whisper_context_biasing_tpu.models import init_params

        params = init_params(cfg, 0)
        win = cfg.n_audio_ctx * 320
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(win + win // 2) * 0.1).astype(np.float32)

        def mel_fn(chunk):
            r = np.random.default_rng(int(abs(chunk).sum() * 1e3) % 2**31)
            return (r.standard_normal((chunk.shape[0], cfg.n_mels, 128)) * 0.5
                    ).astype(np.float32)

        st = StreamingTranscriber(params, cfg, tok, mel_fn=mel_fn, max_new=5,
                                  use_timestamps=False, temperatures=(0.0,),
                                  no_speech_threshold=None,
                                  window_samples=win, word_timestamps=True)
        st.feed(audio)
        st.finish()
        total_s = len(audio) / 16000
        last = -1.0
        for w in st.words:
            assert 0.0 <= w.start <= w.end <= total_s + 1e-6
            assert w.start >= last - 1e-6
            last = w.start
        text = "".join(w.word for w in st.words).strip()
        assert text == st.text
