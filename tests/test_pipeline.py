"""High-level Pipeline API: routing, options, and result contract.

Library surface over the same decode paths the CLIs use (the reference has
no library API at all — scripts only, /root/reference/scripts)."""

import numpy as np
import pytest

from whisper_context_biasing_tpu import Pipeline, TranscriptionResult
from whisper_context_biasing_tpu.models import init_params, tiny_test_config
from whisper_context_biasing_tpu.tokenizer import load_tokenizer


def _pipe(multilingual=False):
    cfg = tiny_test_config(
        n_vocab=51865 if multilingual else 51864, multilingual=multilingual)
    return Pipeline(
        "tiny" if multilingual else "tiny.en",
        config=cfg, params=init_params(cfg, 0),
        tokenizer=load_tokenizer(multilingual=multilingual))


@pytest.fixture(scope="module")
def pipe():
    return _pipe()


@pytest.fixture(scope="module")
def ml_pipe():
    return _pipe(multilingual=True)


@pytest.mark.slow
class TestMedusaPipeline:
    def test_medusa_pipeline_matches_plain(self):
        from whisper_context_biasing_tpu.models import init_medusa_params

        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        tok = load_tokenizer()
        audio = np.zeros(8000, np.float32)
        plain = Pipeline("tiny.en", config=cfg, params=params, tokenizer=tok)
        medusa = Pipeline("tiny.en", config=cfg, params=params, tokenizer=tok,
                          medusa=init_medusa_params(cfg, 2, 0))
        a = plain.transcribe(audio, max_tokens=6)
        b = medusa.transcribe(audio, max_tokens=6)
        assert a.tokens == b.tokens

    def test_medusa_chains_override(self):
        """medusa_chains= overrides the stamped width without mutating the
        caller's dict, and chain-mode output still matches plain greedy."""
        from whisper_context_biasing_tpu.models import init_medusa_params

        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        tok = load_tokenizer()
        audio = np.zeros(8000, np.float32)
        heads = init_medusa_params(cfg, 2, 0)
        plain = Pipeline("tiny.en", config=cfg, params=params, tokenizer=tok)
        chained = Pipeline("tiny.en", config=cfg, params=params,
                           tokenizer=tok, medusa=heads, medusa_chains=2)
        assert chained.medusa["n_chains"] == 2
        assert "n_chains" not in heads
        a = plain.transcribe(audio, max_tokens=6)
        b = chained.transcribe(audio, max_tokens=6)
        assert a.tokens == b.tokens


@pytest.mark.slow
class TestSpeculativePipeline:
    def test_draft_pipeline_matches_plain(self):
        """Pipeline(draft_config=...) must return the exact transcripts of
        the plain target pipeline (speculative decode is output-invariant)."""
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        tok = load_tokenizer()
        dcfg = tiny_test_config(n_audio_layers=1, n_text_layers=1,
                                d_model=32, n_heads=2)
        plain = Pipeline("tiny.en", config=cfg, params=params, tokenizer=tok)
        spec = Pipeline("tiny.en", config=cfg, params=params, tokenizer=tok,
                        draft_config=dcfg, draft_params=init_params(dcfg, 9),
                        speculative_k=3)
        rng = np.random.default_rng(1)
        clips = [rng.standard_normal(16000).astype(np.float32) * 0.1
                 for _ in range(2)]
        ref = plain.transcribe(clips, max_tokens=6)
        got = spec.transcribe(clips, max_tokens=6)
        assert [r.tokens for r in got] == [r.tokens for r in ref]
        # bias fusion composes
        ref_b = plain.transcribe(clips, bias_words=["aspirin"], bias_boost=2.0,
                                 max_tokens=6)
        got_b = spec.transcribe(clips, bias_words=["aspirin"], bias_boost=2.0,
                                max_tokens=6)
        assert [r.tokens for r in got_b] == [r.tokens for r in ref_b]

    def test_vocab_mismatch_rejected(self):
        cfg = tiny_test_config()
        dcfg = tiny_test_config(n_vocab=51865, multilingual=True)
        with pytest.raises(ValueError):
            Pipeline("tiny.en", config=cfg, params=init_params(cfg, 0),
                     tokenizer=load_tokenizer(),
                     draft_config=dcfg, draft_params=init_params(dcfg, 1))


@pytest.mark.slow
class TestPipeline:
    def test_single_clip_returns_single_result(self, pipe):
        res = pipe.transcribe(np.zeros(8000, np.float32), max_tokens=4)
        assert isinstance(res, TranscriptionResult)
        assert isinstance(res.text, str) and isinstance(res.tokens, list)

    def test_batch_returns_list(self, pipe):
        res = pipe.transcribe([np.zeros(8000, np.float32)] * 2, max_tokens=4)
        assert isinstance(res, list) and len(res) == 2

    def test_bias_words_and_context(self, pipe):
        res = pipe.transcribe([np.zeros(8000, np.float32)],
                              context="clinical note",
                              bias_words=["aspirin"], bias_boost=2.0,
                              max_tokens=4)
        assert len(res) == 1

    def test_beams(self, pipe):
        res = pipe.transcribe([np.zeros(8000, np.float32)], num_beams=2,
                              beam_early_stopping="true", max_tokens=4)
        assert len(res) == 1

    def test_word_timestamps_and_subtitles(self, pipe):
        rng = np.random.default_rng(0)
        res = pipe.transcribe([rng.standard_normal(16000).astype(np.float32) * 0.1],
                              word_timestamps=True, max_tokens=4)
        r = res[0]
        if r.words:  # random weights may emit nothing
            assert r.segments is not None
            assert "-->" in r.srt() and r.vtt().startswith("WEBVTT")
            for w in r.words:
                assert 0.0 <= w.start <= w.end <= 1.0 + 1e-6

    def test_long_form_auto_routing(self, pipe):
        # window_samples derives from the test config's reduced audio context
        audio = np.zeros(pipe.window_samples + 8000, np.float32)
        res = pipe.transcribe([audio], max_tokens=4)
        assert len(res) == 1
        assert res[0].segments is not None  # long form always yields segments

    def test_long_form_chunked(self, pipe):
        """long_form='chunked' decodes multi-window audio in parallel and
        returns the standard result contract; word_timestamps rejected."""
        audio = np.zeros(2 * pipe.window_samples + 8000, np.float32)
        res = pipe.transcribe([audio], max_tokens=4, long_form="chunked")
        assert len(res) == 1
        assert isinstance(res[0], TranscriptionResult)
        assert res[0].segments is not None
        # short audio also runs (single window degenerate case)
        one = pipe.transcribe(np.zeros(4000, np.float32), max_tokens=4,
                              long_form="chunked")
        assert isinstance(one, TranscriptionResult)
        # word timestamps compose with the chunked mode
        res = pipe.transcribe([audio], max_tokens=4, long_form="chunked",
                              word_timestamps=True)
        assert res[0].words is not None
        assert all(w.end >= w.start >= 0 for w in res[0].words)

    def test_int16_array_input_matches_float(self, pipe):
        """Raw int16 PCM arrays normalize with the ingest contract on every
        route — short form, sequential long, chunked long (which keeps the
        mel on device) — and transcribe identically to the float view."""
        rng = np.random.default_rng(13)
        pcm = (rng.standard_normal(2 * pipe.window_samples + 8000)
               * 6000).astype(np.int16)
        as_float = pcm.astype(np.float32) / 32768.0
        for kw in ({}, {"long_form": "chunked"}, {"long_form": True}):
            ri = pipe.transcribe([pcm], max_tokens=4, **kw)
            rf = pipe.transcribe([as_float], max_tokens=4, **kw)
            assert ri[0].text == rf[0].text, kw

    def test_window_info_short_form_warns(self, pipe):
        """window_info=True on the short-form route can't be honored (QC is
        per long-form window) — the Pipeline warns instead of silently
        leaving result.windows None (the CLI has the same warning)."""
        with pytest.warns(UserWarning, match="short-form route"):
            res = pipe.transcribe(np.zeros(4000, np.float32), max_tokens=4,
                                  window_info=True)
        assert res.windows is None
        # forcing the windowed path honors it, no warning
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error")
            res = pipe.transcribe(np.zeros(4000, np.float32), max_tokens=4,
                                  long_form=True, window_info=True)
        assert res.windows is not None and len(res.windows) == 1

    def test_window_buckets_group_and_order(self, pipe):
        """Duration-bucketed serving (window_buckets=): results come back in
        input order and each clip's transcript equals what a single-clip
        bucketed call produces — grouping is an internal batching detail."""
        rng = np.random.default_rng(3)
        win = pipe.window_samples
        short_s = (win // 4) / 16000  # a hop-aligned sub-window bucket
        clips = [
            (rng.standard_normal(win // 5) * 0.1).astype(np.float32),
            (rng.standard_normal(win - 320) * 0.1).astype(np.float32),
            (rng.standard_normal(win // 6) * 0.1).astype(np.float32),
        ]
        batched = pipe.transcribe(clips, max_tokens=4,
                                  window_buckets=(short_s,))
        assert len(batched) == 3
        for clip, res in zip(clips, batched):
            solo = pipe.transcribe(clip, max_tokens=4,
                                   window_buckets=(short_s,))
            assert res.tokens == solo.tokens

    def test_window_buckets_full_window_is_implicit(self, pipe):
        """A clip longer than every requested bucket decodes in the full
        window — identical to the unbucketed path (nothing gets trimmed
        shorter than pad_or_trim would)."""
        rng = np.random.default_rng(4)
        win = pipe.window_samples
        clip = (rng.standard_normal(win) * 0.1).astype(np.float32)
        plain = pipe.transcribe(clip, max_tokens=4)
        bucketed = pipe.transcribe(clip, max_tokens=4,
                                   window_buckets=(0.01,))
        assert bucketed.tokens == plain.tokens

    def test_window_buckets_options_compose(self, pipe):
        """Bias spans / context / word timestamps subset correctly per
        bucket; invalid bucket values are rejected."""
        rng = np.random.default_rng(5)
        win = pipe.window_samples
        clips = [(rng.standard_normal(win // 4) * 0.1).astype(np.float32),
                 (rng.standard_normal(win) * 0.1).astype(np.float32)]
        res = pipe.transcribe(clips, max_tokens=4,
                              window_buckets=((win // 2) / 16000,),
                              context="note", bias_words=["aspirin"],
                              bias_boost=2.0, word_timestamps=True)
        assert len(res) == 2
        for r, clip in zip(res, clips):
            for w in (r.words or []):
                assert 0.0 <= w.start <= w.end <= len(clip) / 16000 + 1e-6
        with pytest.raises(ValueError, match="positive seconds"):
            pipe.transcribe(clips[0], max_tokens=4, window_buckets=(0,))
        with pytest.warns(UserWarning, match="short-form route only"):
            pipe.transcribe(np.zeros(win + 320, np.float32), max_tokens=4,
                            window_buckets=(0.25,))

    def test_window_buckets_batch_padding_reuses_programs(self, pipe):
        """Bucket group sizes depend on the per-call duration mix; the
        bucketed path pads each group to a power of two (min 8) so serving
        traffic reuses one compiled decode program per bucket instead of
        recompiling per (window, group size) pair."""
        from whisper_context_biasing_tpu.decode.greedy import greedy_decode

        rng = np.random.default_rng(6)
        win = pipe.window_samples
        bucket = ((win // 4) / 16000,)

        def mix(k):
            return [(rng.standard_normal(win // 5) * 0.1).astype(np.float32)
                    for _ in range(k)]

        pipe.transcribe(mix(3), max_tokens=4, window_buckets=bucket)
        before = greedy_decode.cache_size()
        pipe.transcribe(mix(5), max_tokens=4, window_buckets=bucket)
        pipe.transcribe(mix(2), max_tokens=4, window_buckets=bucket)
        assert greedy_decode.cache_size() == before

    def test_srt_without_segments_raises(self, pipe):
        res = pipe.transcribe(np.zeros(8000, np.float32), max_tokens=4)
        with pytest.raises(ValueError, match="segments"):
            res.srt()

    def test_language_forcing_and_detection(self, ml_pipe):
        from whisper_context_biasing_tpu.tokenizer.whisper_tokenizer import (
            LANGUAGES,
        )

        res = ml_pipe.transcribe([np.zeros(8000, np.float32)],
                                 language="fr", task="translate", max_tokens=4)
        assert res[0].language == "fr"
        res = ml_pipe.transcribe([np.zeros(8000, np.float32)],
                                 language="auto", max_tokens=4)
        assert res[0].language in LANGUAGES
        det = ml_pipe.detect_language(np.zeros(8000, np.float32))
        assert det[0][0] in LANGUAGES and 0.0 < det[0][1] <= 1.0

    def test_language_on_english_model_raises(self, pipe):
        with pytest.raises(ValueError, match="multilingual"):
            pipe.transcribe(np.zeros(8000, np.float32), language="fr")


@pytest.mark.slow
class TestPipelineStream:
    def test_stream_helper(self, pipe):
        st = pipe.stream(use_timestamps=False, max_new=4,
                         temperatures=(0.0,), no_speech_threshold=None)
        assert st.window_samples == pipe.window_samples
        st.feed(np.zeros(pipe.window_samples, np.float32))
        st.finish()
        assert isinstance(st.text, str)

    def test_stream_helper_with_bias_and_context(self, pipe):
        st = pipe.stream(bias_words=["aspirin"], bias_boost=2.0,
                         context="clinical note", use_timestamps=False,
                         max_new=4, temperatures=(0.0,),
                         no_speech_threshold=None)
        assert st.context  # encoded conditioning text present
        st.finish()
