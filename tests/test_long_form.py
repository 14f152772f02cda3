"""Long-form robustness: timestamp-conditioned seeking, temperature
fallback, repetition detection (decode/long_form.py).

The seek/fallback control flow is driven through an injected ``decode_fn``
(scripted outputs) so the tests are deterministic and model-free; the
end-to-end path over the real greedy loop is covered in
tests/test_beam.py::TestLongForm."""

import numpy as np
import jax
import pytest

from whisper_context_biasing_tpu.audio.mel import N_SAMPLES, SAMPLE_RATE
from whisper_context_biasing_tpu.decode.greedy import GreedyResult
from whisper_context_biasing_tpu.decode.long_form import (
    compression_ratio,
    timestamp_seek,
    transcribe_long_batch,
    window_quality_ok,
)
from whisper_context_biasing_tpu.models import init_params, tiny_test_config
from whisper_context_biasing_tpu.tokenizer import load_tokenizer


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer()


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config()
    return cfg, init_params(cfg, 0)


def _result(rows, eot=50256, sum_logprob=None, width=16):
    toks = np.full((len(rows), width), eot, np.int32)
    lens = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        toks[i, : len(r)] = r
        lens[i] = len(r)
    slp = (np.zeros(len(rows), np.float32) if sum_logprob is None
           else np.asarray(sum_logprob, np.float32))
    return GreedyResult(toks, lens, slp)


def _enc(tok, text):
    return tok.encode(text, add_special_tokens=False)


def _ts(tok, seconds):
    return tok.timestamp_begin + int(round(seconds / 0.02))


class TestHeuristics:
    def test_compression_ratio_flags_repetition(self):
        loop = "the same words " * 40
        normal = ("the patient was administered aspirin after presenting "
                  "with acute chest pain and shortness of breath")
        assert compression_ratio(loop) > 2.4
        assert compression_ratio(normal) <= 2.4

    def test_window_quality(self):
        assert window_quality_ok("a normal sentence about medication", -0.3)
        assert not window_quality_ok("word " * 200, -0.3)          # repetition
        assert not window_quality_ok("a normal sentence", -2.5)    # low confidence
        # thresholds disabled -> always accepted
        assert window_quality_ok("word " * 200, -2.5,
                                 compression_ratio_threshold=0.0,
                                 logprob_threshold=None)

    def test_timestamp_seek(self, tok):
        words = _enc(tok, " hello there")
        # closed segment then a trailing partial: keep through last timestamp,
        # advance to its value
        toks = [_ts(tok, 0.0)] + words + [_ts(tok, 12.5)] + _enc(tok, " partial")
        kept, adv = timestamp_seek(toks, tok)
        assert adv == pytest.approx(12.5)
        assert kept == [_ts(tok, 0.0)] + words + [_ts(tok, 12.5)]
        # no timestamps -> full-window advance, tokens untouched
        kept, adv = timestamp_seek(words, tok)
        assert adv is None and kept == words
        # only a 0.0 timestamp -> cannot advance by 0: full window
        kept, adv = timestamp_seek([_ts(tok, 0.0)] + words, tok)
        assert adv is None


class TestSeekLoop:
    def test_timestamp_seek_recovers_straddling_segment(self, tok, model):
        """Fixed 30 s windows split a sentence straddling the boundary; the
        timestamp-conditioned path drops the partial tail, re-seeks to the
        last closed segment, and decodes the sentence whole."""
        cfg, params = model
        full = _enc(tok, " the dose is fifty milligrams")
        half_a, half_b = full[: len(full) // 2], full[len(full) // 2:]
        first = _enc(tok, " take daily")

        calls = []

        def decode_fn(mel, ids, mask, temperature, key):
            calls.append(ids.shape)
            n = len(calls)
            if n == 1:
                # window at 0 s: closed segment [0, 20] + straddler's first half
                row = ([_ts(tok, 0.0)] + first + [_ts(tok, 20.0)] + half_a)
            elif n == 2:
                # window re-seeked to 20 s: the straddling sentence, whole
                row = [_ts(tok, 0.0)] + full + [_ts(tok, 9.0)]
            else:
                row = []
            return _result([row], width=32)

        audio = np.zeros(int(29.0 * SAMPLE_RATE), np.float32)
        out = transcribe_long_batch(
            params, cfg, tok, [audio], use_timestamps=True,
            temperatures=(0.0,), decode_fn=decode_fn,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
        )[0]
        text = tok.decode(out, skip_special_tokens=True)
        # the partial " the dose is" tail from window 1 was dropped; the
        # sentence appears exactly once, whole
        assert text.count("the dose is fifty milligrams") == 1
        assert tok.decode(half_a, skip_special_tokens=True) in text  # via window 2
        assert len(calls) == 2  # 29 s audio: naive stride would stop after 1

    def test_naive_windowing_splits_the_segment(self, tok, model):
        """Control for the test above: same scripted decodes without
        timestamp seeking emit the split halves."""
        cfg, params = model
        full = _enc(tok, " the dose is fifty milligrams")
        half_a = full[: len(full) // 2]

        def decode_fn(mel, ids, mask, temperature, key):
            return _result([[_ts(tok, 0.0)] + _enc(tok, " take daily")
                            + [_ts(tok, 20.0)] + half_a], width=32)

        audio = np.zeros(int(29.0 * SAMPLE_RATE), np.float32)
        out = transcribe_long_batch(
            params, cfg, tok, [audio], use_timestamps=False,
            temperatures=(0.0,), decode_fn=decode_fn,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
        )[0]
        text = tok.decode(out, skip_special_tokens=True)
        assert "the dose is fifty milligrams" not in text
        assert tok.decode(half_a, skip_special_tokens=True) in text

    def test_temperature_fallback_replaces_degenerate_window(self, tok, model):
        """A repetition-loop decode at t=0 is rejected and the t=0.2 retry
        (clean) is kept."""
        cfg, params = model
        loop_row = _enc(tok, " again") * 30
        clean_row = _enc(tok, " the scan was clear")
        temps_used = []

        def decode_fn(mel, ids, mask, temperature, key):
            temps_used.append(temperature)
            return _result([loop_row if temperature == 0.0 else clean_row],
                           width=256)

        audio = np.zeros(N_SAMPLES // 2, np.float32)
        out = transcribe_long_batch(
            params, cfg, tok, [audio],
            temperatures=(0.0, 0.2, 0.4), decode_fn=decode_fn,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
        )[0]
        assert temps_used == [0.0, 0.2]  # ladder stopped at first acceptable
        assert tok.decode(out, skip_special_tokens=True).strip() == "the scan was clear"

    def test_low_logprob_triggers_fallback(self, tok, model):
        cfg, params = model
        row = _enc(tok, " maybe words")
        temps_used = []

        def decode_fn(mel, ids, mask, temperature, key):
            temps_used.append(temperature)
            # avg logprob -3 at t=0, -0.2 at t>0
            slp = [-3.0 * (len(row) + 1)] if temperature == 0.0 else [-0.2 * (len(row) + 1)]
            return _result([row], sum_logprob=slp, width=32)

        audio = np.zeros(N_SAMPLES // 4, np.float32)
        transcribe_long_batch(
            params, cfg, tok, [audio],
            temperatures=(0.0, 0.5), decode_fn=decode_fn,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
        )
        assert temps_used == [0.0, 0.5]

    def test_all_rungs_fail_keeps_last(self, tok, model):
        cfg, params = model
        loop_row = _enc(tok, " loop") * 40

        def decode_fn(mel, ids, mask, temperature, key):
            return _result([loop_row], width=256)

        audio = np.zeros(N_SAMPLES // 4, np.float32)
        out = transcribe_long_batch(
            params, cfg, tok, [audio],
            temperatures=(0.0, 1.0), decode_fn=decode_fn,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
        )[0]
        assert out == loop_row  # degraded output still returned

    def test_mixed_batch_files_finish_independently(self, tok, model):
        """Timestamp seeking advances each file at its own rate."""
        cfg, params = model
        seg = _enc(tok, " ok")

        def decode_fn(mel, ids, mask, temperature, key):
            b = mel.shape[0]
            return _result(
                [[_ts(tok, 0.0)] + seg + [_ts(tok, 15.0)] for _ in range(b)],
                width=32,
            )

        audios = [np.zeros(int(45 * SAMPLE_RATE), np.float32),  # 3 windows @15s
                  np.zeros(int(10 * SAMPLE_RATE), np.float32)]  # 1 window
        outs = transcribe_long_batch(
            params, cfg, tok, audios, use_timestamps=True,
            temperatures=(0.0,), decode_fn=decode_fn,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
        )
        assert len(outs[0]) == 3 * len(outs[1])


class TestGreedySumLogprob:
    def test_greedy_returns_finite_logprobs(self, model):
        import jax.numpy as jnp
        from whisper_context_biasing_tpu.decode import greedy_decode, pack_prefixes

        cfg, params = model
        rng = np.random.default_rng(0)
        mel = jnp.asarray((rng.standard_normal((2, 80, 128)) * 0.5).astype(np.float32))
        ids, mask = pack_prefixes([[50257], [50257]], 50256)
        res = greedy_decode(params, cfg, mel, jnp.asarray(ids), jnp.asarray(mask),
                            max_new=8)
        slp = np.asarray(res.sum_logprob)
        assert slp.shape == (2,)
        assert np.all(np.isfinite(slp)) and np.all(slp <= 0.0)
        # avg logprob of an argmax path on a random model is high (peaked
        # softmax is unlikely): just sanity-bound it
        lens = np.asarray(res.lengths)
        avg = slp / (lens + 1)
        assert np.all(avg > -30.0)

    def test_sampled_path_logprob_matches_choice(self, model):
        """temperature>0: sum_logprob reflects the actually-sampled tokens."""
        import jax.numpy as jnp
        from whisper_context_biasing_tpu.decode import greedy_decode, pack_prefixes

        cfg, params = model
        rng = np.random.default_rng(1)
        mel = jnp.asarray((rng.standard_normal((1, 80, 128)) * 0.5).astype(np.float32))
        ids, mask = pack_prefixes([[50257]], 50256)
        r1 = greedy_decode(params, cfg, mel, jnp.asarray(ids), jnp.asarray(mask),
                           max_new=6, temperature=1.0, rng_key=jax.random.PRNGKey(7))
        r2 = greedy_decode(params, cfg, mel, jnp.asarray(ids), jnp.asarray(mask),
                           max_new=6, temperature=1.0, rng_key=jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
        assert float(r1.sum_logprob[0]) == pytest.approx(float(r2.sum_logprob[0]))


class TestNoSpeech:
    """OpenAI's long-form silence rule: windows with high P(<|nospeech|>)
    and low confidence emit nothing and advance a full window."""

    @staticmethod
    def _decode_fn(tok, nsp_value, avg_lp):
        from whisper_context_biasing_tpu.decode.greedy import GreedyResult

        word = tok.encode(" noise", add_special_tokens=False)

        def decode_fn(mel, ids, mask, temperature, key):
            b = mel.shape[0]
            row = word + [tok.eot]
            toks = np.tile(np.asarray(row, np.int32), (b, 1))
            lens = np.full((b,), len(word), np.int32)
            slp = np.full((b,), avg_lp * (len(word) + 1), np.float32)
            return GreedyResult(toks, lens, slp,
                                np.full((b,), nsp_value, np.float32))

        return decode_fn

    def test_silent_window_emits_nothing(self):
        from whisper_context_biasing_tpu.decode.long_form import (
            transcribe_long_batch,
        )
        from whisper_context_biasing_tpu.models import tiny_test_config
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        tok = load_tokenizer()
        cfg = tiny_test_config()

        def mel_fn(chunk):
            return np.zeros((chunk.shape[0], cfg.n_mels, 3000), np.float32)

        out = transcribe_long_batch(
            params=None, cfg=cfg, tokenizer=tok,
            audios=[np.zeros(16000, np.float32)], mel_fn=mel_fn,
            decode_fn=self._decode_fn(tok, nsp_value=0.9, avg_lp=-2.0),
            temperatures=(0.0, 0.5), no_speech_threshold=0.6,
            logprob_threshold=-1.0)
        assert out[0] == []

    def test_confident_decode_overrides_silence_signal(self):
        from whisper_context_biasing_tpu.decode.long_form import (
            transcribe_long_batch,
        )
        from whisper_context_biasing_tpu.models import tiny_test_config
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        tok = load_tokenizer()
        cfg = tiny_test_config()

        def mel_fn(chunk):
            return np.zeros((chunk.shape[0], cfg.n_mels, 3000), np.float32)

        out = transcribe_long_batch(
            params=None, cfg=cfg, tokenizer=tok,
            audios=[np.zeros(16000, np.float32)], mel_fn=mel_fn,
            decode_fn=self._decode_fn(tok, nsp_value=0.9, avg_lp=-0.1),
            temperatures=(0.0,), no_speech_threshold=0.6,
            logprob_threshold=-1.0)
        assert "noise" in tok.decode(out[0], skip_special_tokens=True)

    def test_threshold_none_disables(self):
        from whisper_context_biasing_tpu.decode.long_form import (
            transcribe_long_batch,
        )
        from whisper_context_biasing_tpu.models import tiny_test_config
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        tok = load_tokenizer()
        cfg = tiny_test_config()

        def mel_fn(chunk):
            return np.zeros((chunk.shape[0], cfg.n_mels, 3000), np.float32)

        out = transcribe_long_batch(
            params=None, cfg=cfg, tokenizer=tok,
            audios=[np.zeros(16000, np.float32)], mel_fn=mel_fn,
            decode_fn=self._decode_fn(tok, nsp_value=0.99, avg_lp=-5.0),
            temperatures=(0.0,), no_speech_threshold=None,
            logprob_threshold=None)
        assert "noise" in tok.decode(out[0], skip_special_tokens=True)


@pytest.mark.slow
class TestNoSpeechProbEndToEnd:
    def test_greedy_returns_probability(self):
        import jax.numpy as jnp

        from whisper_context_biasing_tpu.decode import greedy_decode, pack_prefixes
        from whisper_context_biasing_tpu.models import init_params, tiny_test_config
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        tok = load_tokenizer()
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        rng = np.random.default_rng(0)
        mel = jnp.asarray((rng.standard_normal((2, 80, 128)) * 0.5).astype(np.float32))
        ids, mask = pack_prefixes([[tok.sot], [tok.sot]], tok.eot)
        res = greedy_decode(params, cfg, mel, jnp.asarray(ids), jnp.asarray(mask),
                            max_new=4, eot_id=tok.eot,
                            no_speech_id=tok.no_speech)
        nsp = np.asarray(res.no_speech_prob)
        assert nsp.shape == (2,)
        assert ((nsp >= 0) & (nsp <= 1)).all()

    def test_per_row_sot_offsets(self):
        """Batches mixing bare [sot] and [sot, lang, task] starts must read
        each row's P(<|nospeech|>) at ITS OWN sot position (regression: a
        single static offset probed the wrong prefill position for every
        row whose start length differed from row 0)."""
        import jax.numpy as jnp

        from whisper_context_biasing_tpu.decode import greedy_decode, pack_prefixes
        from whisper_context_biasing_tpu.models import init_params, tiny_test_config
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        tok = load_tokenizer(multilingual=True)
        cfg = tiny_test_config(n_vocab=51865, multilingual=True)
        params = init_params(cfg, 0)
        rng = np.random.default_rng(1)
        mel = jnp.asarray((rng.standard_normal((2, 80, 128)) * 0.5).astype(np.float32))
        fr = tok.convert_tokens_to_ids("<|fr|>")
        starts = [[tok.sot], [tok.sot, fr, tok.transcribe]]
        ids, mask = pack_prefixes(starts, tok.eot)
        res = greedy_decode(
            params, cfg, mel, jnp.asarray(ids), jnp.asarray(mask),
            max_new=2, eot_id=tok.eot, no_speech_id=tok.no_speech,
            sot_offset=jnp.asarray([1, 3], jnp.int32))
        # each row must match its own single-row decode with a scalar offset
        for i, off in enumerate((1, 3)):
            ids1, mask1 = pack_prefixes([starts[i]], tok.eot)
            ref = greedy_decode(
                params, cfg, mel[i:i+1], jnp.asarray(ids1), jnp.asarray(mask1),
                max_new=2, eot_id=tok.eot, no_speech_id=tok.no_speech,
                sot_offset=off)
            np.testing.assert_allclose(
                float(np.asarray(res.no_speech_prob)[i]),
                float(np.asarray(ref.no_speech_prob)[0]), rtol=1e-4)


@pytest.mark.slow
class TestLongFormWordTimestamps:
    def test_words_in_absolute_time(self):
        import jax.numpy as jnp  # noqa: F401

        from whisper_context_biasing_tpu.decode.long_form import (
            transcribe_long_batch,
        )
        from whisper_context_biasing_tpu.models import init_params, tiny_test_config
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        tok = load_tokenizer()
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        win = cfg.n_audio_ctx * 320
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(win + win // 2) * 0.1).astype(np.float32)

        def mel_fn(chunk):
            r = np.random.default_rng(int(abs(chunk).sum() * 1e3) % 2**31)
            return (r.standard_normal((chunk.shape[0], cfg.n_mels, 128)) * 0.5
                    ).astype(np.float32)

        tokens, segments, words = transcribe_long_batch(
            params, cfg, tok, [audio], mel_fn=mel_fn, max_new=5,
            use_timestamps=False, temperatures=(0.0,),
            no_speech_threshold=None, window_samples=win,
            return_segments=True, word_timestamps=True)
        assert len(words) == 1
        total_s = len(audio) / 16000
        last = -1.0
        for w in words[0]:
            assert 0.0 <= w.start <= w.end <= total_s + 1e-6
            assert w.start >= last - 1e-6  # non-decreasing across windows
            last = w.start
        # the transcript reassembles from the aligned words
        text = "".join(w.word for w in words[0]).strip()
        assert text == tok.decode(tokens[0], skip_special_tokens=True).strip()


class TestBestOf:
    """OpenAI's best_of rule: sampled fallback rungs draw n candidates and
    keep the best average-logprob row (decode/long_form.sample_best_of)."""

    def test_picks_best_avg_logprob_candidate(self, tok, model):
        cfg, params = model
        calls = []

        def decode_fn(mel, ids, mask, temperature, key):
            calls.append(float(temperature))
            if temperature == 0.0:
                # fails the -1.0 logprob threshold -> ladder falls through
                return _result([_enc(tok, " garbage")], sum_logprob=[-100.0])
            i = sum(1 for t in calls if t > 0)  # 1, 2, 3 across samples
            return _result([_enc(tok, f" candidate {i}")],
                           sum_logprob=[-0.5 if i == 2 else -5.0], width=24)

        audio = np.zeros(int(10 * SAMPLE_RATE), np.float32)
        out = transcribe_long_batch(
            params, cfg, tok, [audio], temperatures=(0.0, 0.5), best_of=3,
            decode_fn=decode_fn, no_speech_threshold=None,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        # 1 greedy call + 3 samples at the 0.5 rung (greedy never repeats)
        assert calls == [0.0, 0.5, 0.5, 0.5]
        assert tok.decode(out[0], skip_special_tokens=True) == " candidate 2"

    def test_greedy_only_ladder_never_resamples(self, tok, model):
        cfg, params = model
        calls = []

        def decode_fn(mel, ids, mask, temperature, key):
            calls.append(float(temperature))
            return _result([_enc(tok, " fine")], sum_logprob=[-0.1])

        audio = np.zeros(int(10 * SAMPLE_RATE), np.float32)
        transcribe_long_batch(
            params, cfg, tok, [audio], temperatures=(0.0,), best_of=4,
            decode_fn=decode_fn, no_speech_threshold=None,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        assert calls == [0.0]

    def test_per_row_selection_in_a_batch(self, tok, model):
        """Row 0's best sample is the first, row 1's the second: selection
        must be per row, not per call."""
        cfg, params = model
        n = [0]

        def decode_fn(mel, ids, mask, temperature, key):
            if temperature == 0.0:
                return _result([_enc(tok, " bad")] * 2,
                               sum_logprob=[-100.0, -100.0])
            n[0] += 1
            rows = [_enc(tok, f" r0 s{n[0]}"), _enc(tok, f" r1 s{n[0]}")]
            slp = [-0.2, -8.0] if n[0] == 1 else [-8.0, -0.2]
            return _result(rows, sum_logprob=slp, width=24)

        audios = [np.zeros(int(5 * SAMPLE_RATE), np.float32)] * 2
        out = transcribe_long_batch(
            params, cfg, tok, audios, temperatures=(0.0, 0.7), best_of=2,
            decode_fn=decode_fn, no_speech_threshold=None,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        assert tok.decode(out[0], skip_special_tokens=True) == " r0 s1"
        assert tok.decode(out[1], skip_special_tokens=True) == " r1 s2"

    def test_streaming_best_of(self, tok, model):
        from whisper_context_biasing_tpu.decode.streaming import (
            StreamingTranscriber,
        )

        cfg, params = model
        calls = []

        def decode_fn(mel, ids, mask, temperature, key):
            calls.append(float(temperature))
            if temperature == 0.0:
                return _result([_enc(tok, " junk")], sum_logprob=[-100.0])
            i = sum(1 for t in calls if t > 0)
            return _result([_enc(tok, f" take {i}")],
                           sum_logprob=[-0.3 if i == 3 else -6.0], width=24)

        st = StreamingTranscriber(
            params, cfg, tok, decode_fn=decode_fn, temperatures=(0.0, 0.5),
            best_of=3, use_timestamps=False, no_speech_threshold=None,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        st.feed(np.zeros(st.window_samples, np.float32))
        assert calls == [0.0, 0.5, 0.5, 0.5]
        text = tok.decode(st.tokens, skip_special_tokens=True)
        assert text == " take 3"

    def test_no_sum_logprob_degrades_to_first_sample(self, tok, model):
        cfg, params = model
        n = [0]

        def decode_fn(mel, ids, mask, temperature, key):
            if temperature == 0.0:
                # no sum_logprob at all: quality gate can't measure -> but
                # compression is fine, so t=0 is accepted; force fallthrough
                # with a repetitive transcript instead
                return _result([_enc(tok, " loop" * 60)], width=512)
            n[0] += 1
            return _result([_enc(tok, f" sample {n[0]}")], width=24)

        audio = np.zeros(int(5 * SAMPLE_RATE), np.float32)
        out = transcribe_long_batch(
            params, cfg, tok, [audio], temperatures=(0.0, 0.5), best_of=3,
            decode_fn=decode_fn, no_speech_threshold=None,
            logprob_threshold=None,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        assert n[0] == 3  # still drew all samples, no crash
        assert tok.decode(out[0], skip_special_tokens=True) == " sample 1"


class TestPromptReset:
    """faster-whisper's prompt_reset_on_temperature: a window produced by a
    hot fallback rung must not feed its (possibly hallucinated) text into
    later windows' history prompts."""

    def _drive(self, tok, model, reset):
        cfg, params = model
        seen_prefix_lens = []

        def decode_fn(mel, ids, mask, temperature, key):
            seen_prefix_lens.append(int(np.asarray(mask).sum()))
            if len(seen_prefix_lens) <= 2:  # window 1: t=0 fails, t=0.8 wins
                lp = -100.0 if temperature == 0.0 else -0.1
                return _result([_enc(tok, " hot window text")],
                               sum_logprob=[lp], width=24)
            return _result([_enc(tok, " second")], sum_logprob=[-0.1])

        audio = np.zeros(int(45 * SAMPLE_RATE), np.float32)  # 2 windows
        transcribe_long_batch(
            params, cfg, tok, [audio], temperatures=(0.0, 0.8),
            prompt_reset_on_temperature=reset, decode_fn=decode_fn,
            no_speech_threshold=None,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        return seen_prefix_lens

    def test_hot_rung_clears_history(self, tok, model):
        lens = self._drive(tok, model, reset=0.5)
        # window 2's prefix is bare <|sot|> — no <|sop|>+history carried
        assert lens[2] == 1

    def test_disabled_keeps_history(self, tok, model):
        lens = self._drive(tok, model, reset=None)
        # window 2 conditions on window 1's text: sop + history + sot
        assert lens[2] > 1

    def test_streaming_matches_long_form_rule(self, tok, model):
        from whisper_context_biasing_tpu.decode.streaming import (
            StreamingTranscriber,
        )

        cfg, params = model
        seen = []

        def decode_fn(mel, ids, mask, temperature, key):
            seen.append(int(np.asarray(mask).sum()))
            if len(seen) <= 2:
                lp = -100.0 if temperature == 0.0 else -0.1
                return _result([_enc(tok, " hot window text")],
                               sum_logprob=[lp], width=24)
            return _result([_enc(tok, " second")], sum_logprob=[-0.1])

        st = StreamingTranscriber(
            params, cfg, tok, decode_fn=decode_fn, temperatures=(0.0, 0.8),
            use_timestamps=False, no_speech_threshold=None,
            prefix_pad_to_multiple=None,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        st.feed(np.zeros(st.window_samples, np.float32))
        st.feed(np.zeros(st.window_samples, np.float32))
        assert seen[2] == 1  # default 0.5 reset: second window uncondit.


class TestBestOfWidths:
    def test_varying_sample_widths_are_padded(self, tok, model):
        """decode_fns that size the token axis per call must not crash the
        per-row accumulator (review regression)."""
        from whisper_context_biasing_tpu.decode.long_form import sample_best_of

        n = [0]

        def call(temperature, key):
            n[0] += 1
            row = _enc(tok, f" w{n[0]}")
            return _result([row], sum_logprob=[-0.1 * n[0]],
                           width=8 + 4 * n[0])

        res = sample_best_of(call, 0.5, jax.random.PRNGKey(0), 3)
        row = np.asarray(res.tokens)[0, : int(np.asarray(res.lengths)[0])]
        assert tok.decode(row.tolist(), skip_special_tokens=True) == " w1"


class TestWindowInfo:
    """return_window_info appends per-window QC dicts as the LAST return
    element: start_s, temperature, avg_logprob, no_speech_prob,
    compression_ratio, accepted."""

    def test_sequential_reports_ladder_outcome(self, tok, model):
        cfg, params = model
        good = _enc(tok, " the scan was clear")

        def decode_fn(mel, ids, mask, temperature, key):
            n_win = 1 if ids.shape == (1, 1) else 2  # history => window 2
            if n_win == 1 and temperature == 0.0:
                return _result([_enc(tok, " junk")], sum_logprob=[-100.0])
            return _result([good], sum_logprob=[-0.2 * (len(good) + 1)],
                           width=32)

        audio = np.zeros(int(45 * SAMPLE_RATE), np.float32)
        out = transcribe_long_batch(
            params, cfg, tok, [audio], temperatures=(0.0, 0.5),
            decode_fn=decode_fn, no_speech_threshold=None,
            return_window_info=True,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        hyps, info = out
        assert len(info[0]) == 2
        w1, w2 = info[0]
        assert w1["start_s"] == 0.0 and w1["temperature"] == 0.5
        assert w1["accepted"] and w1["avg_logprob"] == pytest.approx(-0.2)
        assert w2["start_s"] == 30.0 and w2["temperature"] == 0.0
        assert w2["compression_ratio"] > 0
        assert hyps[0]  # tokens still returned first

    def test_compose_with_segments_and_words_ordering(self, tok, model):
        """info rides LAST after segments (and words when requested)."""
        cfg, params = model

        def decode_fn(mel, ids, mask, temperature, key):
            return _result([_enc(tok, " ok")], sum_logprob=[-0.1])

        audio = np.zeros(int(5 * SAMPLE_RATE), np.float32)
        out = transcribe_long_batch(
            params, cfg, tok, [audio], temperatures=(0.0,),
            decode_fn=decode_fn, no_speech_threshold=None,
            return_segments=True, return_window_info=True,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        hyps, segs, info = out
        assert isinstance(info[0][0], dict) and len(info[0]) == 1

    def test_chunked_window_info_grouped_by_file(self, tok, model):
        from whisper_context_biasing_tpu.decode.chunked import (
            transcribe_chunked,
        )

        cfg, params = model

        def decode_fn(mel, ids, mask, temperature, key):
            return _result([_enc(tok, " ok")] * mel.shape[0],
                           sum_logprob=[-0.3 * 3] * mel.shape[0])

        audios = [np.zeros(int(45 * SAMPLE_RATE), np.float32),
                  np.zeros(int(5 * SAMPLE_RATE), np.float32)]
        out = transcribe_chunked(
            params, cfg, tok, audios, temperatures=(0.0,),
            decode_fn=decode_fn, no_speech_threshold=None,
            use_timestamps=False, return_window_info=True,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        hyps, info = out
        assert len(info) == 2
        assert len(info[0]) >= 2 and len(info[1]) == 1  # 45 s vs 5 s
        starts = [d["start_s"] for d in info[0]]
        assert starts == sorted(starts)
        assert all(d["accepted"] for d in info[0] + info[1])

    def test_streaming_window_info(self, tok, model):
        from whisper_context_biasing_tpu.decode.streaming import (
            StreamingTranscriber,
        )

        cfg, params = model

        def decode_fn(mel, ids, mask, temperature, key):
            return _result([_enc(tok, " hi")], sum_logprob=[-0.2 * 3])

        st = StreamingTranscriber(
            params, cfg, tok, decode_fn=decode_fn, temperatures=(0.0,),
            use_timestamps=False, no_speech_threshold=None,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        st.feed(np.zeros(st.window_samples * 2, np.float32))
        assert len(st.window_info) == 2
        assert st.window_info[1]["start_s"] == pytest.approx(30.0)
        assert st.window_info[0]["accepted"]


class TestUnpackLongForm:
    """The shared normalizer every caller of transcribe_long_batch /
    transcribe_chunked unpacks through (fixed 4-tuple, Nones for absent
    elements) — one place to extend when a new optional element lands."""

    def test_all_flag_combinations(self):
        from whisper_context_biasing_tpu.decode import unpack_long_form

        hyps, segs, words, winfo = [[1]], [[(0.0, 1.0, "x")]], [[]], [[{}]]
        # bare outputs (no flags): the library returns the list itself
        assert unpack_long_form(hyps) == (hyps, None, None, None)
        assert unpack_long_form(
            (hyps, segs), return_segments=True
        ) == (hyps, segs, None, None)
        assert unpack_long_form(
            (hyps, segs, words), return_segments=True, word_timestamps=True
        ) == (hyps, segs, words, None)
        assert unpack_long_form(
            (hyps, winfo), return_window_info=True
        ) == (hyps, None, None, winfo)
        assert unpack_long_form(
            (hyps, segs, words, winfo), return_segments=True,
            word_timestamps=True, return_window_info=True
        ) == (hyps, segs, words, winfo)
        # word_timestamps without return_segments: library adds nothing
        assert unpack_long_form(
            (hyps, winfo), word_timestamps=True, return_window_info=True
        ) == (hyps, None, None, winfo)

    def test_matches_real_return_shapes(self, tok, model):
        from whisper_context_biasing_tpu.decode import unpack_long_form

        cfg, params = model

        def decode_fn(mel, ids, mask, temperature, key):
            return _result([_enc(tok, " ok")], sum_logprob=[-0.1])

        audio = np.zeros(int(5 * SAMPLE_RATE), np.float32)
        mel_fn = lambda c: np.zeros((c.shape[0], 80, 128), np.float32)
        for flags in ({}, {"return_segments": True},
                      {"return_window_info": True},
                      {"return_segments": True, "return_window_info": True}):
            out = transcribe_long_batch(
                params, cfg, tok, [audio], temperatures=(0.0,),
                decode_fn=decode_fn, no_speech_threshold=None,
                mel_fn=mel_fn, **flags)
            hyps, segs, words, winfo = unpack_long_form(out, **flags)
            assert hyps[0]
            assert (segs is not None) == flags.get("return_segments", False)
            assert (winfo is not None) == flags.get("return_window_info", False)


class TestWindowInfoAcceptedSemantics:
    def test_silenced_window_reports_ladder_verdict(self, tok, model):
        """A window every rung FAILED that the silence rule then dropped
        must report accepted=False — identically in the sequential loop and
        chunked mode (the confidence-filter recipe depends on it)."""
        from whisper_context_biasing_tpu.decode.chunked import (
            transcribe_chunked,
        )

        cfg, params = model

        def decode_fn(mel, ids, mask, temperature, key):
            b = mel.shape[0]
            res = _result([_enc(tok, " mumble")] * b,
                          sum_logprob=[-100.0] * b)
            # high no-speech prior at every rung (prefill-derived)
            return GreedyResult(res.tokens, res.lengths, res.sum_logprob,
                                np.full(b, 0.99, np.float32))

        audio = np.zeros(int(5 * SAMPLE_RATE), np.float32)
        kw = dict(temperatures=(0.0, 0.5), decode_fn=decode_fn,
                  no_speech_threshold=0.6, logprob_threshold=-1.0,
                  return_window_info=True,
                  mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        hyps, info = transcribe_long_batch(params, cfg, tok, [audio], **kw)
        assert hyps[0] == [] and info[0][0]["accepted"] is False
        kw.pop("temperatures")
        hyps_c, info_c = transcribe_chunked(
            params, cfg, tok, [audio], temperatures=(0.0, 0.5),
            use_timestamps=False, **kw)
        assert info_c[0][0]["accepted"] is False
        # compression_ratio reports what the ladder GATED ON — the final
        # rung's full row (" mumble"), not the emptied post-silence row —
        # and identically in both long-form modes
        want = round(compression_ratio(" mumble"), 3)
        assert info[0][0]["compression_ratio"] == want
        assert info_c[0][0]["compression_ratio"] == want

    def test_streaming_empty_clip_list_is_no_gating(self, tok, model):
        from whisper_context_biasing_tpu.decode.streaming import (
            StreamingTranscriber,
        )

        cfg, params = model

        def decode_fn(mel, ids, mask, temperature, key):
            return _result([_enc(tok, " ok")], sum_logprob=[-0.1])

        st = StreamingTranscriber(
            params, cfg, tok, decode_fn=decode_fn, vad=[],  # no ranges
            temperatures=(0.0,), use_timestamps=False,
            no_speech_threshold=None,
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32))
        st.feed(np.zeros(st.window_samples, np.float32))
        assert st.tokens  # decoded normally, no ValueError, no gating
