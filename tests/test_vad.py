"""Host-side energy VAD (audio/vad.py) and its silence-skipping
integration into the long-form seek loop, chunked decoding, and streaming
sessions. Model-free: decode paths are driven through injected scripted
``decode_fn``s (the test_long_form.py pattern), so the assertions are about
which windows reach the decoder, not about transcripts."""

import numpy as np
import pytest

from whisper_context_biasing_tpu.audio.mel import SAMPLE_RATE
from whisper_context_biasing_tpu.audio.vad import (
    frame_rms_db,
    has_speech,
    next_onset,
    resolve_vad,
    speech_segments,
)
from whisper_context_biasing_tpu.decode.chunked import transcribe_chunked
from whisper_context_biasing_tpu.decode.greedy import GreedyResult
from whisper_context_biasing_tpu.decode.long_form import transcribe_long_batch
from whisper_context_biasing_tpu.models import init_params, tiny_test_config
from whisper_context_biasing_tpu.tokenizer import load_tokenizer

RNG = np.random.default_rng(0)


def _audio(*parts):
    """Build 16 kHz audio from (kind, seconds) parts; kind 'sil'|'sp'."""
    out = []
    for kind, secs in parts:
        n = int(secs * SAMPLE_RATE)
        out.append(np.zeros(n, np.float32) if kind == "sil"
                   else (RNG.standard_normal(n) * 0.1).astype(np.float32))
    return np.concatenate(out) if out else np.zeros(0, np.float32)


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer()


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config()
    return cfg, init_params(cfg, 0)


def _zero_mel(c):
    return np.zeros((c.shape[0], 80, 128), np.float32)


class TestSpeechSegments:
    def test_burst_between_silence(self):
        a = _audio(("sil", 5), ("sp", 2), ("sil", 5))
        segs = speech_segments(a)
        assert len(segs) == 1
        s, e = segs[0]
        # within pad_ms (150 ms) + one frame of the true [5 s, 7 s) burst
        assert abs(s / SAMPLE_RATE - 5.0) < 0.2
        assert abs(e / SAMPLE_RATE - 7.0) < 0.2

    def test_pure_silence_and_empty(self):
        assert speech_segments(np.zeros(SAMPLE_RATE * 10, np.float32)) == []
        assert speech_segments(np.zeros(0, np.float32)) == []

    def test_uniform_audio_is_all_speech(self):
        """Uniformly-loud audio must never be gated (the peak-6 dB clamp):
        better to decode everything than clip speech."""
        a = _audio(("sp", 20))
        segs = speech_segments(a)
        assert len(segs) == 1
        assert segs[0][0] == 0 and segs[0][1] == len(a)

    def test_close_bursts_merge_distant_stay(self):
        near = _audio(("sil", 2), ("sp", 1), ("sil", 0.1), ("sp", 1), ("sil", 2))
        assert len(speech_segments(near)) == 1      # gap < min_silence_ms
        far = _audio(("sil", 2), ("sp", 1), ("sil", 2), ("sp", 1), ("sil", 2))
        assert len(speech_segments(far)) == 2

    def test_min_speech_drops_clicks(self):
        a = _audio(("sil", 3), ("sp", 0.03), ("sil", 3))  # 30 ms click
        assert speech_segments(a) == []

    def test_frame_rms_db_levels(self):
        db = frame_rms_db(_audio(("sil", 1), ("sp", 1)))
        assert db.min() == pytest.approx(-100.0)  # digital-silence clamp
        assert db.max() > -30.0                   # 0.1-amplitude noise

    def test_frame_rms_db_int16_matches_float(self):
        """Raw int16 PCM (the chunked decoder's pass-through) measures the
        same dBFS as its float view — NOT the raw-sample scale."""
        a = _audio(("sil", 1), ("sp", 1))
        pcm = (a * 32768.0).astype(np.int16)
        np.testing.assert_allclose(
            frame_rms_db(pcm), frame_rms_db(pcm.astype(np.float32) / 32768.0),
            atol=1e-4)

    def test_gating_int16_matches_float(self):
        """The GATING entry points (speech_segments / resolve_vad — what
        transcribe_chunked actually calls on pass-through int16 audio) make
        identical decisions for int16 PCM and its float view. Regression:
        speech_segments used to plain-cast int16 (+90.3 dB), so a quiet
        float file gated everything while its int16 twin gated nothing."""
        speech = _audio(("sil", 2), ("sp", 1), ("sil", 2))
        pcm = (speech * 32768.0).clip(-32768, 32767).astype(np.int16)
        as_float = pcm.astype(np.float32) / 32768.0
        assert speech_segments(pcm) == speech_segments(as_float)
        assert resolve_vad(True, pcm) == resolve_vad(True, as_float)
        # quiet noise well below the floor: float view gates everything;
        # the int16 view must agree (it used to read ~+90 dB and gate
        # nothing)
        rng = np.random.default_rng(5)
        quiet = (rng.standard_normal(16000 * 5) * 0.001).astype(np.float32)
        qpcm = (quiet * 32768.0).astype(np.int16)
        assert speech_segments(qpcm) == speech_segments(
            qpcm.astype(np.float32) / 32768.0) == []

    def test_resolve_vad_contract(self):
        a = _audio(("sp", 1))
        assert resolve_vad(False, a) is None and resolve_vad(None, a) is None
        assert resolve_vad(True, a) == speech_segments(a)
        assert resolve_vad({"pad_ms": 0.0}, a) == speech_segments(a, pad_ms=0.0)
        with pytest.raises(ValueError, match="unknown vad option"):
            resolve_vad({"nope": 1}, a)

    def test_has_speech_and_next_onset(self):
        segs = [(100, 200), (500, 900)]
        assert has_speech(segs, 0, 150) and has_speech(segs, 150, 300)
        assert not has_speech(segs, 200, 500) and not has_speech(segs, 900, 2000)
        assert next_onset(segs, 0) == 100
        assert next_onset(segs, 150) == 150      # inside the first segment
        assert next_onset(segs, 300) == 500
        assert next_onset(segs, 900) is None

    def test_has_speech_tolerance(self):
        """Overlap of <= tol samples does not count as speech — the rule
        that stops segment pad bleed keeping every window of regularly
        tiled audio alive."""
        segs = [(100, 200)]
        assert not has_speech(segs, 150, 300, tol=50)   # overlap exactly tol
        assert has_speech(segs, 149, 300, tol=50)       # one sample more
        assert not has_speech(segs, 200, 400, tol=50)

    def test_next_onset_tolerance(self):
        """A segment whose remainder past pos is <= tol is exhausted —
        otherwise a seek sitting tol samples before a segment end would be
        returned verbatim and the skip loop could never advance."""
        segs = [(100, 200), (500, 900)]
        assert next_onset(segs, 150, tol=50) == 500     # 50 left in seg 0
        assert next_onset(segs, 149, tol=50) == 149     # 51 left: still in
        assert next_onset(segs, 860, tol=50) is None

    def test_vad_overlap_tol_contract(self):
        from whisper_context_biasing_tpu.audio.vad import vad_overlap_tol

        # default detector: pad 150 ms + frame 25 ms + hop 10 ms = 185 ms
        assert vad_overlap_tol(True) == int(SAMPLE_RATE * 0.185)
        assert vad_overlap_tol({}) == vad_overlap_tol(True)
        assert vad_overlap_tol({"pad_ms": 0.0}) == int(SAMPLE_RATE * 0.035)
        # explicit clip ranges / no gating: user ranges are verbatim
        assert vad_overlap_tol(None) == 0
        assert vad_overlap_tol(False) == 0
        assert vad_overlap_tol([(0.0, 1.0)]) == 0


class TestLongFormVad:
    def _run(self, tok, model, audio, vad):
        cfg, params = model
        calls = []

        def decode_fn(mel, ids, mask, temperature, key):
            calls.append(np.asarray(mel).shape)
            row = tok.encode(" ok", add_special_tokens=False)
            toks = np.full((mel.shape[0], 8), tok.eot, np.int32)
            lens = np.zeros(mel.shape[0], np.int32)
            toks[:, : len(row)] = row
            lens[:] = len(row)
            return GreedyResult(toks, lens, np.zeros(mel.shape[0], np.float32))

        out = transcribe_long_batch(
            params, cfg, tok, [audio], temperatures=(0.0,),
            decode_fn=decode_fn, mel_fn=_zero_mel, vad=vad)
        return out, len(calls)

    def test_silence_heavy_file_skips_to_speech(self, tok, model):
        """65 s of silence then 10 s of speech: without VAD the seek loop
        decodes 3 windows; with VAD it jumps straight to the onset and
        decodes 1."""
        audio = _audio(("sil", 65), ("sp", 10))
        out_plain, n_plain = self._run(tok, model, audio, vad=False)
        out_vad, n_vad = self._run(tok, model, audio, vad=True)
        assert n_plain == 3 and n_vad == 1
        # the one decoded window still emits (scripted) tokens
        assert out_vad[0] == out_plain[0][: len(out_vad[0])] and out_vad[0]

    def test_pure_silence_decodes_nothing(self, tok, model):
        out, n = self._run(tok, model, _audio(("sil", 70)), vad=True)
        assert n == 0 and out == [[]]

    def test_tiled_silence_skips_the_silent_windows(self, tok, model):
        """Alternating ~30 s speech / silence on the aligned grid: pure pad
        bleed must not keep the silent windows alive (regression for the
        has_speech tolerance — before it, this pattern gated nothing).
        Speech ends 2 s before each window boundary so the padded-onset
        shift cannot push a real sliver past the second window."""
        audio = _audio(("sp", 28), ("sil", 32), ("sp", 28), ("sil", 32))
        _, n_plain = self._run(tok, model, audio, vad=False)
        _, n_vad = self._run(tok, model, audio, vad=True)
        assert n_plain == 4 and n_vad == 2

    def test_noop_on_speech_dense_audio(self, tok, model):
        """All-speech audio: VAD must not change the decode schedule or the
        output (gate-only, never clips)."""
        audio = _audio(("sp", 70))
        out_plain, n_plain = self._run(tok, model, audio, vad=False)
        out_vad, n_vad = self._run(tok, model, audio, vad=True)
        assert n_vad == n_plain == 3
        assert out_vad == out_plain

    def test_segment_times_stay_absolute(self, tok, model):
        """A VAD seek jump must not shift segment timestamps: the window
        decoded after skipping 65 s of silence reports times at ~65 s."""
        cfg, params = model

        def decode_fn(mel, ids, mask, temperature, key):
            row = tok.encode(" late words", add_special_tokens=False)
            toks = np.full((1, 4 + len(row)), tok.eot, np.int32)
            toks[0, : len(row)] = row
            return GreedyResult(toks, np.asarray([len(row)], np.int32),
                                np.zeros(1, np.float32))

        audio = _audio(("sil", 65), ("sp", 10))
        _, segs = transcribe_long_batch(
            params, cfg, tok, [audio], temperatures=(0.0,),
            decode_fn=decode_fn, mel_fn=_zero_mel, vad=True,
            return_segments=True)
        assert len(segs[0]) == 1
        start_s = segs[0][0][0]
        assert 64.0 < start_s < 66.0


class TestChunkedVad:
    def test_silent_windows_never_enter_the_work_list(self, tok, model):
        """90 s with speech only in the first 10 s: the overlapping window
        layout has 4 windows, only the first overlaps speech."""
        cfg, params = model
        batches = []

        def decode_fn(mel, ids, mask, temperature, key):
            batches.append(mel.shape[0])
            toks = np.full((mel.shape[0], 4), tok.eot, np.int32)
            return GreedyResult(toks, np.zeros(mel.shape[0], np.int32),
                                np.zeros(mel.shape[0], np.float32))

        audio = _audio(("sp", 10), ("sil", 80))
        transcribe_chunked(params, cfg, tok, [audio], temperatures=(0.0,),
                           decode_fn=decode_fn, mel_fn=_zero_mel, vad=False)
        plain_rows = sum(batches)
        batches.clear()
        transcribe_chunked(params, cfg, tok, [audio], temperatures=(0.0,),
                           decode_fn=decode_fn, mel_fn=_zero_mel, vad=True)
        assert plain_rows == 4 and sum(batches) == 1

    def test_pad_bleed_does_not_keep_a_window(self, tok, model):
        """10 s speech / 60 s silence / 10 s speech, overlapped layout
        [0,30) [20,50) [40,70) [50,80): window [40,70)'s only overlap with
        speech is the second segment's 170 ms onset pad — before the
        has_speech tolerance it was kept (regression)."""
        cfg, params = model
        batches = []

        def decode_fn(mel, ids, mask, temperature, key):
            batches.append(mel.shape[0])
            toks = np.full((mel.shape[0], 4), tok.eot, np.int32)
            return GreedyResult(toks, np.zeros(mel.shape[0], np.int32),
                                np.zeros(mel.shape[0], np.float32))

        audio = _audio(("sp", 10), ("sil", 60), ("sp", 10))
        kw = dict(temperatures=(0.0,), decode_fn=decode_fn, mel_fn=_zero_mel)
        transcribe_chunked(params, cfg, tok, [audio], vad=False, **kw)
        plain_rows = sum(batches)
        batches.clear()
        transcribe_chunked(params, cfg, tok, [audio], vad=True, **kw)
        assert plain_rows == 4 and sum(batches) == 2

    def test_noop_on_speech_dense_audio(self, tok, model):
        cfg, params = model
        rows = tok.encode(" ok", add_special_tokens=False)

        def decode_fn(mel, ids, mask, temperature, key):
            toks = np.full((mel.shape[0], 8), tok.eot, np.int32)
            lens = np.full(mel.shape[0], len(rows), np.int32)
            toks[:, : len(rows)] = rows
            return GreedyResult(toks, lens, np.zeros(mel.shape[0], np.float32))

        audio = _audio(("sp", 90))
        kw = dict(temperatures=(0.0,), decode_fn=decode_fn, mel_fn=_zero_mel,
                  use_timestamps=False)
        plain = transcribe_chunked(params, cfg, tok, [audio], vad=False, **kw)
        gated = transcribe_chunked(params, cfg, tok, [audio], vad=True, **kw)
        assert gated == plain


class TestStreamingVad:
    def test_silent_window_consumed_without_decode(self, tok, model):
        from whisper_context_biasing_tpu.decode.streaming import (
            StreamingTranscriber,
        )

        cfg, params = model
        calls = []

        def decode_fn(mel, ids, mask, temperature, key):
            calls.append(1)
            row = tok.encode(" hello", add_special_tokens=False)
            toks = np.full((1, 8), tok.eot, np.int32)
            toks[0, : len(row)] = row
            return GreedyResult(toks, np.asarray([len(row)], np.int32),
                                np.zeros(1, np.float32))

        st = StreamingTranscriber(
            params, cfg, tok, mel_fn=_zero_mel, decode_fn=decode_fn,
            temperatures=(0.0,), use_timestamps=False, vad=True)
        st.feed(_audio(("sil", 30)))     # full silent window: skipped
        assert calls == [] and st.segments == []
        st.feed(_audio(("sp", 30)))      # full speech window: decoded
        assert len(calls) == 1
        # the skipped window still advanced stream time: segment at ~30 s
        assert st.segments and 29.0 < st.segments[0][0] < 31.0


class TestClipTimestamps:
    """Explicit (start_s, end_s) ranges through the same vad= plumbing:
    decode ONLY those ranges (the clip_timestamps idiom)."""

    def test_resolve_ranges(self):
        a = np.zeros(SAMPLE_RATE * 100, np.float32)
        segs = resolve_vad([(0, 30), (65, 90)], a)
        assert segs == [(0, 30 * SAMPLE_RATE),
                        (65 * SAMPLE_RATE, 90 * SAMPLE_RATE)]
        # overlapping/unsorted ranges merge; out-of-file tails clamp
        assert resolve_vad([(50, 120), (10, 60)], a) == [
            (10 * SAMPLE_RATE, 100 * SAMPLE_RATE)]
        assert resolve_vad([], a) is None          # empty = no gating
        with pytest.raises(ValueError, match="end must exceed start"):
            resolve_vad([(30, 30)], a)

    def test_long_form_decodes_only_the_clip(self, tok, model):
        """100 s of uniform speech-like audio, clip = [65, 75]: one window
        decoded, at the clip's onset."""
        cfg, params = model
        calls = []

        def decode_fn(mel, ids, mask, temperature, key):
            calls.append(1)
            row = tok.encode(" clip", add_special_tokens=False)
            toks = np.full((1, 8), tok.eot, np.int32)
            toks[0, : len(row)] = row
            return GreedyResult(toks, np.asarray([len(row)], np.int32),
                                np.zeros(1, np.float32))

        audio = _audio(("sp", 100))
        _, segs = transcribe_long_batch(
            params, cfg, tok, [audio], temperatures=(0.0,),
            decode_fn=decode_fn, mel_fn=_zero_mel, vad=[(65.0, 75.0)],
            return_segments=True)
        assert len(calls) == 1
        assert len(segs[0]) == 1 and 64.0 < segs[0][0][0] < 66.0


class TestReviewRegressions:
    def test_two_level_speech_never_gated(self):
        """Loud talker then quiet talker, NO silence: the percentile noise
        floor sits on the quiet speech — the dynamic-range guard must treat
        the whole file as speech rather than clip the quiet half."""
        loud = (RNG.standard_normal(SAMPLE_RATE * 35) * 0.11).astype(np.float32)
        quiet = (RNG.standard_normal(SAMPLE_RATE * 35) * 0.025).astype(np.float32)
        a = np.concatenate([loud, quiet])
        segs = speech_segments(a)
        assert segs == [(0, len(a))]

    def test_silence_still_gated_with_quiet_speech(self):
        """True silence + loud and quiet speech: the quiet talker survives
        the gate (absolute floor_db protects it), the silence does not."""
        a = _audio(("sil", 40), ("sp", 10)) * 1.0
        quiet = (RNG.standard_normal(SAMPLE_RATE * 10) * 0.02).astype(np.float32)
        a = np.concatenate([a, quiet])
        segs = speech_segments(a)
        assert segs and segs[0][0] > SAMPLE_RATE * 39
        # both talkers covered
        assert segs[-1][1] > SAMPLE_RATE * 55
        assert not has_speech(segs, 0, SAMPLE_RATE * 39)

    def test_empty_dict_means_default_vad(self, tok, model):
        """vad={} is the documented 'defaults' form and must gate exactly
        like vad=True (a falsy-dict guard would silently disable it)."""
        cfg, params = model
        calls = []

        def decode_fn(mel, ids, mask, temperature, key):
            calls.append(1)
            toks = np.full((1, 4), tok.eot, np.int32)
            return GreedyResult(toks, np.zeros(1, np.int32),
                                np.zeros(1, np.float32))

        audio = _audio(("sil", 65), ("sp", 10))
        transcribe_long_batch(params, cfg, tok, [audio], temperatures=(0.0,),
                              decode_fn=decode_fn, mel_fn=_zero_mel, vad={})
        assert len(calls) == 1  # gated: one window, not three

    def test_streaming_rejects_clip_ranges(self, tok, model):
        from whisper_context_biasing_tpu.decode.streaming import (
            StreamingTranscriber,
        )

        cfg, params = model
        with pytest.raises(ValueError, match="not .*meaningful for a stream"):
            StreamingTranscriber(params, cfg, tok, vad=[(0.0, 30.0)],
                                 mel_fn=_zero_mel)

    def test_frame_rms_db_linear_memory_matches_gather(self):
        """The cumsum implementation must match the direct framed compute."""
        a = _audio(("sil", 1), ("sp", 2), ("sil", 0.5))
        db = frame_rms_db(a)
        frame, hop = 400, 160
        n = 1 + (len(a) - frame) // hop
        idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
        ref = 20.0 * np.log10(
            np.maximum(np.sqrt(np.mean(a[idx] ** 2, axis=1)), 1e-5))
        np.testing.assert_allclose(db, ref, rtol=1e-4, atol=1e-3)
