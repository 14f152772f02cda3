"""Chunked (parallel-window) long-form decode: layout tiling, LCS merge,
segment ownership, temperature fallback, silence rule (decode/chunked.py).

Control flow is driven through an injected ``decode_fn`` (scripted outputs,
the test pattern of tests/test_long_form.py); a real-model smoke over the
greedy path runs in the slow lane."""

import numpy as np
import pytest

from whisper_context_biasing_tpu.audio.mel import N_SAMPLES, SAMPLE_RATE
from whisper_context_biasing_tpu.decode.chunked import (
    chunk_layout,
    merge_longest_common_sequence,
    split_token_segments,
    transcribe_chunked,
)
from whisper_context_biasing_tpu.decode.greedy import GreedyResult
from whisper_context_biasing_tpu.models import init_params, tiny_test_config
from whisper_context_biasing_tpu.tokenizer import load_tokenizer


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer()


def _enc(tok, text):
    return tok.encode(text, add_special_tokens=False)


def _ts(tok, seconds):
    return tok.timestamp_begin + int(round(seconds / 0.02))


def _result(rows, eot=50256, sum_logprob=None, width=64, no_speech=None):
    toks = np.full((len(rows), width), eot, np.int32)
    lens = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        toks[i, : len(r)] = r
        lens[i] = len(r)
    slp = (np.zeros(len(rows), np.float32) if sum_logprob is None
           else np.asarray(sum_logprob, np.float32))
    nsp = None if no_speech is None else np.asarray(no_speech, np.float32)
    return GreedyResult(toks, lens, slp, nsp)


class TestChunkLayout:
    def test_short_audio_single_window(self):
        assert chunk_layout(1000, N_SAMPLES) == [(0, 0, 1000)]
        assert chunk_layout(N_SAMPLES, N_SAMPLES) == [(0, 0, N_SAMPLES)]

    def test_cores_tile_exactly(self):
        for n in (N_SAMPLES + 1, int(2.5 * N_SAMPLES), 10 * N_SAMPLES + 777):
            layout = chunk_layout(n, N_SAMPLES)
            assert layout[0][1] == 0
            assert layout[-1][2] == n
            for (s, c0, c1), (s2, d0, d1) in zip(layout, layout[1:]):
                assert c1 == d0  # contiguous, no gap, no overlap
                assert s2 > s
            for s, c0, c1 in layout:
                assert s <= c0 and c1 <= s + N_SAMPLES
                assert c0 < c1

    def test_stride_bounds(self):
        with pytest.raises(ValueError, match="stride too large"):
            chunk_layout(10 * N_SAMPLES, N_SAMPLES, N_SAMPLES // 2)

    def test_interior_core_keeps_stride_margin(self):
        stride = N_SAMPLES // 6
        layout = chunk_layout(10 * N_SAMPLES, N_SAMPLES, stride)
        for s, c0, c1 in layout[1:-1]:
            assert c0 - s >= stride
            assert (s + N_SAMPLES) - c1 >= stride


class TestLCSMerge:
    def test_exact_overlap_dedup(self):
        a = [1, 2, 3, 4, 5, 6]
        b = [4, 5, 6, 7, 8]
        assert merge_longest_common_sequence([a, b]) == [1, 2, 3, 4, 5, 6, 7, 8]

    def test_no_overlap_concatenates(self):
        a = [1, 2, 3]
        b = [7, 8, 9]
        assert merge_longest_common_sequence([a, b]) == [1, 2, 3, 7, 8, 9]

    def test_disagreement_resolves_once(self):
        # overlap region disagrees in one token: merged keeps exactly one
        # reading and exactly the overlap length
        a = [1, 2, 3, 10, 5, 6]
        b = [3, 4, 5, 6, 7, 8]
        m = merge_longest_common_sequence([a, b])
        assert m[:3] == [1, 2, 3]
        assert m[-2:] == [7, 8]
        assert len(m) == len(set(range(1, 9))) or len(m) == 8

    def test_three_way(self):
        a = [1, 2, 3, 4]
        b = [3, 4, 5, 6]
        c = [5, 6, 7, 8]
        assert merge_longest_common_sequence([a, b, c]) == list(range(1, 9))

    def test_empties(self):
        assert merge_longest_common_sequence([]) == []
        assert merge_longest_common_sequence([[], [1, 2]]) == [1, 2]
        assert merge_longest_common_sequence([[1, 2], []]) == [1, 2]


class TestSplitTokenSegments:
    def test_round_trip_with_bounds(self, tok):
        words = _enc(tok, " hello there")
        row = ([_ts(tok, 0.0)] + words + [_ts(tok, 2.0), _ts(tok, 2.0)]
               + _enc(tok, " again") + [_ts(tok, 4.0)])
        segs = split_token_segments(row, tok)
        assert len(segs) == 2
        (t0, t1, toks0), (t2, t3, toks1) = segs
        assert (t0, t1) == (0.0, 2.0)
        assert (t2, t3) == (2.0, 4.0)
        assert toks0[0] == _ts(tok, 0.0) and toks0[-1] == _ts(tok, 2.0)
        assert toks0[1:-1] == words

    def test_trailing_partial(self, tok):
        row = [_ts(tok, 1.0)] + _enc(tok, " partial")
        segs = split_token_segments(row, tok)
        assert len(segs) == 1
        assert segs[0][0] == 1.0 and segs[0][1] is None


class TestTranscribeChunked:
    def test_single_window_passthrough(self, tok):
        """A short file decodes exactly once, full row kept."""
        words = _enc(tok, " aspirin daily")
        row = [_ts(tok, 0.0)] + words + [_ts(tok, 2.0)]
        calls = []

        def decode_fn(mel, ids, mask, temperature, key):
            calls.append(mel.shape[0])
            return _result([row] * mel.shape[0])

        outs, segs = transcribe_chunked(
            None, tiny_test_config(), tok, [np.ones(16000, np.float32)],
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
            decode_fn=decode_fn, temperatures=(0.0,),
            logprob_threshold=None, no_speech_threshold=None,
            return_segments=True)
        assert calls == [1]
        assert outs[0] == row
        assert segs[0] == [(0.0, 2.0, " aspirin daily")]

    def test_segment_ownership_unique(self, tok):
        """Two overlapping windows both see a segment in the overlap; core
        ownership emits it exactly once, at absolute time."""
        n = int(1.5 * N_SAMPLES)
        layout = chunk_layout(n, N_SAMPLES)
        assert len(layout) == 2
        (s0, a0, a1), (s1, b0, b1) = layout
        # a segment starting inside window-1's core, also visible late in
        # window 0 (past window-0's core end)
        t_abs = (b0 / SAMPLE_RATE) + 1.0
        w0_rel = t_abs - s0 / SAMPLE_RATE
        w1_rel = t_abs - s1 / SAMPLE_RATE
        words = _enc(tok, " overlap segment")
        early = [_ts(tok, 0.0)] + _enc(tok, " early part") + [_ts(tok, 2.0)]
        row0 = early + [_ts(tok, w0_rel)] + words + [_ts(tok, w0_rel + 1.5)]
        row1 = [_ts(tok, w1_rel)] + words + [_ts(tok, w1_rel + 1.5)]

        def decode_fn(mel, ids, mask, temperature, key):
            assert mel.shape[0] == 2  # both windows in ONE batch
            return _result([row0, row1])

        outs, segs = transcribe_chunked(
            None, tiny_test_config(), tok,
            [np.ones(n, np.float32)],
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
            decode_fn=decode_fn, temperatures=(0.0,),
            logprob_threshold=None, no_speech_threshold=None,
            return_segments=True)
        texts = [t for _, _, t in segs[0]]
        assert texts.count(" overlap segment") == 1
        assert texts.count(" early part") == 1
        seg = next(s for s in segs[0] if s[2] == " overlap segment")
        assert seg[0] == pytest.approx(t_abs, abs=0.02)
        # window 0 contributed "early part"; window 1 owns the overlap seg
        assert outs[0] == early + row1

    def test_temperature_fallback_batched(self, tok):
        """A failing window is re-decoded at the next rung; rungs are whole
        batch calls (parallelism preserved)."""
        loop = _enc(tok, " the same words") * 30
        good = [_ts(tok, 0.0)] + _enc(tok, " clean text") + [_ts(tok, 2.0)]
        seen = []

        def decode_fn(mel, ids, mask, temperature, key):
            seen.append(temperature)
            if temperature == 0.0:
                return _result([loop], width=len(loop) + 4)
            return _result([good], width=len(loop) + 4)

        outs = transcribe_chunked(
            None, tiny_test_config(), tok, [np.ones(1000, np.float32)],
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
            decode_fn=decode_fn, temperatures=(0.0, 0.4),
            logprob_threshold=None, no_speech_threshold=None)
        assert seen == [0.0, 0.4]
        assert outs[0] == good

    def test_silence_rule_drops_window(self, tok):
        row = [_ts(tok, 0.0)] + _enc(tok, " ghost text") + [_ts(tok, 2.0)]

        def decode_fn(mel, ids, mask, temperature, key):
            return _result([row], sum_logprob=[-50.0], no_speech=[0.95])

        outs = transcribe_chunked(
            None, tiny_test_config(), tok, [np.ones(1000, np.float32)],
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
            decode_fn=decode_fn, temperatures=(0.0,),
            compression_ratio_threshold=None,
            logprob_threshold=-1.0, no_speech_threshold=0.6)
        assert outs[0] == []

    def test_multi_file_flattening_and_max_batch(self, tok):
        """Windows of several files flatten into capped batches."""
        n_long = int(2.2 * N_SAMPLES)  # 3 windows
        shapes = []
        row = [_ts(tok, 0.0)] + _enc(tok, " x") + [_ts(tok, 1.0)]

        def decode_fn(mel, ids, mask, temperature, key):
            shapes.append(mel.shape[0])
            return _result([row] * mel.shape[0])

        outs = transcribe_chunked(
            None, tiny_test_config(), tok,
            [np.ones(n_long, np.float32), np.ones(1000, np.float32)],
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
            decode_fn=decode_fn, temperatures=(0.0,), max_batch=2,
            logprob_threshold=None, no_speech_threshold=None)
        assert shapes == [2, 2]  # 4 windows total, capped at 2 per call
        assert len(outs) == 2 and outs[1] == row

    def test_pad_batches_stable_shapes(self, tok):
        """pad_batches=True pads every decode call to max_batch (one
        compiled program for any window count); pad rows never force
        temperature retries or leak into outputs."""
        loop = _enc(tok, " same words") * 30  # would fail quality checks
        good = [_ts(tok, 0.0)] + _enc(tok, " fine") + [_ts(tok, 1.0)]
        shapes, temps = [], []

        def decode_fn(mel, ids, mask, temperature, key):
            shapes.append(mel.shape[0])
            temps.append(temperature)
            rows = [good] * 2 + [loop] * (mel.shape[0] - 2)  # pads decode junk
            return _result(rows, width=len(loop) + 4)

        n = int(1.5 * N_SAMPLES)  # 2 windows
        outs = transcribe_chunked(
            None, tiny_test_config(), tok, [np.ones(n, np.float32)],
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
            decode_fn=decode_fn, temperatures=(0.0, 0.4), max_batch=8,
            pad_batches=True,
            logprob_threshold=None, no_speech_threshold=None)
        assert shapes == [8]          # padded to max_batch
        assert temps == [0.0]         # junk pad rows did not trigger rung 2
        assert outs[0]                # real rows emitted

    def test_lcs_mode_no_timestamps(self, tok):
        a = _enc(tok, " the patient took aspirin and felt")
        b = _enc(tok, " aspirin and felt better afterwards")

        def decode_fn(mel, ids, mask, temperature, key):
            rows = [a, b][: mel.shape[0]]
            return _result(rows, width=64)

        n = int(1.5 * N_SAMPLES)
        outs = transcribe_chunked(
            None, tiny_test_config(), tok, [np.ones(n, np.float32)],
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
            decode_fn=decode_fn, temperatures=(0.0,),
            use_timestamps=False,
            logprob_threshold=None, no_speech_threshold=None)
        text = tok.decode(outs[0], skip_special_tokens=True)
        assert "aspirin and felt" in text
        assert text.count("aspirin") == 1


class TestDeviceWindows:
    def test_device_and_host_windows_bit_match(self, tok):
        """device_windows=True gathers the SAME float32 samples the host
        path copies: with a mel that hashes the raw window bytes, the two
        paths must produce identical transcripts (and the real default mel
        sees identical inputs)."""
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        win = cfg.n_audio_ctx * 320
        rng = np.random.default_rng(3)
        # two files: one 2.6 windows long (overlapped layout + tail padding),
        # one shorter than a window (zero-padded tail)
        audios = [rng.standard_normal(int(win * 2.6)).astype(np.float32),
                  rng.standard_normal(win // 3).astype(np.float32)]
        seen: list[np.ndarray] = []

        def mel_fn(chunk):
            c = np.asarray(chunk)
            seen.append(c.copy())
            out = np.zeros((c.shape[0], 80, 128), np.float32)
            # fold the window bytes into the mel so any sample mismatch
            # changes the decode input
            out += c.sum(axis=1, dtype=np.float64).astype(np.float32)[
                :, None, None] * 1e-3
            return out

        kw = dict(mel_fn=mel_fn, max_new=4, temperatures=(0.0,),
                  logprob_threshold=None, no_speech_threshold=None,
                  compression_ratio_threshold=None, window_samples=win,
                  use_timestamps=False)
        host = transcribe_chunked(params, cfg, tok, audios,
                                  device_windows=False, **kw)
        host_chunks = [c for c in seen]
        seen.clear()
        dev = transcribe_chunked(params, cfg, tok, audios,
                                 device_windows=True, **kw)
        assert dev == host
        assert len(seen) == len(host_chunks)
        for a, b in zip(seen, host_chunks):
            np.testing.assert_array_equal(a, b)

    def test_pad_batch_rows_gather_zeros(self, tok):
        """pad_batches rows point at the zero pad region, matching the host
        path's zero rows exactly."""
        cfg = tiny_test_config()
        win = cfg.n_audio_ctx * 320
        audio = np.ones(win // 2, np.float32) * 0.1
        seen = []

        def mel_fn(chunk):
            seen.append(np.asarray(chunk))
            return np.zeros((np.asarray(chunk).shape[0], 80, 128), np.float32)

        def decode_fn(mel, ids, mask, temperature, key):
            return _result([[tok.eot]] * np.asarray(mel).shape[0])

        transcribe_chunked(
            None, cfg, tok, [audio], decode_fn=decode_fn, mel_fn=mel_fn,
            temperatures=(0.0,), logprob_threshold=None,
            no_speech_threshold=None, window_samples=win,
            max_batch=4, pad_batches=True, device_windows=True)
        assert seen[0].shape == (4, win)
        np.testing.assert_array_equal(seen[0][1:], 0.0)  # pad rows all-zero
        np.testing.assert_array_equal(seen[0][0, : win // 2], audio)
        np.testing.assert_array_equal(seen[0][0, win // 2:], 0.0)

    @pytest.mark.parametrize("device_windows", [True, False])
    def test_int16_audio_bit_matches_float(self, tok, device_windows):
        """int16 PCM input decodes identically to its float32 (i16/32768)
        view on both paths: the device gather normalizes on-chip with an
        exact power-of-two scale, the host path normalizes at entry."""
        cfg = tiny_test_config()
        win = cfg.n_audio_ctx * 320
        rng = np.random.default_rng(7)
        pcm = (rng.standard_normal(int(win * 1.7)) * 8000).astype(np.int16)
        as_float = pcm.astype(np.float32) / 32768.0
        seen: list[np.ndarray] = []

        def mel_fn(chunk):
            c = np.asarray(chunk)
            seen.append(c.copy())
            out = np.zeros((c.shape[0], 80, 128), np.float32)
            out += c.sum(axis=1, dtype=np.float64).astype(np.float32)[
                :, None, None] * 1e-3
            return out

        params = init_params(cfg, 0)
        kw = dict(mel_fn=mel_fn, max_new=4, temperatures=(0.0,),
                  logprob_threshold=None, no_speech_threshold=None,
                  compression_ratio_threshold=None, window_samples=win,
                  use_timestamps=False, device_windows=device_windows)
        got_f = transcribe_chunked(params, cfg, tok, [as_float], **kw)
        f_chunks = list(seen)
        seen.clear()
        got_i = transcribe_chunked(params, cfg, tok, [pcm], **kw)
        assert got_i == got_f
        assert all(c.dtype == np.float32 for c in seen)
        for a, b in zip(seen, f_chunks):
            np.testing.assert_array_equal(a, b)


@pytest.mark.slow
class TestChunkedWordTimestamps:
    def test_words_owned_once_absolute_times(self, tok):
        """word_timestamps=True aligns every window batch and assigns each
        word to exactly one core, in absolute file time."""
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        win = cfg.n_audio_ctx * 320

        def mel_fn(chunk):
            r = np.random.default_rng(
                int(abs(np.asarray(chunk)).sum() * 1e3) % 2**31)
            return (r.standard_normal((np.asarray(chunk).shape[0], 80, 128))
                    * 0.5).astype(np.float32)

        audios = [np.ones(int(win * 1.6), np.float32) * 0.1]
        out = transcribe_chunked(
            params, cfg, tok, audios, mel_fn=mel_fn, max_new=5,
            temperatures=(0.0,), logprob_threshold=None,
            no_speech_threshold=None, compression_ratio_threshold=None,
            window_samples=win, use_timestamps=False,
            return_segments=True, word_timestamps=True)
        hyps, segs, words = out
        assert len(words) == 1
        dur = len(audios[0]) / 16000
        for w in words[0]:
            assert 0.0 <= w.start <= w.end <= dur + 1.0
        starts = [w.start for w in words[0]]
        assert starts == sorted(starts)


@pytest.mark.slow
class TestRealModel:
    def test_real_greedy_smoke(self, tok):
        """The default decode path (no injected decode_fn) over a tiny
        model: multi-window file + short file, bias spans attached."""
        cfg = tiny_test_config()
        params = init_params(cfg, 0)

        def mel_fn(chunk):
            r = np.random.default_rng(int(abs(chunk).sum() * 1e3) % 2**31)
            return (r.standard_normal((chunk.shape[0], 80, 128)) * 0.5
                    ).astype(np.float32)

        spans = np.full((2, 2, 3), tok.eot, np.int32)
        spans[0, 0, :2] = [500, 501]
        audios = [np.ones(int(2.2 * N_SAMPLES), np.float32) * 0.1,
                  np.ones(N_SAMPLES // 2, np.float32) * 0.2]
        outs = transcribe_chunked(
            params, cfg, tok, audios, mel_fn=mel_fn, max_new=4,
            temperatures=(0.0,), bias_spans=spans, bias_boost=1.0,
            logprob_threshold=None)
        assert len(outs) == 2
        assert all(isinstance(o, list) for o in outs)


class TestChunkedBestOf:
    def test_sampled_rung_draws_n_and_picks_best(self, tok):
        """best_of applies per window batch: the 0.5 rung runs 3 times and
        the best average-logprob candidate wins (decode/long_form.
        sample_best_of shared with the sequential loop)."""
        calls = []

        def decode_fn(mel, ids, mask, temperature, key):
            calls.append(float(temperature))
            b = mel.shape[0]
            if temperature == 0.0:
                return _result([_enc(tok, " junk")] * b,
                               sum_logprob=[-100.0] * b)
            i = sum(1 for t in calls if t > 0)
            return _result([_enc(tok, f" pick {i}")] * b,
                           sum_logprob=[-0.4 if i == 2 else -7.0] * b)

        outs = transcribe_chunked(
            None, tiny_test_config(), tok, [np.zeros(16000, np.float32)],
            mel_fn=lambda c: np.zeros((c.shape[0], 80, 128), np.float32),
            decode_fn=decode_fn, temperatures=(0.0, 0.5), best_of=3,
            no_speech_threshold=None, use_timestamps=False)
        assert calls == [0.0, 0.5, 0.5, 0.5]
        assert tok.decode(outs[0], skip_special_tokens=True) == " pick 2"
