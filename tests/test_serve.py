"""Server engine unit tests (no HTTP, no TPU): long-form routing, the
result-dict contract, and the per-request language/task/word-timestamp
options added to scripts/serve.py."""

import importlib.util
import os
import sys
from argparse import Namespace

import numpy as np
import pytest

from whisper_context_biasing_tpu.audio import pad_or_trim
from whisper_context_biasing_tpu.audio.mel import N_SAMPLES
from whisper_context_biasing_tpu.data.collator import SpeechSeq2SeqCollator
from whisper_context_biasing_tpu.decode import (
    decode_batch,
    detect_language,
    find_word_timestamps,
    transcribe_chunked,
    transcribe_long_batch,
)
from whisper_context_biasing_tpu.models import init_params, tiny_test_config
from whisper_context_biasing_tpu.tokenizer import load_tokenizer


def _load_serve():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "serve.py")
    spec = importlib.util.spec_from_file_location("serve_mod", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["serve_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def _make_engine(multilingual=False):
    """An Engine wired by hand around the tiny CPU config (the real
    constructor builds a TPU config and warms the compile)."""
    import jax.numpy as jnp

    serve = _load_serve()
    eng = serve.Engine.__new__(serve.Engine)
    eng.args = Namespace(
        batch=2, max_tokens=4, num_beams=1, bias_words=None, bias_boost=0.0,
        timestamps=False, no_long_form=False,
        temperatures=[0.0], logprob_threshold=float("nan"),
        long_chunked=False, chunked_batch=4,
    )
    eng.jnp = jnp
    eng.cfg = tiny_test_config(
        n_vocab=51865 if multilingual else 51864, multilingual=multilingual)
    eng.params = init_params(eng.cfg, 0)
    eng.tokenizer = load_tokenizer(multilingual=multilingual)
    eng.collator = SpeechSeq2SeqCollator(
        pad_token_id=eng.tokenizer.pad_token_id,
        decoder_start_token_id=eng.tokenizer.sot,
        bias_span_pad_id=eng.tokenizer.eot,
    )
    eng.mesh = None
    eng.medusa = None
    eng.draft_params = eng.draft_cfg = None
    eng.pad_or_trim = pad_or_trim
    import threading

    eng.streams = {}
    eng.streams_lock = threading.Lock()

    def mel_fn(chunk, n_mels=80):
        r = np.random.default_rng(int(abs(np.asarray(chunk)).sum() * 1e3) % 2**31)
        return jnp.asarray(
            (r.standard_normal((np.asarray(chunk).shape[0], 80, 128)) * 0.5)
            .astype(np.float32))

    eng.mel_fn = mel_fn
    eng.decode_batch = decode_batch
    eng.detect_language = detect_language
    eng.find_word_timestamps = find_word_timestamps
    eng.transcribe_long_batch = transcribe_long_batch
    eng.transcribe_chunked = transcribe_chunked
    return eng


@pytest.fixture(scope="module")
def engine():
    return _make_engine()


@pytest.fixture(scope="module")
def ml_engine():
    return _make_engine(multilingual=True)


class TestServeSpeculative:
    @pytest.mark.slow
    def test_run_with_draft_matches_plain(self):
        """Engine._run with a draft model returns exactly the plain greedy
        texts (speculative decode is output-invariant)."""
        plain = _make_engine()
        spec = _make_engine()
        spec.draft_cfg = tiny_test_config(
            n_audio_layers=1, n_text_layers=1, d_model=32, n_heads=2)
        spec.draft_params = init_params(spec.draft_cfg, 5)
        spec.args.spec_k = 3
        audios = [np.ones(8000, np.float32) * 0.1,
                  np.ones(16000, np.float32) * 0.2]
        ref = plain._run(audios, [None, None], [None, None])
        got = spec._run(audios, [None, None], [None, None])
        assert [r["text"] for r in got] == [r["text"] for r in ref]


class TestServeLongForm:
    def test_run_long_returns_result_per_request(self, engine):
        audios = [np.ones(N_SAMPLES + 16000, np.float32) * 0.1,  # 31 s
                  np.ones(8000, np.float32) * 0.2]               # 0.5 s
        results = engine._run_long(audios, [None, None], [None, None])
        assert len(results) == 2
        assert all(isinstance(r["text"], str) for r in results)

    def test_run_long_pads_to_static_batch(self, engine):
        # a single long request must still work (batch padded internally)
        results = engine._run_long([np.ones(N_SAMPLES + 100, np.float32)],
                                   [None], [None])
        assert len(results) == 1

    def test_run_long_with_context_and_bias(self, engine):
        audios = [np.ones(N_SAMPLES + 100, np.float32) * 0.1]
        results = engine._run_long(audios, ["aspirin for pain"], [["aspirin"]])
        assert len(results) == 1

    def test_worker_routing_threshold(self):
        """The worker routes on raw sample count: >480000 == long-form."""
        assert N_SAMPLES == 480000


@pytest.mark.slow
class TestServeMedusa:
    def test_medusa_engine_matches_plain(self, engine):
        """serve's short-form path with Medusa heads returns the same
        transcripts as the plain greedy path."""
        from whisper_context_biasing_tpu.models import init_medusa_params

        audios = [np.ones(8000, np.float32), np.zeros(4000, np.float32)]
        plain = engine._run(audios, [None, None], [None, None])
        engine.medusa = init_medusa_params(engine.cfg, 2, 0)
        try:
            got = engine._run(audios, [None, None], [None, None])
        finally:
            engine.medusa = None
        assert [r["text"] for r in got] == [r["text"] for r in plain]


@pytest.mark.slow
class TestServeLongChunked:
    def test_chunked_routing_and_contract(self, engine):
        """--long_chunked routes >30 s batches through the parallel-window
        decoder; result dicts keep the same contract."""
        engine.args.long_chunked = True
        try:
            audios = [np.ones(N_SAMPLES + 100, np.float32),
                      np.ones(1000, np.float32)]
            results = engine._run_long(audios, [None, None], [None, None])
            assert len(results) == 2
            assert all("text" in r for r in results)
            # context + bias compose
            results = engine._run_long(audios, ["aspirin for pain", None],
                                       [["aspirin"], None])
            assert len(results) == 2
        finally:
            engine.args.long_chunked = False

    def test_int16_request_matches_float(self, engine):
        """A raw int16 long request (the handler's keep_int16 path) produces
        the same transcript as its float32 view."""
        engine.args.long_chunked = True
        try:
            rng = np.random.default_rng(11)
            pcm = (rng.standard_normal(N_SAMPLES + 4000) * 6000).astype(
                np.int16)
            as_float = pcm.astype(np.float32) / 32768.0
            ri = engine._run_long([pcm], [None], [None])
            rf = engine._run_long([as_float], [None], [None])
            assert ri[0]["text"] == rf[0]["text"]
        finally:
            engine.args.long_chunked = False

    def test_words_request_served_chunked(self, engine):
        """A word-timestamps request stays on the chunked path (batched DTW
        per decode call) and the result dicts carry word entries."""
        engine.args.long_chunked = True
        called = {"chunked": False}
        orig = engine.transcribe_chunked

        def spy(*a, **k):
            called["chunked"] = True
            return orig(*a, **k)

        engine.transcribe_chunked = spy
        try:
            results = engine._run_long(
                [np.ones(N_SAMPLES + 100, np.float32)], [None], [None],
                opts=[{"words": True}])
            assert len(results) == 1
            assert called["chunked"]
            assert all(set(w) == {"word", "start", "end", "probability"}
                       for w in results[0].get("words", []))
        finally:
            engine.args.long_chunked = False
            engine.transcribe_chunked = orig


@pytest.mark.slow
class TestServeOptions:
    def test_short_form_result_dicts(self, engine):
        audios = [np.ones(8000, np.float32) * 0.1] * 2
        results = engine._run(audios, [None, None], [None, None])
        assert len(results) == 2 and all("text" in r for r in results)
        assert all("words" not in r for r in results)

    def test_word_timestamps_option(self, engine):
        audios = [np.ones(8000, np.float32) * 0.1] * 2
        results = engine._run(audios, [None, None], [None, None],
                              opts=[{"words": True}, {}])
        assert "words" in results[0] and "words" not in results[1]
        for w in results[0]["words"]:
            assert set(w) == {"word", "start", "end", "probability"}
            assert 0.0 <= w["start"] <= w["end"] <= 8000 / 16000 + 1e-6

    def test_language_forced(self, ml_engine):
        audios = [np.ones(8000, np.float32) * 0.1] * 2
        results = ml_engine._run(audios, [None, None], [None, None],
                                 opts=[{"language": "fr"}, {}])
        assert results[0].get("language") == "fr"
        assert "language" not in results[1]

    def test_language_auto_detects(self, ml_engine):
        from whisper_context_biasing_tpu.tokenizer.whisper_tokenizer import (
            LANGUAGES,
        )

        audios = [np.ones(8000, np.float32) * 0.1]
        results = ml_engine._run(audios, [None], [None],
                                 opts=[{"language": "auto"}])
        assert results[0]["language"] in LANGUAGES

    def test_translate_task_implies_detection(self, ml_engine):
        from whisper_context_biasing_tpu.tokenizer.whisper_tokenizer import (
            LANGUAGES,
        )

        audios = [np.ones(8000, np.float32) * 0.1]
        results = ml_engine._run(audios, [None], [None],
                                 opts=[{"task": "translate"}])
        assert results[0]["language"] in LANGUAGES

    def test_unknown_language_raises(self, ml_engine):
        audios = [np.ones(8000, np.float32) * 0.1]
        with pytest.raises(ValueError, match="unknown language"):
            ml_engine._run(audios, [None], [None], opts=[{"language": "zz"}])

    def test_language_ignored_on_english_model(self, engine):
        audios = [np.ones(8000, np.float32) * 0.1]
        results = engine._run(audios, [None], [None],
                              opts=[{"language": "fr"}])
        assert "language" not in results[0]


@pytest.mark.slow
class TestStreamingSessions:
    def test_stream_lifecycle(self, engine):
        sid = engine.stream_start()
        assert isinstance(sid, str) and len(sid) == 16
        win = engine.cfg.n_audio_ctx * 320  # StreamingTranscriber default
        # the engine streams at the standard 30 s window; feed less: buffered
        out = engine.stream_feed(sid, np.zeros(16000, np.float32))
        assert out["segments"] == []
        assert out["buffered_seconds"] == 1.0
        fin = engine.stream_end(sid)
        assert "text" in fin and isinstance(fin["segments"], list)
        with pytest.raises(KeyError):
            engine.stream_feed(sid, np.zeros(100, np.float32))

    def test_stream_with_options(self, engine):
        sid = engine.stream_start(context="clinical note",
                                  bias_words=["aspirin"])
        engine.stream_feed(sid, np.zeros(8000, np.float32))
        fin = engine.stream_end(sid)
        assert "text" in fin

    def test_stream_language_forcing(self, ml_engine):
        sid = ml_engine.stream_start(opt={"language": "fr", "task": "translate"})
        st, _, _ = ml_engine._stream(sid)
        tok = ml_engine.tokenizer
        assert st.start == [tok.sot, tok.convert_tokens_to_ids("<|fr|>"),
                            tok.translate]
        ml_engine.stream_end(sid)

    def test_stream_unknown_language_raises(self, ml_engine):
        with pytest.raises(ValueError, match="unknown language"):
            ml_engine.stream_start(opt={"language": "zz"})


@pytest.mark.slow
class TestServeLongFormWords:
    def test_long_request_honors_words_option(self, engine):
        """Regression: X-Word-Timestamps on a >30 s request was silently
        dropped by _run_long."""
        audios = [np.ones(N_SAMPLES + 16000, np.float32) * 0.1]
        results = engine._run_long(audios, [None], [None],
                                   opts=[{"words": True}])
        assert "words" in results[0]
        total = (N_SAMPLES + 16000) / 16000
        for w in results[0]["words"]:
            assert 0.0 <= w["start"] <= w["end"] <= total + 1e-6

    def test_long_request_honors_window_info_option(self, engine):
        """X-Window-Info on a >30 s request returns per-window QC dicts."""
        audios = [np.ones(N_SAMPLES + 16000, np.float32) * 0.1,
                  np.ones(N_SAMPLES + 16000, np.float32) * 0.1]
        results = engine._run_long(audios, [None, None], [None, None],
                                   opts=[{"window_info": True}, {}])
        assert "windows" in results[0] and "windows" not in results[1]
        wins = results[0]["windows"]
        assert wins and all(
            {"start_s", "temperature", "avg_logprob", "no_speech_prob",
             "compression_ratio", "accepted"} <= set(d) for d in wins)

    def test_short_request_in_long_batch_gets_no_windows(self, engine):
        """Regression: a <=30 s request asking for X-Window-Info got a
        'windows' field only when it happened to micro-batch with a >30 s
        request (the worker routes whole batches to _run_long when ANY
        member is long). The gate is per-request audio length, so response
        shape can't depend on batch composition."""
        audios = [np.ones(N_SAMPLES + 16000, np.float32) * 0.1,
                  np.ones(16000, np.float32) * 0.1]
        results = engine._run_long(audios, [None, None], [None, None],
                                   opts=[{}, {"window_info": True}])
        assert "windows" not in results[1]  # short request: never present


@pytest.mark.slow
class TestHttpHandler:
    """First HTTP-level e2e: a live ThreadingHTTPServer around the tiny
    engine — exercises the handler's audio decode, the int16 keep gate,
    option parsing and the JSON response contract (previously only the
    Engine layer was tested)."""

    def _serve(self, eng):
        import queue
        import threading
        from http.server import ThreadingHTTPServer

        from whisper_context_biasing_tpu.utils import RtfMeter

        serve = _load_serve()
        eng.args.max_wait_ms = 20  # micro-batch window (real default 50)
        eng.q = queue.Queue()
        eng.rtf = RtfMeter()
        threading.Thread(target=eng._worker, daemon=True).start()
        srv = ThreadingHTTPServer(("127.0.0.1", 0), serve.make_handler(eng))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv

    @staticmethod
    def _wav_bytes(pcm):
        import io as _io
        import wave as _wave

        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    def test_post_transcribe_short_and_int16_long(self):
        import http.client
        import json as _json

        eng = _make_engine()
        eng.args.long_chunked = True  # arms the handler's keep_int16 gate
        srv = self._serve(eng)
        try:
            port = srv.server_address[1]
            rng = np.random.default_rng(21)

            def post(body, headers=None):
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
                c.request("POST", "/transcribe", body=body,
                          headers=headers or {})
                r = c.getresponse()
                out = _json.loads(r.read())
                c.close()
                return r.status, out

            # short request (<=30 s): int16 wav converts to float before
            # the short path; response carries the result contract
            short = (rng.standard_normal(16000) * 6000).astype(np.int16)
            status, out = post(self._wav_bytes(short))
            assert status == 200
            assert "text" in out and "latency_ms" in out
            assert out["audio_seconds"] == 1.0

            # long request (>30 s): raw int16 rides the chunked path;
            # transcript matches the float view of the same audio
            pcm = (rng.standard_normal(N_SAMPLES + 16000) * 6000).astype(
                np.int16)
            status, out_i = post(self._wav_bytes(pcm))
            assert status == 200
            eng2_audio = pcm.astype(np.float32) / 32768.0
            ref = eng._run_long([eng2_audio], [None], [None])
            assert out_i["text"] == ref[0]["text"]

            # bad option -> 400 with an error, not a worker crash
            status, out = post(self._wav_bytes(short),
                               {"X-Task": "summarize"})
            assert status == 400 and "error" in out
        finally:
            srv.shutdown()
            eng.q.put(None)  # worker shutdown sentinel — no thread outlives
                             # this test (later modules compile under XLA;
                             # keep the process single-threaded for them)
            eng.args.long_chunked = False


class TestAudioBytesRouting:
    def test_wav_magic(self):
        import io as _io
        import wave as _wave

        serve = _load_serve()
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(np.zeros(1600, np.int16).tobytes())
        sig = serve.decode_audio_bytes(buf.getvalue())
        assert sig.shape == (1600,)

    def test_unknown_container_rejected(self):
        serve = _load_serve()
        with pytest.raises(ValueError, match="unsupported audio container"):
            serve.decode_audio_bytes(b"\x00\x01\x02\x03" * 100)

    def test_keep_int16_passthrough_and_fallbacks(self):
        """keep_int16 returns raw PCM only for mono 16-bit 16 kHz WAVs;
        stereo (needs downmix) falls back to the float32 contract."""
        import io as _io
        import wave as _wave

        serve = _load_serve()
        pcm = (np.arange(1600) % 700 - 350).astype(np.int16)
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        raw = serve.decode_audio_bytes(buf.getvalue(), keep_int16=True)
        assert raw.dtype == np.int16
        np.testing.assert_array_equal(raw, pcm)
        # default stays float
        f = serve.decode_audio_bytes(buf.getvalue())
        assert f.dtype == np.float32
        np.testing.assert_allclose(f, pcm.astype(np.float32) / 32768.0)
        # stereo needs a downmix -> float path even with keep_int16
        inter = np.empty(2 * len(pcm), np.int16)
        inter[0::2] = pcm
        inter[1::2] = pcm
        buf2 = _io.BytesIO()
        with _wave.open(buf2, "wb") as w:
            w.setnchannels(2); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(inter.tobytes())
        assert serve.decode_audio_bytes(
            buf2.getvalue(), keep_int16=True).dtype == np.float32

    def test_mp3_magic_routes_to_decoder(self, tmp_path):
        serve = _load_serve()
        from whisper_context_biasing_tpu.audio.mp3 import available

        if not available():
            pytest.skip("no mpg123 on this host")
        from test_mp3 import _find_lame, lame_encode

        if _find_lame() is None:
            pytest.skip("no lame encoder to synthesize a fixture")
        path = str(tmp_path / "t.mp3")
        t = np.arange(16000) / 16000.0
        lame_encode(path, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
                    16000)
        sig = serve.decode_audio_bytes(open(path, "rb").read())
        assert sig.ndim == 1 and len(sig) > 8000
