"""Beam-search tests: k=1 must equal greedy; scores are exact sequence
log-probs; bias boost steers beams; prefetch pipeline integrity."""

import numpy as np
import pytest
import jax.numpy as jnp

from whisper_context_biasing_tpu.decode import (
    beam_decode,
    beam_decode_batch,
    greedy_decode,
    pack_prefixes,
)
from whisper_context_biasing_tpu.models import (
    decode_tokens,
    encode_audio,
    init_params,
    tiny_test_config,
)
from whisper_context_biasing_tpu.tokenizer import load_tokenizer

EOT = 50256


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = init_params(cfg, 0)
    rng = np.random.default_rng(0)
    mel = (rng.standard_normal((2, 80, 128)) * 0.5).astype(np.float32)
    return cfg, params, mel


def seq_logprob(params, cfg, mel_row, prefix, tokens):
    """Exact log-prob of `tokens` after `prefix` by full forward."""
    enc = encode_audio(params, cfg, jnp.asarray(mel_row[None]))
    seq = list(prefix) + list(tokens)
    logits, _ = decode_tokens(params, cfg, jnp.asarray([seq], jnp.int32), enc_out=enc)
    lp = jnp.log(jnp.exp(logits[0] - jnp.max(logits[0], -1, keepdims=True)).sum(-1))
    logp = logits[0] - jnp.max(logits[0], -1, keepdims=True) - lp[:, None]
    total = 0.0
    for t, tok in enumerate(tokens):
        total += float(logp[len(prefix) - 1 + t, tok])
    return total


@pytest.mark.slow
class TestBeam:
    def test_k1_equals_greedy(self, setup):
        cfg, params, mel = setup
        ids, mask = pack_prefixes([[50257], [50257]], EOT)
        g = greedy_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                          jnp.asarray(mask), max_new=8)
        b = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                        jnp.asarray(mask), num_beams=1, max_new=8)
        np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.best))

    def test_k1_timestamp_mode_equals_greedy(self, setup):
        """Timestamp rules under beam: at k=1 the per-beam rule masks must
        pick the same tokens as the greedy implementation (rules are applied
        to raw logits, and log_softmax preserves the argmax)."""
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg, params, mel = setup
        tok = load_tokenizer()
        ids, mask = pack_prefixes([[tok.sot], [tok.sot]], EOT)
        g = greedy_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                          jnp.asarray(mask), max_new=10,
                          timestamp_begin=tok.timestamp_begin)
        b = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                        jnp.asarray(mask), num_beams=1, max_new=10,
                        timestamp_begin=tok.timestamp_begin)
        np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.best))

    @pytest.mark.parametrize("early_stopping", ["off", "true"])
    def test_beam_timestamp_structure_valid(self, setup, early_stopping):
        """k=3 timestamp-mode beams obey the OpenAI constraints on every
        returned beam: first token is an early timestamp, timestamps never
        decrease, a closed pair is followed by text (both loop modes)."""
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg, params, mel = setup
        tok = load_tokenizer()
        ids, mask = pack_prefixes([[tok.sot], [tok.sot]], EOT)
        res = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                          jnp.asarray(mask), num_beams=3, max_new=10,
                          timestamp_begin=tok.timestamp_begin,
                          early_stopping=early_stopping)
        toks = np.asarray(res.tokens)
        for i in range(toks.shape[0]):
            for j in range(toks.shape[1]):
                row = toks[i, j].tolist()
                row = row[: row.index(EOT)] if EOT in row else row
                if not row:
                    continue  # hf pool may hold an immediate-eot hypothesis
                assert row[0] >= tok.timestamp_begin
                assert row[0] <= tok.timestamp_begin + 50
                assert tok.timestamp_begin - 1 not in row  # <|notimestamps|>
                ts = [t for t in row if t >= tok.timestamp_begin]
                assert ts == sorted(ts)
                for a, b2, c in zip(row, row[1:], row[2:]):
                    if (a >= tok.timestamp_begin and b2 >= tok.timestamp_begin
                            and c != EOT):
                        assert c < tok.timestamp_begin

    def test_scores_are_exact_logprobs(self, setup):
        cfg, params, mel = setup
        ids, mask = pack_prefixes([[50257], [50257]], EOT)
        res = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                          jnp.asarray(mask), num_beams=3, max_new=4)
        toks = np.asarray(res.tokens)
        scores = np.asarray(res.scores)
        lens = np.asarray(res.lengths)
        for i in range(2):
            for kk in range(3):
                n = int(lens[i, kk])
                seq = toks[i, kk, :n].tolist()
                if n < 4:
                    seq = seq + [EOT]  # finished: eot cost is included
                want = seq_logprob(params, cfg, mel[i], [50257], seq)
                assert scores[i, kk] == pytest.approx(want, abs=2e-3), (i, kk, seq)

    def test_beams_are_distinct_and_sorted(self, setup):
        cfg, params, mel = setup
        ids, mask = pack_prefixes([[50257], [50257]], EOT)
        res = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                          jnp.asarray(mask), num_beams=4, max_new=5)
        scores = np.asarray(res.scores)
        assert (np.diff(scores, axis=1) <= 1e-6).all()  # descending
        toks = np.asarray(res.tokens)
        for i in range(2):
            rows = {tuple(toks[i, kk].tolist()) for kk in range(4)}
            assert len(rows) == 4  # no duplicated beams

    def test_beam_at_least_greedy_score(self, setup):
        """The best beam's sequence log-prob >= the greedy sequence's."""
        cfg, params, mel = setup
        ids, mask = pack_prefixes([[50257], [50257]], EOT)
        g = greedy_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                          jnp.asarray(mask), max_new=6)
        res = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                          jnp.asarray(mask), num_beams=4, max_new=6,
                          length_penalty=0.0)  # pure logprob selection
        gt = np.asarray(g.tokens)
        glen = np.asarray(g.lengths)
        for i in range(2):
            seq = gt[i, : glen[i]].tolist()
            if len(seq) < 6:
                seq += [EOT]
            greedy_lp = seq_logprob(params, cfg, mel[i], [50257], seq)
            assert float(np.asarray(res.scores)[i, 0]) >= greedy_lp - 2e-3

    def test_bias_boost_steers_beam(self, setup):
        cfg, params, mel = setup
        span = [321, 654]
        spans = np.full((2, 1, 2), EOT, np.int32)
        spans[0, 0] = span
        ids, mask = pack_prefixes([[50257], [50257]], EOT)
        res = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                          jnp.asarray(mask), num_beams=2, max_new=4,
                          bias_spans=jnp.asarray(spans), bias_boost=1e6)
        best = np.asarray(res.best)
        assert best[0, :2].tolist() == span

    def test_batch_wrapper_with_contexts(self, setup):
        cfg, params, mel = setup
        tok = load_tokenizer()
        ctxs = [tok.encode("ctx a", add_special_tokens=False),
                tok.encode("b", add_special_tokens=False)]
        outs = beam_decode_batch(params, cfg, tok, mel, contexts=ctxs,
                                 num_beams=2, max_new=4)
        assert len(outs) == 2
        for o in outs:
            assert all(0 <= t < cfg.n_vocab for t in o)


class TestBeamNoSpeech:
    def test_no_speech_prob_matches_greedy(self, setup):
        """beam_decode(no_speech_id=...) reads the same prefill position as
        greedy_decode — probabilities must agree (long-form silence rule
        under beam, decode/long_form.py)."""
        cfg, params, mel = setup
        tok = load_tokenizer()
        ids, mask = pack_prefixes([[tok.sot]] * 2, EOT)
        g = greedy_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                          jnp.asarray(mask), max_new=3,
                          no_speech_id=tok.no_speech)
        b = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                        jnp.asarray(mask), num_beams=3, max_new=3,
                        no_speech_id=tok.no_speech)
        assert b.no_speech_prob is not None
        np.testing.assert_allclose(np.asarray(b.no_speech_prob),
                                   np.asarray(g.no_speech_prob),
                                   rtol=2e-3, atol=1e-5)


class TestLongFormBeam:
    def test_best_beam_projection(self):
        """_best_beam_as_greedy repeats the decoder's own selection rule in
        both scoring modes."""
        from whisper_context_biasing_tpu.decode.long_form import (
            _best_beam_as_greedy,
        )
        from whisper_context_biasing_tpu.decode.beam import BeamResult

        toks = np.arange(2 * 2 * 4, dtype=np.int32).reshape(2, 2, 4)
        scores = np.array([[-4.0, -3.0], [-2.0, -10.0]], np.float32)
        lens = np.array([[4, 2], [2, 4]], np.int32)
        res = BeamResult(toks, scores, lens, toks[:, 0],
                         np.array([0.1, 0.9], np.float32))
        # mode off: penalized = score/len -> row0: -4/4=-1.0 beats -3/2=-1.5
        # (beam 0); row1: -2/2=-1.0 beats -10/4 (beam 0)
        out = _best_beam_as_greedy(res, 1.0, "off")
        np.testing.assert_array_equal(out.tokens,
                                      np.stack([toks[0, 0], toks[1, 0]]))
        assert out.lengths.tolist() == [4, 2]
        assert out.sum_logprob.tolist() == [-4.0, -2.0]
        np.testing.assert_allclose(out.no_speech_prob, [0.1, 0.9], rtol=1e-6)
        # HF modes: scores already penalized -> argmax directly (row0 flips
        # to beam 1), sum recovered by un-penalizing
        out = _best_beam_as_greedy(res, 1.0, "true")
        np.testing.assert_array_equal(out.tokens,
                                      np.stack([toks[0, 1], toks[1, 0]]))
        assert out.sum_logprob.tolist() == [-6.0, -4.0]

    @pytest.mark.slow
    def test_long_form_beam_runs_multiwindow(self, setup):
        """num_beams>1 drives the t=0 rung across windows in both long-form
        modes; k=2 beam output is a valid token stream per file."""
        from whisper_context_biasing_tpu.decode import (
            transcribe_chunked,
            transcribe_long_batch,
        )

        cfg, params, _ = setup
        tok = load_tokenizer()
        rng = np.random.default_rng(5)
        win = cfg.n_audio_ctx * 320
        audios = [rng.standard_normal(int(win * 1.5)).astype(np.float32) * 0.1,
                  rng.standard_normal(win // 2).astype(np.float32) * 0.1]

        def mel_fn(batch):
            from whisper_context_biasing_tpu.audio.mel import (
                log_mel_spectrogram_np,
            )
            return np.stack([log_mel_spectrogram_np(a)[:, :2 * cfg.n_audio_ctx]
                             for a in batch])

        kw = dict(mel_fn=mel_fn, max_new=5, temperatures=(0.0,),
                  no_speech_threshold=0.99, logprob_threshold=None,
                  compression_ratio_threshold=None, window_samples=win,
                  num_beams=2)
        seq = transcribe_long_batch(params, cfg, tok, audios, **kw)
        chk = transcribe_chunked(params, cfg, tok, audios,
                                 use_timestamps=False, **kw)
        for outs in (seq, chk):
            assert len(outs) == 2
            assert all(isinstance(t, (int, np.integer))
                       for o in outs for t in o)


class TestPrefetch:
    def test_batch_loader_order_and_content(self):
        from whisper_context_biasing_tpu.data import BatchLoader

        class DS:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                return {"x": np.full((3,), i, np.int32)}

        def collate(items):
            return {"x": np.stack([it["x"] for it in items])}

        loader = BatchLoader(DS(), collate, batch_size=4, num_workers=3)
        batches = list(loader)
        assert len(batches) == 3
        got = np.concatenate([b["x"][:, 0] for b in batches])
        np.testing.assert_array_equal(got, np.arange(10))

    def test_batch_loader_shuffle_deterministic(self):
        from whisper_context_biasing_tpu.data import BatchLoader

        class DS:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                return {"x": np.asarray([i])}

        collate = lambda items: {"x": np.stack([i["x"] for i in items])}  # noqa: E731
        a = [b["x"].ravel().tolist() for b in BatchLoader(DS(), collate, 4, shuffle=True, seed=1)]
        b = [b["x"].ravel().tolist() for b in BatchLoader(DS(), collate, 4, shuffle=True, seed=1)]
        assert a == b
        assert sorted(sum(a, [])) == list(range(8))

    def test_prefetch_to_device(self):
        from whisper_context_biasing_tpu.data import prefetch_to_device

        batches = [{"x": np.full((2,), i, np.float32)} for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert float(b["x"][0]) == i

    def test_prefetch_propagates_errors(self):
        from whisper_context_biasing_tpu.data import prefetch_to_device

        def gen():
            yield {"x": np.zeros(1)}
            raise RuntimeError("boom")

        it = prefetch_to_device(gen(), size=1)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            list(it)


@pytest.mark.slow
class TestLongForm:
    def test_split_windows(self):
        from whisper_context_biasing_tpu.decode import split_windows
        from whisper_context_biasing_tpu.audio.mel import N_SAMPLES

        w = split_windows(np.ones(N_SAMPLES + 100, np.float32))
        assert len(w) == 2 and all(len(x) == N_SAMPLES for x in w)
        assert w[1][100] == 0.0  # zero-padded tail
        assert len(split_windows(np.ones(10, np.float32))) == 1

    def test_long_form_batch(self, setup):
        """Multi-window files decode per-window with history conditioning;
        shorter files are unaffected by extra rounds."""
        from whisper_context_biasing_tpu.decode import transcribe_long_batch

        cfg, params, _ = setup
        rng = np.random.default_rng(0)
        # tiny cfg consumes (80, 128) mels; fabricate a windowed mel_fn over
        # fake "audio" of 1 vs 3 windows
        def mel_fn(chunk):
            r = np.random.default_rng(int(abs(chunk).sum() * 1e3) % 2**31)
            return (r.standard_normal((chunk.shape[0], 80, 128)) * 0.5).astype(np.float32)

        from whisper_context_biasing_tpu.audio.mel import N_SAMPLES
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        tok = load_tokenizer()
        audios = [np.ones(3 * N_SAMPLES, np.float32) * 0.1,
                  np.ones(N_SAMPLES // 2, np.float32) * 0.2]
        outs = transcribe_long_batch(params, cfg, tok, audios, mel_fn=mel_fn,
                                     max_new=4, temperatures=(0.0,),
                                     logprob_threshold=None)
        assert len(outs) == 2
        # file 0 saw 3 windows, file 1 only 1: outputs accumulated accordingly
        assert len(outs[0]) >= len(outs[1])

        # conditioning changes behavior vs no-conditioning (usually)
        outs_nc = transcribe_long_batch(params, cfg, tok, audios, mel_fn=mel_fn,
                                        max_new=4, condition_on_previous=False,
                                        temperatures=(0.0,),
                                        logprob_threshold=None)
        assert len(outs_nc) == 2

    def test_single_window_equals_plain_greedy(self, setup):
        from whisper_context_biasing_tpu.decode import transcribe_long_batch
        from whisper_context_biasing_tpu.audio.mel import N_SAMPLES
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg, params, mel = setup
        tok = load_tokenizer()

        def mel_fn(chunk):
            return mel[:1]

        # pin the fallback ladder off: random-model logprobs (~log 1/V)
        # always trip logprob_threshold, which would switch to sampling
        outs = transcribe_long_batch(params, cfg, tok,
                                     [np.ones(N_SAMPLES, np.float32)],
                                     mel_fn=mel_fn, max_new=6,
                                     temperatures=(0.0,),
                                     logprob_threshold=None)
        ids, mask = pack_prefixes([[tok.sot]], EOT)
        ref = greedy_decode(params, cfg, jnp.asarray(mel[:1]), jnp.asarray(ids),
                            jnp.asarray(mask), max_new=6)
        want = np.asarray(ref.tokens)[0, : int(np.asarray(ref.lengths)[0])].tolist()
        assert outs[0] == want


class TestBiasScoreRollback:
    """Score-exact shallow fusion: failed partial matches net zero bonus."""

    def test_adjust_accounting(self):
        from whisper_context_biasing_tpu.decode.bias_processor import (
            advance_bias_state, bias_score_adjust, init_bias_state,
        )

        spans = jnp.asarray([[[7, 8, 9]]], jnp.int32)
        boost = 2.0
        st = init_bias_state(spans)
        # fresh state: expected token 7 gets +boost, others 0
        adj = np.asarray(bias_score_adjust(st, spans, 50, boost))
        assert adj[0, 7] == pytest.approx(boost)
        assert adj[0, 3] == pytest.approx(0.0)

        st = advance_bias_state(st, spans, jnp.asarray([7]))  # matched=1
        adj = np.asarray(bias_score_adjust(st, spans, 50, boost))
        # extending (token 8): -pending(2.0) + (1+1)*2.0 = +2.0
        assert adj[0, 8] == pytest.approx(boost)
        # breaking (token 3): -pending = -2.0 (retracts the earlier credit)
        assert adj[0, 3] == pytest.approx(-boost)

        st = advance_bias_state(st, spans, jnp.asarray([8]))  # matched=2
        adj = np.asarray(bias_score_adjust(st, spans, 50, boost))
        assert adj[0, 9] == pytest.approx(boost)      # completes: net 3*boost total
        assert adj[0, 3] == pytest.approx(-2 * boost)  # fails: net 0 total

    def test_cumulative_bonus_telescopes(self):
        """Sum of adjustments along a path = boost*len for completion, 0 for
        a path that breaks mid-span."""
        from whisper_context_biasing_tpu.decode.bias_processor import (
            advance_bias_state, bias_score_adjust, init_bias_state,
        )

        spans = jnp.asarray([[[7, 8, 9]]], jnp.int32)
        boost = 1.5

        def walk(tokens):
            st = init_bias_state(spans)
            total = 0.0
            for t in tokens:
                adj = np.asarray(bias_score_adjust(st, spans, 50, boost))
                total += float(adj[0, t])
                st = advance_bias_state(st, spans, jnp.asarray([t]))
            return total

        assert walk([7, 8, 9]) == pytest.approx(3 * boost)   # full span
        assert walk([7, 8, 3]) == pytest.approx(0.0)          # breaks at the end
        assert walk([7, 3]) == pytest.approx(0.0)             # breaks early
        assert walk([3, 4]) == pytest.approx(0.0)             # never starts
        # restart: a token that breaks the match but re-enters the span must
        # carry the restart credit so completion still nets boost*len
        assert walk([7, 7, 8, 9]) == pytest.approx(3 * boost)
        assert walk([7, 8, 7, 8, 9]) == pytest.approx(3 * boost)
        assert walk([7, 7, 3]) == pytest.approx(0.0)          # restart then fail

    def test_restart_score_exact_len2(self):
        """ADVICE r1: span [7,8] on '7 7 8' must accumulate exactly
        boost*2 (was boost*1: restart at matched=1 granted no credit)."""
        from whisper_context_biasing_tpu.decode.bias_processor import (
            advance_bias_state, bias_score_adjust, init_bias_state,
        )

        spans = jnp.asarray([[[7, 8]]], jnp.int32)
        boost = 1.0
        st = init_bias_state(spans)
        total = 0.0
        for t in [7, 7, 8]:
            adj = np.asarray(bias_score_adjust(st, spans, 50, boost))
            total += float(adj[0, t])
            st = advance_bias_state(st, spans, jnp.asarray([t]))
        assert total == pytest.approx(2 * boost)

    def test_beam_still_steered(self, setup):
        cfg, params, mel = setup
        span = [321, 654]
        spans = np.full((2, 1, 2), EOT, np.int32)
        spans[0, 0] = span
        ids, mask = pack_prefixes([[50257], [50257]], EOT)
        res = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                          jnp.asarray(mask), num_beams=2, max_new=4,
                          bias_spans=jnp.asarray(spans), bias_boost=1e6)
        assert np.asarray(res.best)[0, :2].tolist() == span


@pytest.mark.slow
class TestHFBeamModes:
    """HF early-stopping semantics plumbing (the transcript-level parity vs
    torch generate lives in test_model.py::TestBeamGenerateParity)."""

    def test_true_mode_returns_sorted_pool(self, setup):
        cfg, params, mel = setup
        ids, mask = pack_prefixes([[50257], [50257]], EOT)
        res = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                          jnp.asarray(mask), num_beams=3, max_new=8,
                          early_stopping="true")
        scores = np.asarray(res.scores)
        assert (np.diff(scores, axis=1) <= 1e-6).all()  # pool is top-k sorted
        best = np.asarray(res.best)
        np.testing.assert_array_equal(best, np.asarray(res.tokens)[:, 0])

    def test_invalid_mode_raises(self, setup):
        cfg, params, mel = setup
        ids, mask = pack_prefixes([[50257], [50257]], EOT)
        with pytest.raises(ValueError, match="early_stopping"):
            beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                        jnp.asarray(mask), num_beams=2, max_new=4,
                        early_stopping="bogus")

    def test_never_beats_or_ties_true(self, setup):
        """"never" explores until the rigorous bound, so its best penalized
        score cannot be worse than "true" (which stops at pool-full)."""
        cfg, params, mel = setup
        ids, mask = pack_prefixes([[50257], [50257]], EOT)
        kw = dict(num_beams=3, max_new=8)
        r_true = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                             jnp.asarray(mask), early_stopping="true", **kw)
        r_never = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                              jnp.asarray(mask), early_stopping="never", **kw)
        assert (np.asarray(r_never.scores)[:, 0]
                >= np.asarray(r_true.scores)[:, 0] - 1e-6).all()

    def test_batch_wrapper_mode(self, setup):
        cfg, params, mel = setup
        tok = load_tokenizer()
        hyps = beam_decode_batch(params, cfg, tok, mel, num_beams=3,
                                 max_new=6, early_stopping="true")
        assert len(hyps) == 2
        assert all(EOT not in h for h in hyps)

    def test_bias_boost_composes_with_hf_mode(self, setup):
        cfg, params, mel = setup
        tok = load_tokenizer()
        ids, mask = pack_prefixes([[50257], [50257]], EOT)
        base = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                           jnp.asarray(mask), num_beams=3, max_new=6,
                           early_stopping="false")
        target = np.asarray(base.best)[0, :2].tolist()
        other = [[(t + 7) % 50000 for t in target]]
        spans = jnp.asarray([other, other], jnp.int32)
        boosted = beam_decode(params, cfg, jnp.asarray(mel), jnp.asarray(ids),
                              jnp.asarray(mask), num_beams=3, max_new=6,
                              bias_spans=spans, bias_boost=15.0,
                              early_stopping="false")
        # a large boost toward different tokens must change the result
        assert not np.array_equal(np.asarray(boosted.best),
                                  np.asarray(base.best))
