"""Word-level timestamps: DTW, word splitting, alignment matrix, end-to-end.

The reference has no timestamp capability (text-only max_length=225
generation, /root/reference/scripts/train.py:204-210); these tests pin the
serving-surface contract: monotonic, clip-bounded word timings whose words
re-join to the decoded transcript."""

import numpy as np
import pytest

from whisper_context_biasing_tpu.decode.word_timestamps import (
    SECONDS_PER_FRAME,
    dtw_path,
    find_word_timestamps,
    split_words,
)
from whisper_context_biasing_tpu.models import init_params, tiny_test_config
from whisper_context_biasing_tpu.tokenizer import load_tokenizer


@pytest.fixture(scope="module")
def setup():
    tok = load_tokenizer()
    cfg = tiny_test_config()
    params = init_params(cfg, 0)
    return tok, cfg, params


class TestDTW:
    def test_diagonal_on_identity_like_cost(self):
        n = 6
        cost = np.ones((n, n)) - np.eye(n)  # cheapest path is the diagonal
        ti, fi = dtw_path(cost)
        assert ti[0] == 0 and fi[0] == 0
        assert ti[-1] == n - 1 and fi[-1] == n - 1
        on_diag = [(a, b) for a, b in zip(ti, fi) if a == b]
        assert len(on_diag) == n

    def test_monotonic_and_complete(self):
        rng = np.random.default_rng(0)
        cost = rng.random((5, 40))
        ti, fi = dtw_path(cost)
        assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
        # every token row and frame column is visited
        assert set(ti) == set(range(5))
        assert set(fi) == set(range(40))

    def test_matches_bruteforce_table(self):
        """The vectorized row recurrence must equal the textbook O(N*M)
        dynamic program (path cost of the returned path == optimal cost)."""
        rng = np.random.default_rng(1)
        cost = rng.random((7, 11))
        n, m = cost.shape
        ref = np.full((n + 1, m + 1), np.inf)
        ref[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                ref[i, j] = cost[i - 1, j - 1] + min(
                    ref[i - 1, j - 1], ref[i - 1, j], ref[i, j - 1])
        ti, fi = dtw_path(cost)
        # path cost along the returned path: count diagonal/step moves
        path_cost = cost[ti[0], fi[0]]
        for k in range(1, len(ti)):
            path_cost += cost[ti[k], fi[k]]
        assert np.isclose(path_cost, ref[n, m])


class TestSplitWords:
    def test_roundtrip_simple(self, setup):
        tok, _, _ = setup
        text = " take aspirin twice daily"
        ids = tok.encode(text, add_special_tokens=False)
        words, word_tokens = split_words(tok, ids)
        assert "".join(words) == text
        assert [w.strip() for w in words] == ["take", "aspirin", "twice", "daily"]
        assert [t for wt in word_tokens for t in wt] == ids

    def test_punctuation_attaches_to_previous_word(self, setup):
        tok, _, _ = setup
        ids = tok.encode(" hello, world.", add_special_tokens=False)
        words, _ = split_words(tok, ids)
        assert words[0].strip() == "hello,"
        assert words[-1].strip() == "world."

    def test_unicode_multibyte_pieces_merge(self, setup):
        tok, _, _ = setup
        text = " café résumé"
        ids = tok.encode(text, add_special_tokens=False)
        words, _ = split_words(tok, ids)
        assert "".join(words) == text


class TestMedianFilter:
    def test_matches_numpy_median(self):
        import jax.numpy as jnp

        from whisper_context_biasing_tpu.models.alignment import median_filter_time

        rng = np.random.default_rng(2)
        x = rng.random((3, 20)).astype(np.float32)
        got = np.asarray(median_filter_time(jnp.asarray(x), 5))
        pad = np.pad(x, ((0, 0), (2, 2)), mode="reflect")
        want = np.stack(
            [np.median(pad[:, j : j + 5], axis=1) for j in range(20)], axis=1
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_width_one_identity(self):
        import jax.numpy as jnp

        from whisper_context_biasing_tpu.models.alignment import median_filter_time

        x = np.arange(12, dtype=np.float32).reshape(3, 4)
        np.testing.assert_array_equal(
            np.asarray(median_filter_time(jnp.asarray(x), 1)), x)


class TestAlignmentMatrix:
    def test_shape_finite_and_padding_invariant(self, setup):
        import jax.numpy as jnp

        from whisper_context_biasing_tpu.models import (
            alignment_matrix,
            default_alignment_mask,
            encode_audio,
        )

        tok, cfg, params = setup
        rng = np.random.default_rng(3)
        mel = (rng.standard_normal((1, cfg.n_mels, 128)) * 0.5).astype(np.float32)
        enc = encode_audio(params, cfg, jnp.asarray(mel))
        nf = enc.shape[1]
        seq = [tok.sot] + tok.encode(" aspirin", add_special_tokens=False) + [tok.eot]
        hm = default_alignment_mask(cfg)

        toks = np.asarray([seq], np.int32)
        m1 = np.asarray(alignment_matrix(
            params, cfg, jnp.asarray(toks), enc, hm,
            jnp.ones((1, len(seq)), np.float32), num_frames=nf))
        assert m1.shape == (1, len(seq), nf)
        assert np.isfinite(m1).all()

        # right-padding the token batch must not change the valid rows
        padded = np.full((1, len(seq) + 5), tok.eot, np.int32)
        padded[0, : len(seq)] = seq
        mask = np.zeros((1, len(seq) + 5), np.float32)
        mask[0, : len(seq)] = 1.0
        m2 = np.asarray(alignment_matrix(
            params, cfg, jnp.asarray(padded), enc, hm,
            jnp.asarray(mask), num_frames=nf))
        np.testing.assert_allclose(m2[:, : len(seq)], m1, atol=2e-2, rtol=0.2)

    def test_head_mask_selects_heads(self, setup):
        from whisper_context_biasing_tpu.models import (
            default_alignment_mask,
            heads_to_mask,
        )

        _, cfg, _ = setup
        d = np.asarray(default_alignment_mask(cfg))
        assert d.shape == (cfg.n_text_layers, cfg.n_heads)
        assert d[-1].all() and not d[0].any()
        e = np.asarray(heads_to_mask(cfg, [(0, 1), (1, 0)]))
        assert e.sum() == 2 and e[0, 1] == 1 and e[1, 0] == 1

    def test_published_sets_in_bounds_for_their_models(self):
        """Every published alignment-head pair must index inside its model's
        decoder (layers, heads) — a transposed or mis-keyed entry fails."""
        from whisper_context_biasing_tpu.models import (
            ALIGNMENT_HEADS, get_config,
        )

        for name, heads in ALIGNMENT_HEADS.items():
            cfg = get_config(name)
            assert heads, name
            for l, h in heads:
                assert 0 <= l < cfg.n_text_layers, (name, l)
                assert 0 <= h < cfg.n_heads, (name, h)

    def test_stock_models_resolve_published_sets(self):
        """tiny/base/small stock configs resolve their published sets by
        geometry alone (VERDICT r4 ask #6), and the resolved mask differs
        from the top-half heuristic — i.e. the DTW path actually changes."""
        from whisper_context_biasing_tpu.models import (
            ALIGNMENT_HEADS,
            default_alignment_mask,
            get_config,
            infer_model_name,
            lookup_alignment_heads,
            resolve_alignment_mask,
        )

        for name in ("tiny", "tiny.en", "base", "base.en", "small",
                     "small.en", "large-v3", "large-v3-turbo"):
            cfg = get_config(name)
            assert infer_model_name(cfg) == name
            mask = np.asarray(resolve_alignment_mask(cfg))
            expect = set(ALIGNMENT_HEADS[name])
            got = {(l, h) for l, h in zip(*np.nonzero(mask))}
            assert got == expect, name
            assert not np.array_equal(mask,
                                      np.asarray(default_alignment_mask(cfg)))
        # the shared 80-mel 32-layer geometry resolves to large-v2
        assert infer_model_name(get_config("large")) == "large-v2"
        # by-name lookup still reaches the v1 set
        assert lookup_alignment_heads("large") == ALIGNMENT_HEADS["large"]

    def test_custom_geometry_falls_back_to_heuristic(self, setup):
        from whisper_context_biasing_tpu.models import (
            default_alignment_mask,
            infer_model_name,
            lookup_alignment_heads,
            resolve_alignment_mask,
        )

        _, cfg, _ = setup  # tiny_test_config: matches no stock geometry
        assert infer_model_name(cfg) is None
        np.testing.assert_array_equal(
            np.asarray(resolve_alignment_mask(cfg)),
            np.asarray(default_alignment_mask(cfg)))
        # explicit heads always win
        m = np.asarray(resolve_alignment_mask(cfg, heads=[(0, 0)]))
        assert m.sum() == 1 and m[0, 0] == 1
        # a stock set that no longer fits a modified config is rejected
        from whisper_context_biasing_tpu.models import get_config
        shrunk = get_config("base.en", n_text_layers=4)
        assert lookup_alignment_heads("base.en", shrunk) is None


class TestEndToEnd:
    def test_word_timings_monotonic_and_bounded(self, setup):
        tok, cfg, params = setup
        rng = np.random.default_rng(4)
        mel = (rng.standard_normal((2, cfg.n_mels, 128)) * 0.5).astype(np.float32)
        hyps = [
            tok.encode(" take aspirin daily", add_special_tokens=False),
            tok.encode(" hello world", add_special_tokens=False),
        ]
        nf = [64, 40]
        out = find_word_timestamps(params, cfg, tok, mel, hyps, num_frames=nf)
        assert len(out) == 2
        for i, timings in enumerate(out):
            text = "".join(w.word for w in timings)
            assert text == tok.decode(hyps[i], skip_special_tokens=True)
            clip_end = nf[i] * SECONDS_PER_FRAME
            last = 0.0
            for w in timings:
                assert 0.0 <= w.start <= w.end <= clip_end + 1e-6
                assert w.start >= last - 1e-6
                last = w.start

    def test_empty_hypothesis(self, setup):
        tok, cfg, params = setup
        mel = np.zeros((1, cfg.n_mels, 128), np.float32)
        out = find_word_timestamps(params, cfg, tok, mel, [[]])
        assert out == [[]]


class TestMergePunctuations:
    def test_opening_mark_joins_following(self, setup):
        from whisper_context_biasing_tpu.decode.word_timestamps import (
            merge_punctuations,
        )

        words, toks = merge_punctuations(
            [" he", " (", " said", ")"], [[1], [2], [3], [4]])
        assert words == [" he", " ( said)"]
        assert toks == [[1], [2, 3, 4]]

    def test_closing_mark_joins_previous(self, setup):
        from whisper_context_biasing_tpu.decode.word_timestamps import (
            merge_punctuations,
        )

        words, toks = merge_punctuations([" stop", "."], [[1], [2]])
        assert words == [" stop."]
        assert toks == [[1, 2]]

    def test_split_words_with_quotes(self, setup):
        tok, _, _ = setup
        ids = tok.encode(' he said "yes" loudly', add_special_tokens=False)
        words, word_tokens = split_words(tok, ids)
        assert "".join(words) == ' he said "yes" loudly'
        assert [t for wt in word_tokens for t in wt] == ids


class TestDTWTieBreaking:
    def test_optimal_on_tie_heavy_matrix(self):
        """Regression: the openai-style traceback fell through to 'left' on
        ties even when strictly worse — this matrix has optimum 2.0 but the
        old traceback returned a 3.0 path."""
        cost = np.array([[0, 1, 1, 1, 1],
                         [1, 1, 0, 0, 1],
                         [0, 0, 1, 0, 1],
                         [0, 0, 1, 1, 0],
                         [1, 1, 1, 0, 1]], float)
        ti, fi = dtw_path(cost)
        assert sum(cost[a, b] for a, b in zip(ti, fi)) == 2.0

    def test_fuzz_paths_are_optimal(self):
        rng = np.random.default_rng(7)
        for _ in range(200):
            cost = rng.integers(0, 2, (5, 6)).astype(float)  # tie-heavy
            n, m = cost.shape
            ref = np.full((n + 1, m + 1), np.inf)
            ref[0, 0] = 0.0
            for i in range(1, n + 1):
                for j in range(1, m + 1):
                    ref[i, j] = cost[i - 1, j - 1] + min(
                        ref[i - 1, j - 1], ref[i - 1, j], ref[i, j - 1])
            ti, fi = dtw_path(cost)
            got = sum(cost[a, b] for a, b in zip(ti, fi))
            assert np.isclose(got, ref[n, m]), (cost, got, ref[n, m])


class TestWordProbabilities:
    def test_probabilities_present_and_bounded(self, setup):
        import jax.numpy as jnp

        tok, cfg, params = setup
        rng = np.random.default_rng(5)
        mel = (rng.standard_normal((1, cfg.n_mels, 128)) * 0.5).astype(np.float32)
        hyp = tok.encode(" aspirin daily", add_special_tokens=False)
        ws = find_word_timestamps(params, cfg, tok, jnp.asarray(mel), [hyp])[0]
        assert ws
        for w in ws:
            assert w.probability is not None
            assert 0.0 < w.probability <= 1.0

    def test_matches_teacher_forced_forward(self, setup):
        """WordTiming.probability must equal the mean softmax probability of
        the word's tokens under a plain forward pass of the same model."""
        import jax.numpy as jnp

        from whisper_context_biasing_tpu.models.whisper import forward

        tok, cfg, params = setup
        rng = np.random.default_rng(6)
        mel = (rng.standard_normal((1, cfg.n_mels, 128)) * 0.5).astype(np.float32)
        hyp = tok.encode(" dose", add_special_tokens=False)
        seq = [tok.sot] + hyp + [tok.eot]
        logits = np.asarray(
            forward(params, cfg, jnp.asarray(mel),
                    jnp.asarray([seq], np.int32)), np.float64)[0]
        ref = {}
        lp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True))
                             .sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        probs = np.exp([lp[t - 1, seq[t]] for t in range(1, len(seq))])
        # words over hyp tokens: positions 1..len(hyp) in seq
        ws = find_word_timestamps(params, cfg, tok, jnp.asarray(mel), [hyp])[0]
        pos = 0
        for w in ws:
            expect = float(np.mean(probs[pos : pos + len(w.tokens)]))
            assert w.probability == pytest.approx(expect, rel=0.02, abs=1e-8)
            pos += len(w.tokens)
