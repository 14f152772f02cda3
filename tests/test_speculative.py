"""Speculative decoding tests: the emitted sequence must BIT-MATCH the
target model's greedy decode for ANY draft model and acceptance rate —
including ragged prompts and bias-boosted decoding."""

import numpy as np
import pytest
import jax.numpy as jnp

from whisper_context_biasing_tpu.decode import greedy_decode, pack_prefixes
from whisper_context_biasing_tpu.decode.speculative import speculative_greedy_decode
from whisper_context_biasing_tpu.models import init_params, tiny_test_config

EOT = 50256


@pytest.fixture(scope="module")
def setup():
    cfg_t = tiny_test_config()
    cfg_d = tiny_test_config(n_audio_layers=1, n_text_layers=1, d_model=32,
                             n_heads=2)
    params_t = init_params(cfg_t, 0)
    params_d = init_params(cfg_d, 7)
    rng = np.random.default_rng(0)
    mel = (rng.standard_normal((3, 80, 128)) * 0.5).astype(np.float32)
    return cfg_t, params_t, cfg_d, params_d, jnp.asarray(mel)


def _greedy_ref(params_t, cfg_t, mel, ids, mask, max_new, **kw):
    res = greedy_decode(params_t, cfg_t, mel, jnp.asarray(ids),
                        jnp.asarray(mask), max_new=max_new, **kw)
    return np.asarray(res.tokens), np.asarray(res.lengths)


@pytest.mark.slow
class TestSpeculativeExactness:
    @pytest.mark.parametrize("k", [1, 4])  # two compiles (slow-lane budget)
    def test_random_draft_bit_matches_target_greedy(self, setup, k):
        """Acceptance ~0 (independent random draft): output must STILL be
        the target's greedy sequence exactly."""
        cfg_t, params_t, cfg_d, params_d, mel = setup
        ids, mask = pack_prefixes([[50257]] * 3, EOT)
        ref_toks, ref_lens = _greedy_ref(params_t, cfg_t, mel, ids, mask, 10)
        res = speculative_greedy_decode(
            params_d, cfg_d, params_t, cfg_t, mel,
            jnp.asarray(ids), jnp.asarray(mask), k=k, max_new=10)
        np.testing.assert_array_equal(np.asarray(res.tokens), ref_toks)
        np.testing.assert_array_equal(np.asarray(res.lengths), ref_lens)

    def test_self_draft_full_acceptance(self, setup):
        """Draft == target: every round accepts all k drafts; output is
        unchanged."""
        cfg_t, params_t, _, _, mel = setup
        ids, mask = pack_prefixes([[50257]] * 3, EOT)
        ref_toks, ref_lens = _greedy_ref(params_t, cfg_t, mel, ids, mask, 12)
        res = speculative_greedy_decode(
            params_t, cfg_t, params_t, cfg_t, mel,
            jnp.asarray(ids), jnp.asarray(mask), k=4, max_new=12)
        np.testing.assert_array_equal(np.asarray(res.tokens), ref_toks)
        np.testing.assert_array_equal(np.asarray(res.lengths), ref_lens)

    def test_ragged_prompts(self, setup):
        cfg_t, params_t, cfg_d, params_d, mel = setup
        ids, mask = pack_prefixes(
            [[50360, 11, 22, 50257], [50257], [50360, 5, 50257]], EOT)
        ref_toks, ref_lens = _greedy_ref(params_t, cfg_t, mel, ids, mask, 8)
        res = speculative_greedy_decode(
            params_d, cfg_d, params_t, cfg_t, mel,
            jnp.asarray(ids), jnp.asarray(mask), k=3, max_new=8)
        np.testing.assert_array_equal(np.asarray(res.tokens), ref_toks)
        np.testing.assert_array_equal(np.asarray(res.lengths), ref_lens)

    def test_bias_boost_exactness(self, setup):
        """Bias-trie shallow fusion composes: speculative output equals
        bias-boosted greedy, including the context-tail trie seeding."""
        cfg_t, params_t, cfg_d, params_d, mel = setup
        span = np.full((3, 2, 3), EOT, np.int32)
        span[0, 0] = [123, 456, 789]
        span[2, 0, :2] = [77, 88]
        spans = jnp.asarray(span)
        ids, mask = pack_prefixes([[50360, 123, 50257], [50257], [50257]], EOT)
        ref = greedy_decode(params_t, cfg_t, mel, jnp.asarray(ids),
                            jnp.asarray(mask), max_new=8,
                            bias_spans=spans, bias_boost=3.0)
        res = speculative_greedy_decode(
            params_d, cfg_d, params_t, cfg_t, mel,
            jnp.asarray(ids), jnp.asarray(mask), k=3, max_new=8,
            bias_spans=spans, bias_boost=3.0)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(ref.tokens))

    def test_eot_termination_matches(self, setup):
        """Rows that hit <|eot|> freeze exactly like greedy (eot-padded
        tokens, lengths exclude the eot)."""
        cfg_t, params_t, cfg_d, params_d, mel = setup
        # force an early eot on row 0 via an overwhelming single-token span
        span = np.full((3, 1, 1), EOT, np.int32)
        spans = jnp.asarray(span)  # span == pad -> no-op; rely on natural eot
        ids, mask = pack_prefixes([[50257]] * 3, EOT)
        ref = greedy_decode(params_t, cfg_t, mel, jnp.asarray(ids),
                            jnp.asarray(mask), max_new=20)
        res = speculative_greedy_decode(
            params_d, cfg_d, params_t, cfg_t, mel,
            jnp.asarray(ids), jnp.asarray(mask), k=4, max_new=20)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_array_equal(np.asarray(res.lengths),
                                      np.asarray(ref.lengths))

    def test_sum_logprob_and_no_speech_parity(self, setup):
        """The long-form quality signals (summed target logprob, no-speech
        probability) must match greedy's values for the same sequence."""
        cfg_t, params_t, cfg_d, params_d, mel = setup
        ids, mask = pack_prefixes([[50257]] * 3, EOT)
        ref = greedy_decode(params_t, cfg_t, mel, jnp.asarray(ids),
                            jnp.asarray(mask), max_new=8, no_speech_id=50361)
        res = speculative_greedy_decode(
            params_d, cfg_d, params_t, cfg_t, mel,
            jnp.asarray(ids), jnp.asarray(mask), k=3, max_new=8,
            no_speech_id=50361)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_allclose(np.asarray(res.sum_logprob),
                                   np.asarray(ref.sum_logprob),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.no_speech_prob),
                                   np.asarray(ref.no_speech_prob),
                                   rtol=1e-4, atol=1e-5)

    def test_spec_rounds_reflect_acceptance(self, setup):
        """Self-draft (full acceptance) finishes in ~max_new/(k+1) rounds;
        an independent random draft needs ~1 round per token."""
        cfg_t, params_t, cfg_d, params_d, mel = setup
        ids, mask = pack_prefixes([[50257]] * 3, EOT)
        fast = speculative_greedy_decode(
            params_t, cfg_t, params_t, cfg_t, mel,
            jnp.asarray(ids), jnp.asarray(mask), k=4, max_new=12)
        slow = speculative_greedy_decode(
            params_d, cfg_d, params_t, cfg_t, mel,
            jnp.asarray(ids), jnp.asarray(mask), k=4, max_new=12)
        max_len = int(np.asarray(fast.lengths).max())
        if max_len > 4:  # enough tokens for acceptance to matter
            assert int(fast.spec_rounds) < int(slow.spec_rounds)
        # full acceptance: ceil((tokens-1)/(k+1)) rounds
        assert int(fast.spec_rounds) <= -(-11 // 5) + 1

    def test_max_new_one(self, setup):
        cfg_t, params_t, cfg_d, params_d, mel = setup
        ids, mask = pack_prefixes([[50257]] * 3, EOT)
        ref_toks, _ = _greedy_ref(params_t, cfg_t, mel, ids, mask, 1)
        res = speculative_greedy_decode(
            params_d, cfg_d, params_t, cfg_t, mel,
            jnp.asarray(ids), jnp.asarray(mask), k=2, max_new=1)
        np.testing.assert_array_equal(np.asarray(res.tokens), ref_toks)

    def test_draft_with_smaller_text_ctx(self, setup):
        """A draft whose decoder context is shorter than the target's must
        not truncate the emitted sequence: draft positions saturate at its
        table edge while the target decodes to its own budget."""
        from whisper_context_biasing_tpu.models import (
            init_params, tiny_test_config)

        cfg_t, params_t, _, _, mel = setup
        cfg_d = tiny_test_config(n_audio_layers=1, n_text_layers=1,
                                 d_model=32, n_heads=2, n_text_ctx=8)
        params_d = init_params(cfg_d, 11)
        ids, mask = pack_prefixes([[50360, 11, 50257]] * 3, EOT)  # p=3
        # p + max_new = 15 > draft ctx 8: the old clamp would cut to 5
        ref_toks, ref_lens = _greedy_ref(params_t, cfg_t, mel, ids, mask, 12)
        res = speculative_greedy_decode(
            params_d, cfg_d, params_t, cfg_t, mel,
            jnp.asarray(ids), jnp.asarray(mask), k=3, max_new=12)
        np.testing.assert_array_equal(np.asarray(res.tokens), ref_toks)
        np.testing.assert_array_equal(np.asarray(res.lengths), ref_lens)

    def test_multilingual_span_pad_id_parity(self):
        """Batch wrapper parity on a MULTILINGUAL tokenizer: bias spans are
        padded with eot=50257 there, and the wrapper must thread
        span_pad_id=tokenizer.eot exactly like greedy's decode_batch (a
        50256 default would count pad slots as span tokens and boost eot)."""
        from whisper_context_biasing_tpu.decode import (
            decode_batch, speculative_decode_batch)
        from whisper_context_biasing_tpu.models import (
            init_params, tiny_test_config)
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        tok = load_tokenizer(multilingual=True)
        cfg_t = tiny_test_config(n_vocab=51866)
        cfg_d = tiny_test_config(n_audio_layers=1, n_text_layers=1,
                                 d_model=32, n_heads=2, n_vocab=51866)
        params_t = init_params(cfg_t, 0)
        params_d = init_params(cfg_d, 7)
        rng = np.random.default_rng(1)
        mel = (rng.standard_normal((2, 80, 128)) * 0.5).astype(np.float32)
        # ragged spans: pad slots hold tok.eot == 50257
        span = np.full((2, 2, 3), tok.eot, np.int32)
        span[0, 0] = [123, 456, 789]
        span[1, 0, :1] = [321]
        ref = decode_batch(params_t, cfg_t, tok, mel, max_new=8,
                           bias_spans=span, bias_boost=4.0)
        got = speculative_decode_batch(
            params_d, cfg_d, params_t, cfg_t, tok, mel, max_new=8,
            bias_spans=span, bias_boost=4.0, k=3)
        assert got == ref


@pytest.mark.slow
class TestSpeculativeLongForm:
    def test_long_form_draft_matches_plain(self, setup):
        """transcribe_long_batch(draft=...) emits the same tokens as the
        plain long-form loop (speculative t=0 pass is output-invariant)."""
        from whisper_context_biasing_tpu.decode import transcribe_long_batch
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg_t, params_t, cfg_d, params_d, _ = setup
        tok = load_tokenizer()
        rng = np.random.default_rng(3)
        win = cfg_t.n_audio_ctx * 320  # reduced test window
        audios = [rng.standard_normal(int(win * 1.5)).astype(np.float32) * 0.1,
                  rng.standard_normal(win // 2).astype(np.float32) * 0.1]

        def mel_fn(batch):
            from whisper_context_biasing_tpu.audio.mel import log_mel_spectrogram_np
            return np.stack([log_mel_spectrogram_np(a)[:, :2 * cfg_t.n_audio_ctx]
                             for a in batch])

        kw = dict(mel_fn=mel_fn, max_new=6, temperatures=(0.0,),
                  no_speech_threshold=None, logprob_threshold=None,
                  compression_ratio_threshold=None, window_samples=win)
        ref = transcribe_long_batch(params_t, cfg_t, tok, audios, **kw)
        got = transcribe_long_batch(params_t, cfg_t, tok, audios,
                                    draft=(params_d, cfg_d, 3), **kw)
        assert got == ref

    def test_chunked_draft_matches_plain(self, setup):
        """transcribe_chunked(draft=...) emits the same tokens as the plain
        chunked decode — speculative verification is output-invariant in the
        parallel-window mode too (decode/chunked.py draft= passthrough)."""
        from whisper_context_biasing_tpu.decode import transcribe_chunked
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg_t, params_t, cfg_d, params_d, _ = setup
        tok = load_tokenizer()
        rng = np.random.default_rng(4)
        win = cfg_t.n_audio_ctx * 320
        audios = [rng.standard_normal(int(win * 1.6)).astype(np.float32) * 0.1,
                  rng.standard_normal(win // 2).astype(np.float32) * 0.1]

        def mel_fn(batch):
            from whisper_context_biasing_tpu.audio.mel import log_mel_spectrogram_np
            return np.stack([log_mel_spectrogram_np(a)[:, :2 * cfg_t.n_audio_ctx]
                             for a in batch])

        kw = dict(mel_fn=mel_fn, max_new=6, temperatures=(0.0,),
                  no_speech_threshold=None, logprob_threshold=None,
                  compression_ratio_threshold=None, window_samples=win,
                  use_timestamps=False)
        ref = transcribe_chunked(params_t, cfg_t, tok, audios, **kw)
        got = transcribe_chunked(params_t, cfg_t, tok, audios,
                                 draft=(params_d, cfg_d, 3), **kw)
        assert got == ref
