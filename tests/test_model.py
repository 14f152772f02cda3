"""Model tests: forward parity against HF torch kernels (random weights,
offline), KV-cache consistency, causality, and left-padded prompt handling."""

import contextlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def enable_x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)

from whisper_context_biasing_tpu.decode.greedy import greedy_decode, pack_prefixes
from whisper_context_biasing_tpu.models import (
    WhisperConfig,
    decode_tokens,
    encode_audio,
    forward,
    get_config,
    init_kv_cache,
    init_params,
    load_torch_model,
    precompute_cross_kv,
    sinusoids,
    tiny_test_config,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config()
    params = init_params(cfg, 0)
    return cfg, params


def _mel(b=1, n_mels=80, seed=0, frames=128):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, n_mels, frames)).astype(np.float32) * 0.5


class TestConfigs:
    def test_family(self):
        assert get_config("base.en").d_model == 512
        assert get_config("base.en").n_vocab == 51864
        assert not get_config("base.en").multilingual
        assert get_config("large-v3").n_mels == 128
        assert get_config("large-v3").n_vocab == 51866
        assert get_config("small").n_audio_layers == 12
        assert get_config("tiny.en").n_heads == 6

    def test_distil_family(self):
        # distil-whisper: the teacher's encoder + a distilled 2-layer
        # decoder (4 for distil-small.en); lineage rules follow the teacher
        c = get_config("distil-small.en")
        assert (c.d_model, c.n_audio_layers, c.n_text_layers) == (768, 12, 4)
        assert c.n_vocab == 51864 and c.n_mels == 80
        c = get_config("distil-medium.en")
        assert c.n_text_layers == 2 and not c.multilingual
        c = get_config("distil-large-v3")
        assert (c.n_text_layers, c.n_vocab, c.n_mels) == (2, 51866, 128)
        assert get_config("distil-large-v2").n_vocab == 51865
        with pytest.raises(ValueError, match="English-only"):
            get_config("distil-small")
        with pytest.raises(ValueError, match="English-only"):
            get_config("distil-large-v3.en")

    def test_reference_aliases(self):
        cfg = get_config("base.en")
        assert cfg.decoder_start_token_id == 50257
        assert cfg.pad_token_id == 50256
        assert cfg.max_target_positions == 448

    def test_large_v3_turbo(self):
        cfg = get_config("large-v3-turbo")
        assert (cfg.n_audio_layers, cfg.n_text_layers) == (32, 4)
        assert cfg.n_mels == 128 and cfg.n_vocab == 51866 and cfg.multilingual
        with pytest.raises(ValueError):
            get_config("large-v3.en")  # no English-only large variants

    def test_asymmetric_layers_forward(self):
        cfg = tiny_test_config(n_audio_layers=3, n_text_layers=1)
        params = init_params(cfg, 0)
        out = forward(params, cfg, jnp.asarray(_mel()),
                      jnp.asarray([[50257, 5]], jnp.int32))
        assert out.shape == (1, 2, cfg.n_vocab)
        assert np.isfinite(np.asarray(out)).all()


class TestEncoder:
    def test_shape(self, tiny):
        cfg, params = tiny
        out = encode_audio(params, cfg, jnp.asarray(_mel()))
        assert out.shape == (1, cfg.n_audio_ctx, cfg.d_model)
        assert np.isfinite(np.asarray(out)).all()

    def test_sinusoids_match_known_form(self):
        s = sinusoids(8, 4)
        np.testing.assert_allclose(s[0], [0, 0, 1, 1], atol=1e-7)
        assert s.shape == (8, 4)


@pytest.mark.slow
class TestDecoderModes:
    def test_full_forward_shape(self, tiny):
        cfg, params = tiny
        mel = jnp.asarray(_mel())
        toks = jnp.asarray([[50257, 50362, 100, 200, 300]], dtype=jnp.int32)
        logits = forward(params, cfg, mel, toks)
        assert logits.shape == (1, 5, cfg.n_vocab)

    def test_causality(self, tiny):
        cfg, params = tiny
        mel = jnp.asarray(_mel())
        t1 = jnp.asarray([[50257, 50362, 100, 200, 300]], dtype=jnp.int32)
        t2 = t1.at[0, 4].set(999)  # change the last token only
        l1 = forward(params, cfg, mel, t1)
        l2 = forward(params, cfg, mel, t2)
        np.testing.assert_allclose(np.asarray(l1[:, :4]), np.asarray(l2[:, :4]), atol=1e-5)

    def test_cached_matches_full(self, tiny):
        """Step-by-step cached decode must reproduce the full forward logits."""
        cfg, params = tiny
        mel = jnp.asarray(_mel(2))
        enc = encode_audio(params, cfg, mel)
        ckv = precompute_cross_kv(params, cfg, enc)
        toks = jnp.asarray(
            [[50257, 50362, 100, 200, 300], [50257, 50362, 7, 8, 9]], dtype=jnp.int32
        )
        full, _ = decode_tokens(params, cfg, toks, cross_kv=ckv)

        cache = init_kv_cache(cfg, 2, 16)
        step_logits = []
        for t in range(5):
            lg, cache = decode_tokens(
                params, cfg, toks[:, t : t + 1], cross_kv=ckv, cache=cache, pos_offset=t
            )
            step_logits.append(np.asarray(lg[:, 0]))
        stepped = np.stack(step_logits, axis=1)
        np.testing.assert_allclose(stepped, np.asarray(full), atol=2e-4)

    def test_prefill_then_step_matches_full(self, tiny):
        cfg, params = tiny
        mel = jnp.asarray(_mel(1, seed=1))
        enc = encode_audio(params, cfg, mel)
        ckv = precompute_cross_kv(params, cfg, enc)
        toks = jnp.asarray([[50257, 50362, 11, 22, 33, 44]], dtype=jnp.int32)
        full, _ = decode_tokens(params, cfg, toks, cross_kv=ckv)

        cache = init_kv_cache(cfg, 1, 16)
        lg_pre, cache = decode_tokens(
            params, cfg, toks[:, :4], cross_kv=ckv, cache=cache, pos_offset=0
        )
        np.testing.assert_allclose(np.asarray(lg_pre), np.asarray(full[:, :4]), atol=2e-4)
        for t in (4, 5):
            lg, cache = decode_tokens(
                params, cfg, toks[:, t : t + 1], cross_kv=ckv, cache=cache, pos_offset=t
            )
            np.testing.assert_allclose(
                np.asarray(lg[:, 0]), np.asarray(full[:, t]), atol=2e-4
            )

    def test_left_padded_prefix(self, tiny):
        """A left-padded prompt with a key mask + explicit positions must match
        the same prompt without padding."""
        cfg, params = tiny
        mel = jnp.asarray(_mel(1, seed=2))
        enc = encode_audio(params, cfg, mel)
        ckv = precompute_cross_kv(params, cfg, enc)

        prompt = [50360, 5, 6, 50257, 50362]
        toks = jnp.asarray([prompt], dtype=jnp.int32)
        ref, _ = decode_tokens(params, cfg, toks, cross_kv=ckv)

        pad = 3
        cache_len = 16
        padded = jnp.asarray([[50256] * pad + prompt], dtype=jnp.int32)
        mask = jnp.asarray([[False] * pad + [True] * len(prompt)])
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0).astype(jnp.int32)
        # self_mask covers the whole cache: pad slots invalid, the rest valid
        key_mask = jnp.concatenate(
            [mask, jnp.ones((1, cache_len - mask.shape[1]), bool)], axis=1
        )
        cache = init_kv_cache(cfg, 1, cache_len)
        lg, _ = decode_tokens(
            params, cfg, padded, cross_kv=ckv, cache=cache, pos_offset=0,
            token_positions=positions, self_mask=key_mask,
        )
        np.testing.assert_allclose(
            np.asarray(lg[0, pad:]), np.asarray(ref[0]), atol=2e-4
        )


@pytest.mark.slow
class TestHFParity:
    """Diff our forward pass against HF's torch kernels with identical
    (randomly initialized) weights, both sides in float64 — any residual
    beyond ~1e-10 would be a semantic (not rounding) difference."""

    @pytest.fixture(scope="class")
    def pair(self):
        import torch
        from transformers import WhisperConfig as HFConfig, WhisperModel

        hf_cfg = HFConfig(
            vocab_size=51864, num_mel_bins=80, d_model=64,
            encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=2, decoder_attention_heads=2,
            encoder_ffn_dim=256, decoder_ffn_dim=256,
            max_source_positions=64, max_target_positions=448,
        )
        torch.manual_seed(0)
        hf = WhisperModel(hf_cfg).double().eval()
        params, cfg = load_torch_model(hf)
        cfg = WhisperConfig(**{**cfg.__dict__, "dtype": "float64", "n_audio_ctx": 64})
        # keep a host-side f64 copy; jnp arrays are materialized inside
        # enable_x64 in each test (x32 mode would truncate them here)
        params = jax.tree.map(lambda a: np.asarray(a, dtype=np.float64), params)
        return hf, params, cfg

    def test_config_inferred(self, pair):
        _, _, cfg = pair
        assert cfg.d_model == 64 and cfg.n_audio_layers == 2 and cfg.n_vocab == 51864

    def test_encoder_parity(self, pair):
        import torch

        hf, params, cfg = pair
        with enable_x64():
            p64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), params)
            mel = _mel(2, seed=3, frames=128).astype(np.float64)
            with torch.no_grad():
                theirs = hf.encoder(torch.tensor(mel)).last_hidden_state.numpy()
            ours = np.asarray(encode_audio(p64, cfg, jnp.asarray(mel)))
            np.testing.assert_allclose(ours, theirs, atol=1e-10)

    def test_full_model_parity(self, pair):
        import torch

        hf, params, cfg = pair
        with enable_x64():
            p64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), params)
            mel = _mel(2, seed=4, frames=128).astype(np.float64)
            toks = np.array(
                [[50257, 50362, 10, 20], [50257, 50362, 30, 40]], dtype=np.int64
            )
            with torch.no_grad():
                theirs = hf(
                    input_features=torch.tensor(mel),
                    decoder_input_ids=torch.tensor(toks),
                ).last_hidden_state.numpy()
            enc = encode_audio(p64, cfg, jnp.asarray(mel))
            logits, _ = decode_tokens(p64, cfg, jnp.asarray(toks, jnp.int32), enc_out=enc)
            # project HF hidden states with the tied embedding: logit-space compare
            emb = np.asarray(p64["decoder"]["token_emb"])
            theirs_logits = theirs @ emb.T
            np.testing.assert_allclose(np.asarray(logits), theirs_logits, atol=1e-9)


@pytest.mark.slow
class TestGenerateParity:
    """Transcript-level bit-match vs the torch reference path: HF
    ``model.generate`` (greedy, the reference's GenerationConfig setup with
    cleared suppress lists, /root/reference/scripts/train.py:204-210) must
    produce token-identical output to our while_loop greedy_decode on the
    same weights and mel. Both sides f64 so argmax ties cannot flip on
    rounding — any mismatch is a semantic divergence of the decode loop
    (SURVEY.md §7 hard-parts: greedy path divergence is the north-star
    bit-match risk)."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_greedy_transcripts_bit_match(self, seed):
        import torch
        from transformers import (
            GenerationConfig,
            WhisperConfig as HFConfig,
            WhisperForConditionalGeneration,
        )

        hf_cfg = HFConfig(
            vocab_size=51864, num_mel_bins=80, d_model=64,
            encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=2, decoder_attention_heads=2,
            encoder_ffn_dim=256, decoder_ffn_dim=256,
            max_source_positions=64, max_target_positions=448,
            decoder_start_token_id=50257, eos_token_id=50256,
            pad_token_id=50256,
        )
        torch.manual_seed(seed)
        hf = WhisperForConditionalGeneration(hf_cfg).double().eval()
        gen = GenerationConfig(
            max_length=24, use_cache=True, decoder_start_token_id=50257,
            eos_token_id=50256, pad_token_id=50256,
        )
        gen.suppress_tokens = None
        gen.begin_suppress_tokens = None
        gen.forced_decoder_ids = None
        hf.generation_config = gen

        mel = _mel(2, seed=seed + 100, frames=128).astype(np.float64) * 0.5
        with torch.no_grad():
            theirs = hf.generate(
                torch.tensor(mel), max_length=24, do_sample=False, num_beams=1
            ).numpy()  # (B, 23): HF strips the decoder_start token

        params, cfg = load_torch_model(hf)
        cfg = WhisperConfig(**{**cfg.__dict__, "dtype": "float64", "n_audio_ctx": 64})
        with enable_x64():
            p64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float64)), params)
            ids, mask = pack_prefixes([[50257]] * 2, 50256)
            res = greedy_decode(
                p64, cfg, jnp.asarray(mel), jnp.asarray(ids), jnp.asarray(mask),
                max_new=23, eot_id=50256,
            )
            ours = np.asarray(res.tokens)
        np.testing.assert_array_equal(ours, theirs)


@pytest.mark.slow
class TestBeamGenerateParity:
    """Beam-search transcript parity vs HF ``generate(num_beams=k)`` with
    the HF early-stopping semantics (beam.py _hf_beam_loop). Both sides f64;
    any mismatch is a semantic divergence of candidate expansion, pool
    insertion, or the stopping rule."""

    @pytest.mark.parametrize("seed,early_stopping",
                             [(0, True), (1, False), (2, "never"), (3, True)])
    def test_beam_transcripts_bit_match(self, seed, early_stopping):
        import torch
        from transformers import (
            GenerationConfig,
            WhisperConfig as HFConfig,
            WhisperForConditionalGeneration,
        )

        from whisper_context_biasing_tpu.decode import beam_decode

        hf_cfg = HFConfig(
            vocab_size=51864, num_mel_bins=80, d_model=64,
            encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=2, decoder_attention_heads=2,
            encoder_ffn_dim=256, decoder_ffn_dim=256,
            max_source_positions=64, max_target_positions=448,
            decoder_start_token_id=50257, eos_token_id=50256,
            pad_token_id=50256,
        )
        torch.manual_seed(seed)
        hf = WhisperForConditionalGeneration(hf_cfg).double().eval()
        gen = GenerationConfig(
            max_length=16, use_cache=True, decoder_start_token_id=50257,
            eos_token_id=50256, pad_token_id=50256,
        )
        gen.suppress_tokens = None
        gen.begin_suppress_tokens = None
        gen.forced_decoder_ids = None
        hf.generation_config = gen

        mel = _mel(2, seed=seed + 200, frames=128).astype(np.float64) * 0.5
        with torch.no_grad():
            theirs = hf.generate(
                torch.tensor(mel), max_length=16, do_sample=False,
                num_beams=3, early_stopping=early_stopping,
                length_penalty=1.0,
            ).numpy()  # (B, <=15): HF strips the decoder_start token

        params, cfg = load_torch_model(hf)
        cfg = WhisperConfig(**{**cfg.__dict__, "dtype": "float64", "n_audio_ctx": 64})
        mode = {True: "true", False: "false", "never": "never"}[early_stopping]
        with enable_x64():
            p64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float64)), params)
            ids, mask = pack_prefixes([[50257]] * 2, 50256)
            res = beam_decode(
                p64, cfg, jnp.asarray(mel), jnp.asarray(ids), jnp.asarray(mask),
                num_beams=3, max_new=15, eot_id=50256,
                early_stopping=mode,
            )
            ours = np.asarray(res.best)
        # HF trims trailing all-pad columns; ours is eot-padded to max_new
        np.testing.assert_array_equal(ours[:, : theirs.shape[1]], theirs)
        assert (ours[:, theirs.shape[1]:] == 50256).all()
