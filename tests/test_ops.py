"""Pallas kernel tests (interpret mode on CPU): flash attention vs the jnp
reference, fused log-mel vs the numpy reference, and flash-enabled encoder
forward parity."""

import numpy as np
import pytest
import jax.numpy as jnp

from whisper_context_biasing_tpu.audio import log_mel_spectrogram_np
from whisper_context_biasing_tpu.models import encode_audio, init_params, tiny_test_config
from whisper_context_biasing_tpu.models.whisper import attention
from whisper_context_biasing_tpu.ops import flash_attention
from whisper_context_biasing_tpu.ops.mel_kernel import log_mel_spectrogram_fused


class TestFlashAttention:
    @pytest.mark.parametrize("t,block_q", [(256, 128), (300, 128), (257, 256)])
    def test_matches_reference(self, t, block_q):
        rng = np.random.default_rng(0)
        b, d, h = 2, 64, 2
        q, k, v = (jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
                   for _ in range(3))
        ref = attention(q, k, v, h)
        out = flash_attention(q, k, v, h, block_q=block_q, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16(self):
        rng = np.random.default_rng(1)
        b, t, d, h = 1, 128, 128, 4
        mk = lambda: jnp.asarray(  # noqa: E731
            rng.standard_normal((b, t, d)).astype(np.float32)
        ).astype(jnp.bfloat16)
        q, k, v = mk(), mk(), mk()
        ref = attention(q, k, v, h).astype(jnp.float32)
        out = flash_attention(q, k, v, h, block_q=128, interpret=True).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)

    def test_encoder_with_flash_matches_xla(self):
        cfg_x = tiny_test_config()
        cfg_f = tiny_test_config(flash_attention=True, flash_interpret=True)
        params = init_params(cfg_x, 0)
        rng = np.random.default_rng(2)
        mel = jnp.asarray((rng.standard_normal((2, 80, 128)) * 0.4).astype(np.float32))
        ref = np.asarray(encode_audio(params, cfg_x, mel))
        out = np.asarray(encode_audio(params, cfg_f, mel))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    @pytest.mark.parametrize("t,block_q", [(256, 128), (300, 128), (200, 256)])
    def test_causal_matches_reference(self, t, block_q):
        rng = np.random.default_rng(4)
        b, d, h = 2, 64, 2
        q, k, v = (jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
                   for _ in range(3))
        mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
        ref = attention(q, k, v, h, mask)
        out = flash_attention(q, k, v, h, causal=True, block_q=block_q,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("tq,tk", [(100, 384), (256, 300)])
    def test_cross_shape_matches_reference(self, tq, tk):
        """Tq != Tk (decoder cross-attention shape)."""
        rng = np.random.default_rng(5)
        b, d, h = 2, 64, 2
        q = jnp.asarray(rng.standard_normal((b, tq, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, tk, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, tk, d)).astype(np.float32))
        ref = attention(q, k, v, h)
        out = flash_attention(q, k, v, h, block_q=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_decoder_full_seq_with_flash_matches_xla(self):
        """Training-mode decoder forward (causal self-attn + cross-attn both
        flash) matches the XLA path."""
        from whisper_context_biasing_tpu.models import decode_tokens

        cfg_x = tiny_test_config()
        cfg_f = tiny_test_config(flash_attention=True, flash_interpret=True,
                                 flash_decoder_min_seq=0)
        params = init_params(cfg_x, 0)
        rng = np.random.default_rng(6)
        mel = jnp.asarray((rng.standard_normal((2, 80, 128)) * 0.4).astype(np.float32))
        enc = encode_audio(params, cfg_x, mel)
        toks = jnp.asarray(rng.integers(0, 1000, size=(2, 7)), jnp.int32)
        ref, _ = decode_tokens(params, cfg_x, toks, enc_out=enc)
        out, _ = decode_tokens(params, cfg_f, toks, enc_out=enc)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


class TestFusedMel:
    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(0)
        sig = (rng.standard_normal((2, 480000)) * 0.3).astype(np.float32)
        out = np.asarray(log_mel_spectrogram_fused(jnp.asarray(sig), interpret=True))
        ref = np.stack([log_mel_spectrogram_np(s) for s in sig])
        assert out.shape == (2, 80, 3000)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_128_mels(self):
        rng = np.random.default_rng(1)
        sig = (rng.standard_normal((1, 480000)) * 0.2).astype(np.float32)
        out = np.asarray(log_mel_spectrogram_fused(jnp.asarray(sig), n_mels=128,
                                                   interpret=True))
        ref = log_mel_spectrogram_np(sig[0], n_mels=128)
        np.testing.assert_allclose(out[0], ref, atol=1e-4)


@pytest.mark.slow
class TestFlashAttentionVJP:
    def test_grads_match_xla(self):
        import jax

        rng = np.random.default_rng(3)
        b, t, d, h = 2, 300, 64, 2
        q, k, v = (jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
                   for _ in range(3))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(attention(q, k, v, h)))

        def loss_fa(q, k, v):
            return jnp.sum(jnp.sin(flash_attention(q, k, v, h, block_q=128,
                                                   interpret=True)))

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gr, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-6)

    def test_causal_grads_match_xla(self):
        import jax

        rng = np.random.default_rng(7)
        b, t, d, h = 2, 200, 64, 2
        q, k, v = (jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
                   for _ in range(3))
        mask = jnp.tril(jnp.ones((t, t), bool))[None, None]

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(attention(q, k, v, h, mask)))

        def loss_fa(q, k, v):
            return jnp.sum(jnp.sin(flash_attention(q, k, v, h, causal=True,
                                                   block_q=128, interpret=True)))

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gr, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-6)

    def test_cross_shape_grads_match_xla(self):
        import jax

        rng = np.random.default_rng(8)
        b, tq, tk, d, h = 2, 100, 300, 64, 2
        q = jnp.asarray(rng.standard_normal((b, tq, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, tk, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, tk, d)).astype(np.float32))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(attention(q, k, v, h)))

        def loss_fa(q, k, v):
            return jnp.sum(jnp.sin(flash_attention(q, k, v, h, block_q=128,
                                                   interpret=True)))

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gr, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-6)

    def test_train_step_with_flash(self):
        """Full WeightCE train step differentiates through the flash kernel."""
        import jax

        from whisper_context_biasing_tpu.train import (
            init_train_state, make_optimizer, make_train_step,
        )

        cfg = tiny_test_config(flash_attention=True, flash_interpret=True,
                               flash_decoder_min_seq=0)
        params = init_params(cfg, 0)
        rng = np.random.default_rng(0)
        batch = {
            "input_features": jnp.asarray(
                (rng.standard_normal((2, 80, 128)) * 0.3).astype(np.float32)),
            "decoder_input_ids": jnp.asarray([[50257, 5, 6, 7]] * 2, jnp.int32),
            "labels": jnp.asarray([[5, 6, 7, 50256]] * 2, jnp.int32),
            "bias_spans": jnp.asarray(np.full((2, 1, 2), 50256, np.int32)),
        }
        opt = make_optimizer(peak_lr=1e-4, warmup_steps=0, total_steps=10)
        step = make_train_step(cfg, opt, donate=False)
        state, m = step(init_train_state(params, opt), batch)
        assert np.isfinite(float(m["loss"]))

        # gradients must match the XLA-attention config
        cfg_x = tiny_test_config()
        step_x = make_train_step(cfg_x, opt, donate=False)
        state_x, m_x = step_x(init_train_state(params, opt), batch)
        assert float(m["loss"]) == pytest.approx(float(m_x["loss"]), rel=1e-5)
        d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.params, state_x.params)
        assert max(jax.tree.leaves(d)) < 1e-5


class TestRematPolicies:
    @pytest.mark.parametrize("remat", ["dots", "wide", "none"])
    def test_loss_and_grads_match_full(self, remat):
        """All remat policies compute identical losses and (to fp tolerance)
        gradients — they only trade HBM for recompute FLOPs."""
        import jax

        from whisper_context_biasing_tpu.train import (
            init_train_state, make_optimizer, make_train_step,
        )

        rng = np.random.default_rng(0)
        batch = {
            "input_features": jnp.asarray(
                (rng.standard_normal((2, 80, 128)) * 0.3).astype(np.float32)),
            "decoder_input_ids": jnp.asarray([[50257, 5, 6, 7]] * 2, jnp.int32),
            "labels": jnp.asarray([[5, 6, 7, 50256]] * 2, jnp.int32),
            "bias_spans": jnp.asarray(np.full((2, 1, 2), 50256, np.int32)),
        }
        opt = make_optimizer(peak_lr=1e-4, warmup_steps=0, total_steps=10)

        def run(policy):
            cfg = tiny_test_config(remat=policy)
            params = init_params(cfg, 0)
            step = make_train_step(cfg, opt, donate=False)
            return step(init_train_state(params, opt), batch)

        s_full, m_full = run("full")
        s_alt, m_alt = run(remat)
        assert float(m_alt["loss"]) == pytest.approx(float(m_full["loss"]), rel=1e-6)
        d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         s_alt.params, s_full.params)
        assert max(jax.tree.leaves(d)) < 1e-5

    def test_unknown_policy_raises(self):
        from whisper_context_biasing_tpu.models import encode_audio

        cfg = tiny_test_config(remat="bogus")
        params = init_params(cfg, 0)
        mel = jnp.zeros((1, 80, 128), jnp.float32)
        with pytest.raises(ValueError, match="remat"):
            encode_audio(params, cfg, mel)


@pytest.mark.slow
class TestQuantizedCrossKV:
    def test_greedy_tokens_match_fp(self):
        import jax.numpy as jnp
        from whisper_context_biasing_tpu.decode import greedy_decode, pack_prefixes

        cfg0 = tiny_test_config()
        cfgq = tiny_test_config(quantize_cross_kv=True)
        params = init_params(cfg0, 0)
        rng = np.random.default_rng(0)
        mel = jnp.asarray((rng.standard_normal((2, 80, 128)) * 0.5).astype(np.float32))
        ids, mask = pack_prefixes([[50257], [50257]], 50256)
        a = greedy_decode(params, cfg0, mel, jnp.asarray(ids), jnp.asarray(mask), max_new=8)
        b = greedy_decode(params, cfgq, mel, jnp.asarray(ids), jnp.asarray(mask), max_new=8)
        # int8 K/V perturbs logits ~0.4%; greedy paths agree on random models
        np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))

    def test_fused_kernel_matches_xla_quant_path(self):
        """ops/quant_cross_attention (interpret mode) == the XLA
        _attention_quant_cross path, single-token query."""
        import jax.numpy as jnp
        from whisper_context_biasing_tpu.models.whisper import (
            _attention_quant_cross, quantize_cross_kv,
        )
        from whisper_context_biasing_tpu.ops.quant_cross_attention import (
            quant_cross_attention_step,
        )

        rng = np.random.default_rng(2)
        L, B, T, D, H = 1, 3, 200, 128, 4  # T pads 200 -> 256
        k = jnp.asarray(rng.standard_normal((L, B, T, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((L, B, T, D)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32))
        kv = {kk: vv[0] for kk, vv in quantize_cross_kv((k, v)).items()}
        ref = _attention_quant_cross(q, kv, H)
        got = quant_cross_attention_step(
            q, kv["k_q"], kv["k_s"], kv["v_q"], kv["v_s"], H, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_indexed_kernel_selects_layer(self):
        """quant_cross_attention_step_indexed reads layer l of the stacked
        (L, ...) K/V via the scalar-prefetch index map — must equal the
        per-layer kernel for every l."""
        import jax.numpy as jnp
        from whisper_context_biasing_tpu.models.whisper import quantize_cross_kv
        from whisper_context_biasing_tpu.ops.quant_cross_attention import (
            quant_cross_attention_step,
            quant_cross_attention_step_indexed,
        )

        rng = np.random.default_rng(4)
        L, B, T, D, H = 3, 2, 200, 128, 4
        k = jnp.asarray(rng.standard_normal((L, B, T, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((L, B, T, D)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32))
        kv = quantize_cross_kv((k, v))
        for l in range(L):
            ref = quant_cross_attention_step(
                q, kv["k_q"][l], kv["k_s"][l], kv["v_q"][l], kv["v_s"][l],
                H, interpret=True)
            got = quant_cross_attention_step_indexed(
                q, kv["k_q"], kv["k_s"], kv["v_q"], kv["v_s"],
                jnp.int32(l), H, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-6, rtol=1e-6)

    def test_fused_kernel_greedy_tokens_match(self):
        """End-to-end: greedy decode with fused_quant_cross (interpret) ==
        plain quantized decode."""
        import jax.numpy as jnp
        from whisper_context_biasing_tpu.decode import greedy_decode, pack_prefixes

        cfgq = tiny_test_config(quantize_cross_kv=True)
        cfgf = tiny_test_config(quantize_cross_kv=True, fused_quant_cross=True,
                                flash_interpret=True)
        params = init_params(cfgq, 0)
        rng = np.random.default_rng(3)
        mel = jnp.asarray((rng.standard_normal((2, 80, 128)) * 0.5).astype(np.float32))
        ids, mask = pack_prefixes([[50257], [50257]], 50256)
        a = greedy_decode(params, cfgq, mel, jnp.asarray(ids), jnp.asarray(mask), max_new=8)
        b = greedy_decode(params, cfgf, mel, jnp.asarray(ids), jnp.asarray(mask), max_new=8)
        np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))

    def test_quantization_error_bounded(self):
        import jax.numpy as jnp
        from whisper_context_biasing_tpu.models.whisper import (
            _attention_quant_cross, attention, quantize_cross_kv,
        )

        rng = np.random.default_rng(1)
        L, B, T, D, H = 2, 2, 64, 64, 2
        k = jnp.asarray(rng.standard_normal((L, B, T, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((L, B, T, D)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((B, 3, D)).astype(np.float32))
        kv = quantize_cross_kv((k, v))
        for l in range(L):
            ref = attention(q, k[l], v[l], H)
            got = _attention_quant_cross(
                q, {kk: vv[l] for kk, vv in kv.items()}, H
            )
            err = float(jnp.max(jnp.abs(got - ref)))
            mag = float(jnp.max(jnp.abs(ref)))
            assert err < 0.02 * mag + 0.01, (err, mag)


@pytest.mark.slow
class TestQuantizedDecoderWeights:
    def test_greedy_tokens_match_fp(self):
        import jax.numpy as jnp
        from whisper_context_biasing_tpu.decode import greedy_decode, pack_prefixes
        from whisper_context_biasing_tpu.models.whisper import quantize_decoder_weights

        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        qparams = quantize_decoder_weights(params)
        rng = np.random.default_rng(0)
        mel = jnp.asarray((rng.standard_normal((2, 80, 128)) * 0.5).astype(np.float32))
        ids, mask = pack_prefixes([[50257], [50257]], 50256)
        a = greedy_decode(params, cfg, mel, jnp.asarray(ids), jnp.asarray(mask), max_new=8)
        b = greedy_decode(qparams, cfg, mel, jnp.asarray(ids), jnp.asarray(mask), max_new=8)
        np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))

    def test_memory_halved(self):
        import jax
        from whisper_context_biasing_tpu.models.whisper import quantize_decoder_weights

        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        q = quantize_decoder_weights(params)
        def nbytes(t):
            return sum(np.asarray(x).nbytes for x in jax.tree.leaves(t))
        # decoder weights (f32 originals) vs int8+scales
        orig = nbytes(params["decoder"]["mlp"])
        quant = nbytes(q["decoder"]["mlp"])
        assert quant < 0.3 * orig  # int8 vs f32 plus small scales


class TestGeluApprox:
    def test_encoder_error_below_bf16_rounding(self):
        """cfg.gelu_approx (tanh) vs exact erf gelu: the output difference
        must stay within bf16 rounding of the activations, the acceptance
        argument for enabling it in bf16 serving configs (docs/PERF.md)."""
        import jax.numpy as jnp

        from whisper_context_biasing_tpu.models import (
            encode_audio, init_params, tiny_test_config,
        )

        cfg_e = tiny_test_config(dtype="float32")
        cfg_a = tiny_test_config(dtype="float32", gelu_approx=True)
        params = init_params(cfg_e, 0)
        rng = np.random.default_rng(0)
        mel = jnp.asarray((rng.standard_normal((2, 80, 128)) * 0.5).astype(np.float32))
        exact = np.asarray(encode_audio(params, cfg_e, mel))
        approx = np.asarray(encode_audio(params, cfg_a, mel))
        scale = np.abs(exact).max()
        assert np.abs(approx - exact).max() < 0.008 * scale  # bf16 eps ~ 0.0078


class TestFusedLnMatmul:
    """ops/fused_block.py: fused LayerNorm+matmul(+bias+gelu) kernel
    (interpret mode) vs the unfused XLA ops, forward and gradients."""

    def _xla_ref(self, x, g, beta, w, b, act):
        from whisper_context_biasing_tpu.models.whisper import layer_norm

        y = layer_norm(x, g, beta)
        out = jnp.dot(y.astype(w.dtype), w,
                      preferred_element_type=jnp.float32)
        out = out + b.astype(jnp.float32)
        if act == "gelu":
            import jax
            out = jax.nn.gelu(out, approximate=False)
        return out.astype(x.dtype)

    @pytest.mark.parametrize("act", [None, "gelu"])
    @pytest.mark.parametrize("rows,d,e", [(128, 64, 192), (100, 64, 256)])
    def test_matches_unfused(self, act, rows, d, e):
        from whisper_context_biasing_tpu.ops import fused_ln_matmul

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, rows, d)).astype(np.float32))
        g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
        beta = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((d, e)).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.standard_normal(e).astype(np.float32) * 0.05)
        ref = self._xla_ref(x, g, beta, w, b, act)
        out = fused_ln_matmul(x, g, beta, w, b, act=act, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_col_tiling_matches(self, monkeypatch):
        """Force the weight into multiple col tiles; output must not change."""
        import whisper_context_biasing_tpu.ops.fused_block as fb

        rng = np.random.default_rng(1)
        d, e = 64, 512
        x = jnp.asarray(rng.standard_normal((1, 64, d)).astype(np.float32))
        g = jnp.ones((d,), jnp.float32)
        beta = jnp.zeros((d,), jnp.float32)
        w = jnp.asarray(rng.standard_normal((d, e)).astype(np.float32) * 0.05)
        one = fb.fused_ln_matmul(x, g, beta, w, act="gelu", interpret=True)
        monkeypatch.setattr(fb, "_W_TILE_BYTES", d * e)  # forces e//2 tiles
        fb.fused_ln_matmul.clear_cache()
        split = fb.fused_ln_matmul(x, g, beta, w, act="gelu", interpret=True)
        fb.fused_ln_matmul.clear_cache()
        np.testing.assert_allclose(np.asarray(split), np.asarray(one),
                                   atol=1e-6)

    def test_grads_match_unfused(self):
        import jax

        from whisper_context_biasing_tpu.ops import fused_ln_matmul

        rng = np.random.default_rng(2)
        d, e = 64, 192
        x = jnp.asarray(rng.standard_normal((2, 40, d)).astype(np.float32))
        g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
        beta = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((d, e)).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.standard_normal(e).astype(np.float32) * 0.05)

        def loss_fused(x, g, beta, w, b):
            o = fused_ln_matmul(x, g, beta, w, b, act="gelu", interpret=True)
            return jnp.sum(o * o)

        def loss_ref(x, g, beta, w, b):
            return jnp.sum(self._xla_ref(x, g, beta, w, b, "gelu") ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, g, beta, w, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, g, beta, w, b)
        for a, r in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=2e-4, rtol=1e-4)

    def test_encoder_fused_matches_xla(self):
        """End-to-end encoder parity with both fused paths on."""
        cfg_x = tiny_test_config()
        cfg_f = tiny_test_config(fused_ln_qkv=True, fused_ln_mlp=True,
                                 flash_interpret=True)
        params = init_params(cfg_x, 0)
        rng = np.random.default_rng(3)
        mel = jnp.asarray((rng.standard_normal((2, 80, 128)) * 0.4
                           ).astype(np.float32))
        ref = np.asarray(encode_audio(params, cfg_x, mel))
        out = np.asarray(encode_audio(params, cfg_f, mel))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_train_step_fused_matches_xla(self):
        """Full WeightCE train step with fused LN+QKV / LN+MLP kernels:
        loss and one-step parameter updates match the XLA config."""
        import jax

        from whisper_context_biasing_tpu.train import (
            init_train_state, make_optimizer, make_train_step,
        )

        cfg_f = tiny_test_config(fused_ln_qkv=True, fused_ln_mlp=True,
                                 flash_interpret=True)
        cfg_x = tiny_test_config()
        params = init_params(cfg_x, 0)
        rng = np.random.default_rng(4)
        batch = {
            "input_features": jnp.asarray(
                (rng.standard_normal((2, 80, 128)) * 0.3).astype(np.float32)),
            "decoder_input_ids": jnp.asarray([[50257, 5, 6, 7]] * 2, jnp.int32),
            "labels": jnp.asarray([[5, 6, 7, 50256]] * 2, jnp.int32),
            "bias_spans": jnp.asarray(np.full((2, 1, 2), 50256, np.int32)),
        }
        opt = make_optimizer(peak_lr=1e-4, warmup_steps=0, total_steps=10)
        state_f, m_f = make_train_step(cfg_f, opt, donate=False)(
            init_train_state(params, opt), batch)
        state_x, m_x = make_train_step(cfg_x, opt, donate=False)(
            init_train_state(params, opt), batch)
        assert float(m_f["loss"]) == pytest.approx(float(m_x["loss"]), rel=1e-5)
        d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state_f.params, state_x.params)
        assert max(jax.tree.leaves(d)) < 1e-5

    def test_quantized_weights_keep_xla_path(self):
        """Int8 weight dicts must bypass the fused kernels (decode configs)."""
        from whisper_context_biasing_tpu.models.whisper import (
            quantize_decoder_weights,
        )
        from whisper_context_biasing_tpu.models import decode_tokens

        cfg = tiny_test_config(fused_ln_qkv=True, fused_ln_mlp=True,
                               flash_interpret=True, flash_decoder=False)
        params = quantize_decoder_weights(init_params(cfg, 0))
        rng = np.random.default_rng(5)
        mel = jnp.asarray((rng.standard_normal((1, 80, 128)) * 0.4
                           ).astype(np.float32))
        enc = encode_audio(params, cfg, mel)
        toks = jnp.asarray([[50257, 5, 6]], jnp.int32)
        logits = decode_tokens(params, cfg, toks, enc)[0]
        assert np.isfinite(np.asarray(logits)).all()
