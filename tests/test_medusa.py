"""Medusa self-speculative decoding: exactness vs plain greedy (untrained
and trained heads), bias composition, eot/termination, head training."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from whisper_context_biasing_tpu.decode import medusa_greedy_decode
from whisper_context_biasing_tpu.decode.greedy import greedy_decode, pack_prefixes
from whisper_context_biasing_tpu.models import (
    init_medusa_params,
    init_params,
    load_medusa,
    medusa_logits,
    save_medusa,
    tiny_test_config,
)

EOT = 50256


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = init_params(cfg, 0)
    rng = np.random.default_rng(0)
    mel = (rng.standard_normal((3, 80, 128)) * 0.5).astype(np.float32)
    return cfg, params, jnp.asarray(mel)


def _greedy(params, cfg, mel, ids, mask, max_new, **kw):
    res = greedy_decode(params, cfg, mel, jnp.asarray(ids), jnp.asarray(mask),
                        max_new=max_new, **kw)
    return np.asarray(res.tokens), np.asarray(res.lengths)


@pytest.mark.slow
class TestMedusaExactness:
    def test_untrained_heads_match_greedy(self, setup):
        """Verification guarantees greedy-identical output for ANY head
        quality — including freshly initialized heads."""
        cfg, params, mel = setup
        medusa = init_medusa_params(cfg, 3, 0)
        ids, mask = pack_prefixes([[50257]] * 3, EOT)
        ref_t, ref_l = _greedy(params, cfg, mel, ids, mask, 12)
        res = medusa_greedy_decode(params, cfg, medusa, mel,
                                   jnp.asarray(ids), jnp.asarray(mask),
                                   max_new=12)
        np.testing.assert_array_equal(np.asarray(res.tokens), ref_t)
        np.testing.assert_array_equal(np.asarray(res.lengths), ref_l)
        assert int(res.spec_rounds) >= 1

    def test_bias_boost_exactness(self, setup):
        cfg, params, mel = setup
        medusa = init_medusa_params(cfg, 2, 1)
        spans = np.full((3, 2, 3), EOT, np.int32)
        spans[:, 0, :2] = [500, 501]
        ids, mask = pack_prefixes([[50257]] * 3, EOT)
        kw = dict(bias_spans=jnp.asarray(spans), bias_boost=2.0)
        ref_t, ref_l = _greedy(params, cfg, mel, ids, mask, 10, **kw)
        res = medusa_greedy_decode(params, cfg, medusa, mel,
                                   jnp.asarray(ids), jnp.asarray(mask),
                                   max_new=10, **kw)
        np.testing.assert_array_equal(np.asarray(res.tokens), ref_t)
        np.testing.assert_array_equal(np.asarray(res.lengths), ref_l)

    def test_ragged_prefixes_and_logprob_parity(self, setup):
        cfg, params, mel = setup
        medusa = init_medusa_params(cfg, 2, 2)
        prefixes = [[50257], [50361, 99, 100, 50257], [50361, 7, 50257]]
        ids, mask = pack_prefixes(prefixes, EOT)
        g = greedy_decode(params, cfg, mel, jnp.asarray(ids),
                          jnp.asarray(mask), max_new=8)
        res = medusa_greedy_decode(params, cfg, medusa, mel,
                                   jnp.asarray(ids), jnp.asarray(mask),
                                   max_new=8)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(g.tokens))
        np.testing.assert_allclose(np.asarray(res.sum_logprob),
                                   np.asarray(g.sum_logprob),
                                   rtol=1e-4, atol=1e-4)

    def test_trained_heads_accelerate_and_stay_exact(self, setup):
        """Oracle heads (trained to predict the model's own continuation)
        must still bit-match greedy while finishing in fewer rounds."""
        cfg, params, mel = setup
        max_new = 12
        ids, mask = pack_prefixes([[50257]] * 3, EOT)
        ref_t, _ = _greedy(params, cfg, mel, ids, mask, max_new)

        base = init_medusa_params(cfg, 2, 3)
        r0 = medusa_greedy_decode(params, cfg, base, mel, jnp.asarray(ids),
                                  jnp.asarray(mask), max_new=max_new)
        rounds_untrained = int(r0.spec_rounds)

        # cheat-train: fit the two heads on the model's own hidden states /
        # continuations over this exact input (a tiny gradient fit)
        import optax

        from whisper_context_biasing_tpu.models import (
            encode_audio,
            decode_tokens,
        )

        enc = encode_audio(params, cfg, mel)
        seq = jnp.concatenate([jnp.asarray(ids), jnp.asarray(ref_t)], axis=1)
        _, _, hid = decode_tokens(params, cfg, seq, enc_out=enc,
                                  return_hidden=True)
        s = seq.shape[1]

        def loss_fn(md):
            lg = medusa_logits(params, md, hid)  # (K, B, S, V)
            total = 0.0
            for j in (1, 2):  # head j at t predicts seq[t+1+j]
                lgj = lg[j - 1][:, : s - 1 - j]
                tgt = seq[:, 1 + j:]
                lp = jax.nn.log_softmax(lgj.astype(jnp.float32), axis=-1)
                nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)
                total = total + jnp.mean(nll)
            return total

        opt = optax.adam(3e-2)
        md = base
        ost = opt.init(md)
        step = jax.jit(lambda m, o: (lambda g: (
            optax.apply_updates(m, opt.update(g, o, m)[0]),
            opt.update(g, o, m)[1]))(jax.grad(loss_fn)(m)))
        for _ in range(60):
            md, ost = step(md, ost)

        r1 = medusa_greedy_decode(params, cfg, md, mel, jnp.asarray(ids),
                                  jnp.asarray(mask), max_new=max_new)
        np.testing.assert_array_equal(np.asarray(r1.tokens), ref_t)
        # trained heads never hurt, and self-speculation genuinely
        # accelerates: fewer verify rounds than emitted tokens. (A strict
        # improvement isn't guaranteed here — random-weight continuations
        # degenerate to repeats, which near-identity untrained heads already
        # predict well.)
        assert int(r1.spec_rounds) <= rounds_untrained
        assert int(r1.spec_rounds) < int(np.asarray(r1.lengths).max())

    def test_quantized_cross_kv_matches_quantized_greedy(self, setup):
        """The fast serving config (int8 cross-KV) rides the
        _attention_quant_cross s>1 branch for medusa chunks; exactness
        must hold within that numeric config, incl. chain mode."""
        from whisper_context_biasing_tpu.models import tiny_test_config

        _, params, mel = setup
        cfgq = tiny_test_config(quantize_cross_kv=True)
        medusa = init_medusa_params(cfgq, 2, 5)
        ids, mask = pack_prefixes([[50257]] * 3, EOT)
        ref_t, ref_l = _greedy(params, cfgq, mel, ids, mask, 9)
        for s in (1, 2):
            res = medusa_greedy_decode(params, cfgq, medusa, mel,
                                       jnp.asarray(ids), jnp.asarray(mask),
                                       max_new=9, n_chains=s)
            np.testing.assert_array_equal(np.asarray(res.tokens), ref_t)
            np.testing.assert_array_equal(np.asarray(res.lengths), ref_l)


@pytest.mark.slow
class TestMedusaChains:
    """n_chains>1: depth-1 branching on head-1's top-s candidates with a
    tree-attention mask. Exactness must hold for any heads; accepting a
    chain other than chain 0 must leave the KV cache consistent (any slot
    corruption shows up as a bit-mismatch on later tokens)."""

    def test_chains_match_greedy_untrained(self, setup):
        cfg, params, mel = setup
        medusa = init_medusa_params(cfg, 2, 4)
        prefixes = [[50257], [50361, 99, 100, 50257], [50361, 7, 50257]]
        ids, mask = pack_prefixes(prefixes, EOT)
        spans = np.full((3, 2, 3), EOT, np.int32)
        spans[:, 0, :2] = [500, 501]
        kw = dict(bias_spans=jnp.asarray(spans), bias_boost=2.0)
        ref_t, ref_l = _greedy(params, cfg, mel, ids, mask, 10, **kw)
        for s in (2, 3):
            res = medusa_greedy_decode(params, cfg, medusa, mel,
                                       jnp.asarray(ids), jnp.asarray(mask),
                                       max_new=10, n_chains=s, **kw)
            np.testing.assert_array_equal(np.asarray(res.tokens), ref_t)
            np.testing.assert_array_equal(np.asarray(res.lengths), ref_l)

    def test_second_chain_rescues_corrupted_head(self, setup, monkeypatch,
                                                 request):
        """Corrupt head 1 so its argmax is its OLD second choice and vice
        versa (logit-level top-1/top-2 swap). Chain 0 then proposes the
        wrong token whenever the head was right, while its old (usually
        correct) prediction rides chain 1 — so n_chains=2 must finish in
        fewer rounds than n_chains=1 AND still bit-match greedy (proves the
        relocated best!=0 cache slots are the ones later rounds attend).
        Unique shapes (B=2, max_new=13) force a fresh jit trace under the
        patched medusa_logits; the compiled traces that baked the patched
        head are dropped from the process-wide jit cache afterwards so no
        later same-shape call can silently reuse them."""
        import whisper_context_biasing_tpu.decode.medusa as dm

        request.addfinalizer(dm.medusa_greedy_decode.clear_cache)

        cfg, params, mel = setup
        mel2 = mel[:2]
        max_new = 13
        ids, mask = pack_prefixes([[50257]] * 2, EOT)
        ref_t, ref_l = _greedy(params, cfg, mel2, ids, mask, max_new)

        real = medusa_logits

        def swapped(params_, md_, hidden_):
            lg = real(params_, md_, hidden_)
            l0 = lg[0]
            v2, i2 = jax.lax.top_k(l0, 2)
            v_dim = l0.shape[-1]
            delta = (jax.nn.one_hot(i2[..., 0], v_dim, dtype=l0.dtype)
                     * (v2[..., 1:2] - v2[..., 0:1])
                     + jax.nn.one_hot(i2[..., 1], v_dim, dtype=l0.dtype)
                     * (v2[..., 0:1] - v2[..., 1:2]))
            return lg.at[0].set(l0 + delta)

        monkeypatch.setattr(dm, "medusa_logits", swapped)
        md = init_medusa_params(cfg, 2, 7)
        r1 = medusa_greedy_decode(params, cfg, md, mel2, jnp.asarray(ids),
                                  jnp.asarray(mask), max_new=max_new,
                                  n_chains=1)
        r2 = medusa_greedy_decode(params, cfg, md, mel2, jnp.asarray(ids),
                                  jnp.asarray(mask), max_new=max_new,
                                  n_chains=2)
        np.testing.assert_array_equal(np.asarray(r1.tokens), ref_t)
        np.testing.assert_array_equal(np.asarray(r2.tokens), ref_t)
        np.testing.assert_array_equal(np.asarray(r2.lengths), ref_l)
        assert int(r2.spec_rounds) < int(r1.spec_rounds)


@pytest.mark.slow
class TestMedusaLongForm:
    def test_long_form_and_chunked_match_plain(self, setup):
        """medusa= in both long-form loops reproduces the plain loops'
        tokens exactly (self-speculative t=0 rung)."""
        from whisper_context_biasing_tpu.decode import (
            transcribe_chunked,
            transcribe_long_batch,
        )
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg, params, _ = setup
        md = init_medusa_params(cfg, 2, 5)
        tok = load_tokenizer()
        rng = np.random.default_rng(6)
        win = cfg.n_audio_ctx * 320
        audios = [rng.standard_normal(int(win * 1.5)).astype(np.float32) * 0.1,
                  rng.standard_normal(win // 2).astype(np.float32) * 0.1]

        def mel_fn(batch):
            from whisper_context_biasing_tpu.audio.mel import (
                log_mel_spectrogram_np,
            )
            return np.stack([log_mel_spectrogram_np(a)[:, :2 * cfg.n_audio_ctx]
                             for a in batch])

        kw = dict(mel_fn=mel_fn, max_new=6, temperatures=(0.0,),
                  no_speech_threshold=None, logprob_threshold=None,
                  compression_ratio_threshold=None, window_samples=win)
        assert transcribe_long_batch(params, cfg, tok, audios, medusa=md,
                                     **kw) == \
            transcribe_long_batch(params, cfg, tok, audios, **kw)
        ckw = dict(kw, use_timestamps=False)
        assert transcribe_chunked(params, cfg, tok, audios, medusa=md,
                                  **ckw) == \
            transcribe_chunked(params, cfg, tok, audios, **ckw)


class TestMedusaTraining:
    def test_expected_tokens_per_round(self):
        from whisper_context_biasing_tpu.train import expected_tokens_per_round

        assert expected_tokens_per_round([0.0, 0.0]) == pytest.approx(1.0)
        assert expected_tokens_per_round([1.0, 1.0]) == pytest.approx(3.0)
        assert expected_tokens_per_round([0.5, 0.5]) == pytest.approx(1.75)

    def test_head_accuracy_rises(self):
        from whisper_context_biasing_tpu.train import (
            init_train_state,
            make_medusa_train_step,
            make_optimizer,
        )

        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        md = init_medusa_params(cfg, 2, 1)
        opt = make_optimizer(peak_lr=5e-3, warmup_steps=0, total_steps=80)
        step = make_medusa_train_step(cfg, opt, 2, donate=False)
        rng = np.random.default_rng(0)
        b, s = 2, 12
        dec = rng.integers(0, 120, size=(b, s)).astype(np.int32)
        labels = np.concatenate([dec[:, 1:], np.full((b, 1), -100, np.int32)],
                                axis=1)
        batch = {
            "input_features": jnp.asarray(
                rng.standard_normal((b, 80, 128)), jnp.float32),
            "decoder_input_ids": jnp.asarray(dec),
            "labels": jnp.asarray(labels),
        }
        state = init_train_state(md, opt)
        first = None
        for _ in range(60):
            state, m = step(state, params, batch)
            if first is None:
                first = {k: np.asarray(v) for k, v in m.items()}
        assert float(m["loss"]) < float(first["loss"])
        assert float(np.mean(np.asarray(m["head_acc"]))) > float(
            np.mean(first["head_acc"]))

    def test_runner_writes_artifacts(self, tmp_path):
        from whisper_context_biasing_tpu.train import (
            MedusaConfig,
            train_medusa_heads,
        )

        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        md = init_medusa_params(cfg, 2, 1)
        rng = np.random.default_rng(3)

        class DS:
            def __init__(self, n):
                self.rows = []
                for _ in range(n):
                    dec = rng.integers(0, 120, size=8).astype(np.int64)
                    self.rows.append({
                        "input_features":
                            rng.standard_normal((80, 128)).astype(np.float32),
                        "decoder_input_ids": dec,
                        "labels": np.concatenate([dec[1:], [-100]]),
                    })

            def __len__(self):
                return len(self.rows)

            def __getitem__(self, i):
                return self.rows[i]

        def collate(rows):
            return {k: np.stack([r[k] for r in rows]).astype(
                        np.int32 if k != "input_features" else np.float32)
                    for k in rows[0]}

        mcfg = MedusaConfig(output_dir=str(tmp_path), n_heads=2,
                            per_device_train_batch_size=2,
                            num_train_epochs=1, warmup_steps=0,
                            eval_steps=2, logging_steps=1, eval_batches=1)
        heads, hist = train_medusa_heads(
            cfg, params, md, DS(4), DS(2), collate, mcfg)
        import json as _json
        import os as _os

        assert _os.path.isfile(_os.path.join(tmp_path, "medusa.npz"))
        with open(_os.path.join(tmp_path, "medusa_results.json")) as f:
            summary = _json.load(f)
        assert summary["n_heads"] == 2
        assert len(summary["eval_head_acc"]) == 2
        assert summary["eval_tokens_per_round"] >= 1.0
        back = load_medusa(str(tmp_path / "medusa.npz"))
        assert jnp.array_equal(back["w"], heads["w"])


class TestMedusaParams:
    def test_init_and_io(self, tmp_path):
        cfg = tiny_test_config()
        md = init_medusa_params(cfg, 4, 0)
        assert md["w"].shape == (4, 64, 64) and md["b"].shape == (4, 64)
        path = str(tmp_path / "medusa.npz")
        save_medusa(path, md)
        back = load_medusa(path)
        assert jnp.array_equal(back["w"], md["w"])

    def test_n_chains_roundtrip_and_split(self, tmp_path):
        from whisper_context_biasing_tpu.models import split_medusa

        cfg = tiny_test_config()
        md = init_medusa_params(cfg, 2, 0)
        heads, n = split_medusa(md)
        assert n == 1 and set(heads) == {"w", "b"}
        md["n_chains"] = 3
        path = str(tmp_path / "m.npz")
        save_medusa(path, md)
        back = load_medusa(path)
        assert back["n_chains"] == 3
        heads, n = split_medusa(back)
        assert n == 3 and set(heads) == {"w", "b"}
        assert jnp.array_equal(heads["w"], md["w"])

    def test_logits_shape_and_near_identity_at_init(self):
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        md = init_medusa_params(cfg, 3, 0)
        rng = np.random.default_rng(0)
        hid = jnp.asarray(rng.standard_normal((2, 5, 64)), jnp.float32)
        lg = medusa_logits(params, md, hid)
        assert lg.shape == (3, 2, 5, cfg.n_vocab)
        # near-zero head weights => all heads ~ the base projection of hid
        from whisper_context_biasing_tpu.models.whisper import project_vocab

        base = project_vocab(params, hid)
        np.testing.assert_allclose(np.asarray(lg[0]), np.asarray(base),
                                   atol=0.05)
