import os

"""Training layer tests: WeightCE parity against a literal replica of the
reference check-harness algorithm (scripts/check_WeightCE.py), optimizer/step
behavior, and checkpoint lifecycle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from whisper_context_biasing_tpu.train import (
    TrainingConfig,
    TrainState,
    bias_span_weights,
    find_best_checkpoint,
    init_train_state,
    latest_checkpoint,
    list_checkpoints,
    load_checkpoint,
    make_optimizer,
    make_train_step,
    save_checkpoint,
    warmup_cosine_schedule,
    weighted_ce_loss,
)
from whisper_context_biasing_tpu.models import init_params, tiny_test_config


class TestLoRA:
    def test_init_shapes_and_identity_merge(self):
        from whisper_context_biasing_tpu.train import (
            init_lora_params,
            lora_param_count,
            merge_lora,
        )

        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        lora = init_lora_params(params, 4, jax.random.PRNGKey(0))
        assert set(lora) == {"encoder", "decoder"}
        assert set(lora["decoder"]) == {"self_attn", "cross_attn"}
        a = lora["decoder"]["self_attn"]["wq"]["a"]
        b = lora["decoder"]["self_attn"]["wq"]["b"]
        assert a.shape == (2, 64, 4) and b.shape == (2, 4, 64)
        full = sum(int(x.size) for x in jax.tree.leaves(params))
        assert lora_param_count(lora) < full / 20
        # b zeros => merged == base exactly
        merged = merge_lora(params, lora, alpha=16.0)
        same = jax.tree.map(lambda x, y: bool(jnp.array_equal(x, y)),
                            params, merged)
        assert all(jax.tree.leaves(same))
        # decoder-only variant (freeze_encoder analog)
        dec_only = init_lora_params(params, 4, jax.random.PRNGKey(0),
                                    include_encoder=False)
        assert set(dec_only) == {"decoder"}

    def test_step_trains_adapters_only(self):
        from whisper_context_biasing_tpu.train import (
            init_lora_params,
            make_lora_train_step,
            merge_lora,
        )

        cfg = tiny_test_config()
        base = init_params(cfg, 0)
        base_host = jax.tree.map(np.asarray, base)
        lora = init_lora_params(base, 4, jax.random.PRNGKey(1))
        opt = make_optimizer(peak_lr=1e-2, warmup_steps=0, total_steps=30)
        step = make_lora_train_step(cfg, opt, donate=False)
        state = init_train_state(lora, opt)
        rng = np.random.default_rng(0)
        batch = {
            "input_features": jnp.asarray(
                rng.standard_normal((2, 80, 128)), jnp.float32),
            "decoder_input_ids": jnp.asarray([[50257, 5, 6, 7]] * 2, jnp.int32),
            "labels": jnp.asarray([[5, 6, 7, 50256]] * 2, jnp.int32),
            "bias_spans": jnp.full((2, 1, 2), 50256, jnp.int32),
        }
        first = None
        for _ in range(20):
            state, m = step(state, base, batch)
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first  # adapters actually learn
        # the base tree is untouched
        same = jax.tree.map(lambda x, y: bool(np.array_equal(np.asarray(x), y)),
                            base, base_host)
        assert all(jax.tree.leaves(same))
        # and the learned merge differs from the base
        merged = merge_lora(base, state.params, 16.0)
        assert not bool(jnp.array_equal(
            merged["decoder"]["self_attn"]["wq"],
            base["decoder"]["self_attn"]["wq"]))

    def test_grad_accum_runs(self):
        from whisper_context_biasing_tpu.train import (
            init_lora_params,
            make_lora_train_step,
        )

        cfg = tiny_test_config()
        base = init_params(cfg, 0)
        lora = init_lora_params(base, 2, jax.random.PRNGKey(1))
        opt = make_optimizer(peak_lr=1e-3, warmup_steps=0, total_steps=10)
        step = make_lora_train_step(cfg, opt, grad_accum=2, donate=False)
        rng = np.random.default_rng(0)
        micro = {
            "input_features": jnp.asarray(
                rng.standard_normal((2, 2, 80, 128)), jnp.float32),
            "decoder_input_ids": jnp.asarray(
                np.tile([[50257, 5, 6, 7]], (2, 2, 1)), jnp.int32),
            "labels": jnp.asarray(
                np.tile([[5, 6, 7, 50256]], (2, 2, 1)), jnp.int32),
            "bias_spans": jnp.full((2, 2, 1, 2), 50256, jnp.int32),
        }
        state, m = step(init_train_state(lora, opt), base, micro)
        assert np.isfinite(float(m["loss"]))


class TestSpecAugment:
    def test_masks_and_determinism(self):
        from whisper_context_biasing_tpu.train import (
            SpecAugmentConfig,
            apply_spec_augment,
        )

        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.standard_normal((4, 80, 128)), jnp.float32)
        key = jax.random.PRNGKey(1)
        out = apply_spec_augment(feats, key)
        assert out.shape == feats.shape
        changed = np.mean(np.asarray(out) != np.asarray(feats))
        assert 0.0 < changed < 0.9  # some masking, not everything
        # deterministic per key; different keys differ
        np.testing.assert_array_equal(
            np.asarray(apply_spec_augment(feats, key)), np.asarray(out))
        out2 = apply_spec_augment(feats, jax.random.PRNGKey(2))
        assert not np.array_equal(np.asarray(out2), np.asarray(out))
        # masked cells carry each sample's mean value
        m = np.asarray(out) != np.asarray(feats)
        means = np.asarray(feats).mean(axis=(1, 2))
        for b in range(4):
            if m[b].any():
                vals = np.asarray(out)[b][m[b]]
                np.testing.assert_allclose(vals, means[b], rtol=1e-5)
        # zero-mask config is the identity
        off = SpecAugmentConfig(n_freq_masks=0, max_freq_width=0,
                                n_time_masks=0)
        np.testing.assert_array_equal(
            np.asarray(apply_spec_augment(feats, key, off)),
            np.asarray(feats))

    def test_train_step_augments_per_step(self):
        from whisper_context_biasing_tpu.train import SpecAugmentConfig

        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        opt = make_optimizer(peak_lr=1e-4, warmup_steps=0, total_steps=10)
        step = make_train_step(cfg, opt, spec_augment=SpecAugmentConfig(),
                               donate=False)
        rng = np.random.default_rng(0)
        batch = {
            "input_features": jnp.asarray(
                rng.standard_normal((2, 80, 128)), jnp.float32),
            "decoder_input_ids": jnp.asarray([[50257, 5, 6, 7]] * 2, jnp.int32),
            "labels": jnp.asarray([[5, 6, 7, 50256]] * 2, jnp.int32),
            "bias_spans": jnp.full((2, 1, 2), 50256, jnp.int32),
        }
        state = init_train_state(params, opt)
        state, m1 = step(state, batch)
        state, m2 = step(state, batch)  # same batch, new step -> new masks
        assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
        assert float(m1["loss"]) != float(m2["loss"])

    def test_mel_on_device_combination_rejected(self):
        from whisper_context_biasing_tpu.train import SpecAugmentConfig

        cfg = tiny_test_config()
        opt = make_optimizer()
        with pytest.raises(ValueError, match="spec_augment"):
            make_train_step(cfg, opt, spec_augment=SpecAugmentConfig(),
                            mel_on_device=True)


class TestOrbaxBackend:
    def _tree(self):
        rng = np.random.default_rng(0)
        return {
            "encoder": {"w": rng.standard_normal((4, 8)).astype(np.float32),
                        "ln": [rng.standard_normal(8).astype(np.float32),
                               rng.standard_normal(8).astype(np.float32)]},
            "decoder": {"emb": rng.standard_normal((16, 8)).astype(np.bfloat16
                        if hasattr(np, "bfloat16") else np.float32)},
        }

    def test_round_trip(self, tmp_path):
        import jax.numpy as jnp

        tree = jax.tree.map(jnp.asarray, self._tree())
        path = save_checkpoint(str(tmp_path), 7, tree,
                               metadata={"eval_wer": 1.0},
                               backend="orbax")
        from whisper_context_biasing_tpu.train import is_native_checkpoint
        assert is_native_checkpoint(path)
        assert not (tmp_path / "checkpoint-7" / "params.npz").exists()
        got, opt, meta = load_checkpoint(path)
        assert meta["eval_wer"] == 1.0 and opt is None
        same = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a, np.float32),
                                        np.asarray(b, np.float32)),
            jax.tree.map(np.asarray, tree), got)
        assert all(jax.tree.leaves(same))

    def test_opt_state_and_retention(self, tmp_path):
        import optax

        tree = self._tree()
        opt = optax.adam(1e-3)
        opt_state = opt.init(jax.tree.map(jnp.asarray, tree))
        for step in (1, 2, 3):
            save_checkpoint(str(tmp_path), step, tree, opt_state=opt_state,
                            metadata={"eval_wer": 5.0 - step,
                                      "eval_step": step},
                            keep=1, backend="orbax")
        kept = list_checkpoints(str(tmp_path))
        assert len(kept) == 1  # step-3 is both newest and best
        params, restored, _ = load_checkpoint(kept[0],
                                              opt_state_template=opt_state)
        assert restored is not None
        flat_a = jax.tree.leaves(jax.tree.map(np.asarray, opt_state))
        flat_b = jax.tree.leaves(restored)
        assert all(np.array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))
                   for a, b in zip(flat_a, flat_b))

    def test_sharded_params_save_without_gather(self, tmp_path):
        """Mesh-sharded jax.Arrays write directly (each device's shards) and
        restore to the full host array."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from conftest import cpu_devices

        devs = np.array(cpu_devices()[:8]).reshape(8)
        mesh = Mesh(devs, ("data",))
        x = np.arange(64, dtype=np.float32).reshape(8, 8)
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
        path = save_checkpoint(str(tmp_path), 1, {"x": xs}, backend="orbax")
        got, _, _ = load_checkpoint(path)
        np.testing.assert_array_equal(got["x"], x)

    def test_unknown_backend_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="backend"):
            save_checkpoint(str(tmp_path), 1, {"x": np.zeros(2)},
                            backend="msgpack")

PAD = 50256
SPECIALS = {50256, 50257, 50258, 50358, 50362}


def reference_weighted_ce(lm_logits, labels, bias_spans, bias_weight=1.5):
    """Literal numpy transcription of scripts/check_WeightCE.py:16-69
    (pad-stripping + special-token skip — the harness 'spec' semantics)."""
    batch_size, seq_len, vocab_size = lm_logits.shape
    weights = np.ones(labels.shape, np.float32)
    for i in range(batch_size):
        for span in bias_spans[i]:
            span = [t for t in span if t != PAD]
            if not span:
                continue
            L = len(span)
            for j in range(seq_len - L + 1):
                if labels[i, j : j + L].tolist() == span:
                    for k in range(L):
                        if labels[i, j + k] not in SPECIALS:
                            weights[i, j + k] = bias_weight
    logits64 = lm_logits.astype(np.float64)
    logp = logits64 - np.log(np.exp(logits64 - logits64.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits64.max(-1, keepdims=True)
    lab = labels.reshape(-1)
    valid = lab != -100
    safe = np.where(valid, lab, 0)
    nll = -logp.reshape(-1, vocab_size)[np.arange(lab.size), safe]
    nll = nll * valid
    w = weights.reshape(-1) * valid
    return float((nll * w).sum() / (valid.sum() + 1e-8)), weights


def _fabricate(seed=0, b=2, s=40, v=120, n=3, k=4):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 100, (b, s)).astype(np.int32)
    labels[:, :5] = -100  # masked prompt
    labels[0, -3:] = -100
    spans = np.full((b, n, k), PAD, np.int32)
    # plant span [7, 8] at positions 10..11 of row 0
    labels[0, 10:12] = [7, 8]
    spans[0, 0, :2] = [7, 8]
    # plant single-token span at row 1
    labels[1, 20] = 55
    spans[1, 0, :1] = [55]
    # a span that appears twice
    labels[1, 25:27] = [9, 9]
    labels[1, 30:32] = [9, 9]
    spans[1, 1, :2] = [9, 9]
    logits = rng.standard_normal((b, s, v)).astype(np.float32)
    return logits, labels, spans


class TestWeightCEParity:
    def test_weights_match_reference(self):
        logits, labels, spans = _fabricate()
        _, ref_w = reference_weighted_ce(logits, labels, spans)
        ours = np.asarray(bias_span_weights(jnp.asarray(labels), jnp.asarray(spans), 1.5))
        np.testing.assert_array_equal(ours, ref_w)

    def test_loss_matches_reference(self):
        logits, labels, spans = _fabricate()
        ref_loss, _ = reference_weighted_ce(logits, labels, spans, bias_weight=2.5)
        ours = float(weighted_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                      jnp.asarray(spans), 2.5))
        assert ours == pytest.approx(ref_loss, rel=1e-5)

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_randomized_parity(self, seed):
        rng = np.random.default_rng(seed)
        b, s, v, n, k = 3, 30, 80, 4, 3
        labels = rng.integers(-1, 60, (b, s)).astype(np.int32)
        labels[labels < 0] = -100
        spans = rng.integers(0, 60, (b, n, k)).astype(np.int32)
        # randomly pad span tails
        for i in range(b):
            for j in range(n):
                cut = rng.integers(0, k + 1)
                spans[i, j, cut:] = PAD
        # plant some spans into labels so matches actually occur
        for i in range(b):
            L = int(np.sum(spans[i, 0] != PAD))
            if L and s > L + 2:
                labels[i, 2 : 2 + L] = spans[i, 0, :L]
        logits = rng.standard_normal((b, s, v)).astype(np.float32)
        ref_loss, ref_w = reference_weighted_ce(logits, labels, spans)
        ours_w = np.asarray(bias_span_weights(jnp.asarray(labels), jnp.asarray(spans), 1.5))
        np.testing.assert_array_equal(ours_w, ref_w)
        ours_loss = float(weighted_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                           jnp.asarray(spans), 1.5))
        assert ours_loss == pytest.approx(ref_loss, rel=1e-5)

    def test_special_tokens_not_upweighted(self):
        labels = np.asarray([[50257, 7, 8, 50256]], np.int32)
        spans = np.asarray([[[50257, 7, 8, 50256]]], np.int32)
        # span containing specials: matched but specials keep weight 1
        w = np.asarray(bias_span_weights(jnp.asarray(labels), jnp.asarray(spans), 3.0))
        assert w.tolist() == [[1.0, 3.0, 3.0, 1.0]]

    def test_plain_ce_fallback(self):
        rng = np.random.default_rng(0)
        logits = rng.standard_normal((2, 6, 30)).astype(np.float32)
        labels = rng.integers(0, 30, (2, 6)).astype(np.int32)
        labels[0, :2] = -100
        ours = float(weighted_ce_loss(jnp.asarray(logits), jnp.asarray(labels)))
        # torch CrossEntropyLoss(ignore_index=-100) equivalent
        import torch
        import torch.nn.functional as F

        ref = F.cross_entropy(
            torch.tensor(logits).view(-1, 30), torch.tensor(labels.astype(np.int64)).view(-1),
            ignore_index=-100,
        ).item()
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_no_match_equals_plain_ce(self):
        rng = np.random.default_rng(1)
        logits = rng.standard_normal((1, 8, 30)).astype(np.float32)
        labels = rng.integers(0, 30, (1, 8)).astype(np.int32)
        spans = np.full((1, 2, 3), PAD, np.int32)  # all-pad spans
        a = float(weighted_ce_loss(jnp.asarray(logits), jnp.asarray(labels)))
        b = float(weighted_ce_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(spans)))
        assert a == pytest.approx(b, rel=1e-6)


class TestSchedule:
    def test_warmup_cosine(self):
        sched = warmup_cosine_schedule(1e-5, 50, 1000)
        assert float(sched(0)) == 0.0
        assert float(sched(50)) == pytest.approx(1e-5)
        assert float(sched(1000)) == pytest.approx(0.0, abs=1e-9)
        assert float(sched(500)) < 1e-5


@pytest.mark.slow
class TestTrainStep:
    @pytest.fixture(scope="class")
    def tiny_batch(self):
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        rng = np.random.default_rng(0)
        batch = {
            "input_features": jnp.asarray(
                rng.standard_normal((2, 80, 128)).astype(np.float32) * 0.3
            ),
            "decoder_input_ids": jnp.asarray([[50257, 5, 6, 7], [50257, 8, 9, 10]], jnp.int32),
            "labels": jnp.asarray([[5, 6, 7, 50256], [8, 9, 10, 50256]], jnp.int32),
            "bias_spans": jnp.asarray(np.full((2, 1, 2), PAD, np.int32)),
        }
        return cfg, params, batch

    def test_loss_decreases(self, tiny_batch):
        cfg, params, batch = tiny_batch
        opt = make_optimizer(peak_lr=1e-3, warmup_steps=0, total_steps=100)
        step = make_train_step(cfg, opt, donate=False)
        state = init_train_state(params, opt)
        losses = []
        for _ in range(5):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_freeze_encoder(self, tiny_batch):
        cfg, params, batch = tiny_batch
        opt = make_optimizer(peak_lr=1e-3, warmup_steps=0, total_steps=100)
        step = make_train_step(cfg, opt, freeze_encoder=True, donate=False)
        state = init_train_state(params, opt)
        state2, _ = step(state, batch)
        # encoder untouched, decoder changed
        enc_same = jax.tree.all(jax.tree.map(
            lambda a, b: bool(jnp.all(a == b)), state.params["encoder"], state2.params["encoder"]))
        dec_same = jax.tree.all(jax.tree.map(
            lambda a, b: bool(jnp.all(a == b)), state.params["decoder"], state2.params["decoder"]))
        assert enc_same and not dec_same

    def test_freeze_encoder_matches_grad_discard(self, tiny_batch):
        """The stop_gradient freeze (no encoder backward built at all) must
        produce the same update as the compute-then-discard semantics of the
        reference's freeze_encoder() — decoder params move identically."""
        import optax

        from whisper_context_biasing_tpu.train.step import make_loss_fn

        cfg, params, batch = tiny_batch
        opt = make_optimizer(peak_lr=1e-3, warmup_steps=0, total_steps=100)
        step = make_train_step(cfg, opt, freeze_encoder=True, donate=False)
        s_new, m_new = step(init_train_state(params, opt), batch)

        # reference semantics, built inline: full-graph grads, encoder zeroed
        # before the optimizer, weight-decay update masked after
        loss_fn = make_loss_fn(cfg, bias_weight=1.5)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        grads = dict(grads, encoder=jax.tree.map(jnp.zeros_like, grads["encoder"]))
        st = init_train_state(params, opt)
        updates, _ = opt.update(grads, st.opt_state, st.params)
        updates = dict(updates,
                       encoder=jax.tree.map(jnp.zeros_like, updates["encoder"]))
        ref_params = optax.apply_updates(st.params, updates)

        assert float(m_new["loss"]) == pytest.approx(float(loss), rel=1e-6)
        diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                             s_new.params, ref_params)
        # jit-vs-eager fusion noise passes through Adam's eps-normalized
        # update at ~5e-6; a semantically wrong freeze differs at >=1e-3
        assert max(jax.tree.leaves(diffs)) < 5e-5

    def test_grad_accum_equivalence(self, tiny_batch):
        """accum over two identical microbatches == single step on one."""
        cfg, params, batch = tiny_batch
        opt = make_optimizer(peak_lr=1e-3, warmup_steps=0, total_steps=100)
        step1 = make_train_step(cfg, opt, donate=False)
        stepA = make_train_step(cfg, opt, grad_accum=2, donate=False)
        s1, m1 = step1(init_train_state(params, opt), batch)
        stacked = jax.tree.map(lambda a: jnp.stack([a, a]), batch)
        sA, mA = stepA(init_train_state(params, opt), stacked)
        assert float(m1["loss"]) == pytest.approx(float(mA["loss"]), rel=1e-5)
        d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, sA.params)
        assert max(jax.tree.leaves(d)) < 1e-5


@pytest.mark.slow
class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = tiny_test_config()
        params = init_params(cfg, 0)
        p = save_checkpoint(str(tmp_path), 10, params, metadata={"eval_wer": 12.5})
        loaded, _, meta = load_checkpoint(p)
        assert meta["step"] == 10 and meta["eval_wer"] == 12.5
        same = jax.tree.map(lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
                            params, loaded)
        assert all(jax.tree.leaves(same))

    def test_retention_keeps_best_and_latest(self, tmp_path):
        cfg = tiny_test_config(n_audio_layers=1, n_text_layers=1, d_model=8, n_heads=1)
        params = init_params(cfg, 0)
        save_checkpoint(str(tmp_path), 1, params, metadata={"eval_wer": 5.0}, keep=1)
        save_checkpoint(str(tmp_path), 2, params, metadata={"eval_wer": 9.0}, keep=1)
        save_checkpoint(str(tmp_path), 3, params, metadata={"eval_wer": 8.0}, keep=1)
        names = sorted(os.path.basename(c) for c in list_checkpoints(str(tmp_path)))
        # best (step 1, wer 5.0) + latest (step 3) survive
        assert names == ["checkpoint-1", "checkpoint-3"]
        assert os.path.basename(find_best_checkpoint(str(tmp_path))) == "checkpoint-1"
        assert os.path.basename(latest_checkpoint(str(tmp_path))) == "checkpoint-3"

    def test_log_history_format(self, tmp_path):
        cfg = tiny_test_config(n_audio_layers=1, n_text_layers=1, d_model=8, n_heads=1)
        params = init_params(cfg, 0)
        save_checkpoint(str(tmp_path), 5, params,
                        metadata={"log_history": [{"eval_wer": 3.3}, {"loss": 1.0}]})
        assert os.path.basename(find_best_checkpoint(str(tmp_path))) == "checkpoint-5"





@pytest.mark.slow
class TestOptStateResume:
    def test_opt_state_roundtrip(self, tmp_path):
        """Adam moments and the schedule count survive save/load (resume must
        not silently re-warm the LR)."""
        import jax

        cfg = tiny_test_config(n_audio_layers=1, n_text_layers=1, d_model=8,
                               n_heads=1)
        params = init_params(cfg, 0)
        opt = make_optimizer(peak_lr=1e-3, warmup_steps=0, total_steps=100)
        state = init_train_state(params, opt)
        # fabricate a nontrivial opt state by applying a step on dummy grads
        grads = jax.tree.map(lambda a: jnp.ones_like(a) * 0.01, params)
        updates, opt_state = opt.update(grads, state.opt_state, params)
        save_checkpoint(str(tmp_path), 7, params, opt_state=opt_state,
                        metadata={"eval_wer": 1.0})
        template = opt.init(params)
        _, restored, _ = load_checkpoint(
            str(tmp_path) + "/checkpoint-7", opt_state_template=template
        )
        assert restored is not None
        orig_leaves = jax.tree.leaves(opt_state)
        rest_leaves = jax.tree.leaves(restored)
        assert len(orig_leaves) == len(rest_leaves)
        for a, b in zip(orig_leaves, rest_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBestCheckpointSelection:
    def test_own_metric_beats_poisoned_history(self, tmp_path):
        """Regression: later checkpoints carry the full log_history, so
        scanning it attributed the historical best wer to every later
        checkpoint — retention could then delete the true best weights."""
        import json
        import os

        from whisper_context_biasing_tpu.train.checkpoint import (
            find_best_checkpoint,
        )

        hist = [{"step": 135, "eval_wer": 10.0}, {"step": 270, "eval_wer": 12.0}]
        for step, wer, h in ((135, 10.0, hist[:1]), (270, 12.0, hist)):
            d = tmp_path / f"checkpoint-{step}"
            d.mkdir()
            with open(d / "trainer_state.json", "w") as f:
                json.dump({"step": step, "eval_wer": wer, "log_history": h}, f)
        best = find_best_checkpoint(str(tmp_path))
        assert os.path.basename(best) == "checkpoint-135"

    def test_stale_stamp_loses_to_same_step_eval(self, tmp_path):
        """Regression (VERDICT r2 weak #3): with save_steps=100 and
        eval_steps=135 the stamped wer on checkpoint-200 was produced by
        step 135's params — a later checkpoint whose eval ran at ITS OWN
        step must win even with a higher wer."""
        import json
        import os

        from whisper_context_biasing_tpu.train.checkpoint import (
            find_best_checkpoint,
        )

        metas = {
            100: {"step": 100, "log_history": []},  # no eval yet
            # stale: wer 10.0 measured at step 135, params are step 200's
            200: {"step": 200, "eval_wer": 10.0, "eval_step": 135,
                  "log_history": [{"step": 135, "eval_wer": 10.0}]},
            # attributed: eval ran at the save step itself
            270: {"step": 270, "eval_wer": 12.0, "eval_step": 270,
                  "log_history": [{"step": 135, "eval_wer": 10.0},
                                  {"step": 270, "eval_wer": 12.0}]},
        }
        for step, meta in metas.items():
            d = tmp_path / f"checkpoint-{step}"
            d.mkdir()
            with open(d / "trainer_state.json", "w") as f:
                json.dump(meta, f)
        best = find_best_checkpoint(str(tmp_path))
        assert os.path.basename(best) == "checkpoint-270"

    def test_legacy_stamp_with_matching_history_stays_attributed(self, tmp_path):
        """Checkpoints written before the eval_step key existed are still
        first-class when log_history PROVES the stamp is their own (an eval
        at exactly the save step) — a better legacy metric must beat a
        worse same-step-stamped one."""
        import json
        import os

        from whisper_context_biasing_tpu.train.checkpoint import (
            find_best_checkpoint,
        )

        metas = {
            # legacy (no eval_step), aligned cadence: history proves it
            135: {"step": 135, "eval_wer": 8.0,
                  "log_history": [{"step": 135, "eval_wer": 8.0}]},
            # new-style attributed, but worse
            270: {"step": 270, "eval_wer": 12.0, "eval_step": 270,
                  "log_history": [{"step": 135, "eval_wer": 8.0},
                                  {"step": 270, "eval_wer": 12.0}]},
        }
        for step, meta in metas.items():
            d = tmp_path / f"checkpoint-{step}"
            d.mkdir()
            with open(d / "trainer_state.json", "w") as f:
                json.dump(meta, f)
        assert os.path.basename(
            find_best_checkpoint(str(tmp_path))) == "checkpoint-135"

    def test_stale_stamps_only_fall_back_to_best_stamp(self, tmp_path):
        """When NO checkpoint has a same-step eval, selection degrades to
        the reference's behavior (lowest known value)."""
        import json
        import os

        from whisper_context_biasing_tpu.train.checkpoint import (
            find_best_checkpoint,
        )

        for step, wer, estep in ((200, 10.0, 135), (300, 12.0, 270)):
            d = tmp_path / f"checkpoint-{step}"
            d.mkdir()
            with open(d / "trainer_state.json", "w") as f:
                json.dump({"step": step, "eval_wer": wer, "eval_step": estep}, f)
        best = find_best_checkpoint(str(tmp_path))
        assert os.path.basename(best) == "checkpoint-200"

    def test_loop_stamps_eval_step(self, tmp_path):
        """The training loop records eval_step alongside eval_wer so
        attribution survives misaligned save/eval cadences."""
        import json

        from conftest import cpu_devices  # noqa: F401 (cpu pin via conftest)
        from whisper_context_biasing_tpu.data.collator import SpeechSeq2SeqCollator
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer
        from whisper_context_biasing_tpu.train import train_and_evaluate

        tok = load_tokenizer()
        cfg = tiny_test_config(n_audio_layers=1, n_text_layers=1, d_model=16,
                               n_heads=2)
        params = init_params(cfg, 0)
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop)
        rng = np.random.default_rng(0)
        items = [
            {"input_features": (rng.standard_normal((80, 128)) * 0.3)
             .astype(np.float32),
             "labels": np.asarray([tok.sot, 5, 6, tok.eot], np.int32),
             "bias_spans": []}
            for _ in range(4)
        ]
        tcfg = TrainingConfig(
            output_dir=str(tmp_path), per_device_train_batch_size=2,
            per_device_eval_batch_size=2, gradient_accumulation_steps=1,
            num_train_epochs=3, eval_steps=3, save_steps=2, logging_steps=1,
            warmup_steps=0, generation_max_length=4,
            early_stopping_patience=50, load_best_model_at_end=False,
            save_total_limit=10)
        train_and_evaluate(cfg, params, tok, items, items, coll, tcfg)
        # save at 2 (no eval yet), 4 (stale: eval_step 3), 6 (same-step)
        from whisper_context_biasing_tpu.train.checkpoint import checkpoint_step

        metas = {}
        for c in list_checkpoints(str(tmp_path)):
            with open(os.path.join(c, "trainer_state.json")) as f:
                metas[checkpoint_step(c)] = json.load(f)
        assert "eval_wer" not in metas[2]
        assert metas[4]["eval_step"] == 3
        assert metas[6]["eval_step"] == 6

    def test_history_fallback_for_reference_style_checkpoints(self, tmp_path):
        import json
        import os

        from whisper_context_biasing_tpu.train.checkpoint import (
            find_best_checkpoint,
        )

        # no top-level eval_wer (HF-style): fall back to log_history
        d = tmp_path / "checkpoint-10"
        d.mkdir()
        with open(d / "trainer_state.json", "w") as f:
            json.dump({"log_history": [{"eval_wer": 42.0}]}, f)
        best = find_best_checkpoint(str(tmp_path))
        assert os.path.basename(best) == "checkpoint-10"


class TestHubResumeFallback:
    def test_resume_pulls_hub_snapshot_when_no_local_checkpoint(
        self, tmp_path, monkeypatch, capsys
    ):
        """Reference scripts/train.py:169-189: resume falls back to a Hub
        snapshot when no local checkpoint-* exists. Hub mocked: the sync
        drops a checkpoint into output_dir and training resumes from it."""
        import shutil

        from whisper_context_biasing_tpu.data.collator import SpeechSeq2SeqCollator
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer
        from whisper_context_biasing_tpu.train import train_and_evaluate
        from whisper_context_biasing_tpu.utils import hub

        tok = load_tokenizer()
        cfg = tiny_test_config(n_audio_layers=1, n_text_layers=1, d_model=16,
                               n_heads=2)
        params = init_params(cfg, 0)

        # fabricate the "hub" copy: a step-2 checkpoint in a side dir
        hub_dir = tmp_path / "hub_repo"
        hub_dir.mkdir()
        save_checkpoint(str(hub_dir), 2, params,
                        metadata={"log_history": [{"step": 2, "loss": 1.0}]})

        calls = {}

        def fake_sync(repo_id, local_dir, token=None):
            calls["repo_id"], calls["token"] = repo_id, token
            for name in os.listdir(hub_dir):
                shutil.copytree(hub_dir / name, os.path.join(local_dir, name))
            return True

        monkeypatch.setattr(hub, "sync_from_hub", fake_sync)

        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop)
        rng = np.random.default_rng(0)
        items = [
            {"input_features": (rng.standard_normal((80, 128)) * 0.3)
             .astype(np.float32),
             "labels": np.asarray([tok.sot, 5, 6, tok.eot], np.int32),
             "bias_spans": []}
            for _ in range(4)
        ]
        out = tmp_path / "out"
        tcfg = TrainingConfig(
            output_dir=str(out), per_device_train_batch_size=2,
            per_device_eval_batch_size=2, gradient_accumulation_steps=1,
            num_train_epochs=2, eval_steps=100, save_steps=100,
            logging_steps=1, warmup_steps=0, generation_max_length=4,
            early_stopping_patience=50, load_best_model_at_end=False,
            hub_model_id="user/model", hub_token="tkn")
        _, hist = train_and_evaluate(cfg, params, tok, items, items, coll,
                                     tcfg, resume=True)
        assert calls == {"repo_id": "user/model", "token": "tkn"}
        # resumed at step 2: prior history is kept and training continues
        assert hist[0] == {"step": 2, "loss": 1.0}
        assert max(e["step"] for e in hist) > 2

    def test_every_save_pushes_checkpoint_to_hub(self, tmp_path, monkeypatch):
        """Reference PushToHubOnSaveCallback + push_to_hub='every_save'
        (scripts/train.py:83-85, :252-255): with hub_model_id set, EVERY
        checkpoint save also pushes the OUTPUT DIR to the Hub (preserving
        the checkpoint-N/ layout a later sync_from_hub +
        find_best_checkpoint round-trip needs). Hub mocked; the push must
        fire per save with the right dir/repo/token and the just-saved
        checkpoint present inside."""
        from whisper_context_biasing_tpu.data.collator import SpeechSeq2SeqCollator
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer
        from whisper_context_biasing_tpu.train import train_and_evaluate
        from whisper_context_biasing_tpu.utils import hub

        pushes = []

        def fake_push(local_dir, repo_id, token=None):
            # the output dir is pushed, with the fresh checkpoint inside
            ckpts = sorted(d for d in os.listdir(local_dir)
                           if d.startswith("checkpoint-"))
            assert ckpts, local_dir
            pushes.append((os.path.basename(ckpts[-1]), repo_id, token))
            return True

        monkeypatch.setattr(hub, "push_to_hub_if_exists", fake_push)

        tok = load_tokenizer()
        cfg = tiny_test_config(n_audio_layers=1, n_text_layers=1, d_model=16,
                               n_heads=2)
        params = init_params(cfg, 0)
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop)
        rng = np.random.default_rng(0)
        items = [
            {"input_features": (rng.standard_normal((80, 128)) * 0.3)
             .astype(np.float32),
             "labels": np.asarray([tok.sot, 5, 6, tok.eot], np.int32),
             "bias_spans": []}
            for _ in range(4)
        ]
        tcfg = TrainingConfig(
            output_dir=str(tmp_path), per_device_train_batch_size=2,
            per_device_eval_batch_size=2, gradient_accumulation_steps=1,
            num_train_epochs=2, eval_steps=100, save_steps=2,
            logging_steps=10, warmup_steps=0, generation_max_length=4,
            early_stopping_patience=50, load_best_model_at_end=False,
            save_total_limit=10, hub_model_id="user/model", hub_token="tkn")
        train_and_evaluate(cfg, params, tok, items, items, coll, tcfg)
        # 4 items / chunk 2 = 2 steps/epoch x 2 epochs, save every 2 steps
        assert pushes == [("checkpoint-2", "user/model", "tkn"),
                          ("checkpoint-4", "user/model", "tkn")]

    def test_no_hub_id_means_no_push(self, tmp_path, monkeypatch):
        """Without hub_model_id the save path never touches the hub module
        (offline default stays silent)."""
        from whisper_context_biasing_tpu.data.collator import SpeechSeq2SeqCollator
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer
        from whisper_context_biasing_tpu.train import train_and_evaluate
        from whisper_context_biasing_tpu.utils import hub

        def boom(*a, **k):  # pragma: no cover - the assert is the test
            raise AssertionError("push_to_hub_if_exists must not be called")

        monkeypatch.setattr(hub, "push_to_hub_if_exists", boom)
        tok = load_tokenizer()
        cfg = tiny_test_config(n_audio_layers=1, n_text_layers=1, d_model=16,
                               n_heads=2)
        params = init_params(cfg, 0)
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop)
        rng = np.random.default_rng(0)
        items = [
            {"input_features": (rng.standard_normal((80, 128)) * 0.3)
             .astype(np.float32),
             "labels": np.asarray([tok.sot, 5, 6, tok.eot], np.int32),
             "bias_spans": []}
            for _ in range(2)
        ]
        tcfg = TrainingConfig(
            output_dir=str(tmp_path), per_device_train_batch_size=2,
            per_device_eval_batch_size=2, gradient_accumulation_steps=1,
            num_train_epochs=1, eval_steps=100, save_steps=1,
            logging_steps=10, warmup_steps=0, generation_max_length=4,
            early_stopping_patience=50, load_best_model_at_end=False)
        train_and_evaluate(cfg, params, tok, items, items, coll, tcfg)

    def test_resume_offline_degrades_to_fresh_start(self, tmp_path):
        """No local checkpoint + hub unreachable (offline no-op) => train
        from scratch, same as today."""
        from whisper_context_biasing_tpu.data.collator import SpeechSeq2SeqCollator
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer
        from whisper_context_biasing_tpu.train import train_and_evaluate

        tok = load_tokenizer()
        cfg = tiny_test_config(n_audio_layers=1, n_text_layers=1, d_model=16,
                               n_heads=2)
        params = init_params(cfg, 0)
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop)
        rng = np.random.default_rng(0)
        items = [
            {"input_features": (rng.standard_normal((80, 128)) * 0.3)
             .astype(np.float32),
             "labels": np.asarray([tok.sot, 5, tok.eot], np.int32),
             "bias_spans": []}
            for _ in range(2)
        ]
        tcfg = TrainingConfig(
            output_dir=str(tmp_path / "o"), per_device_train_batch_size=2,
            per_device_eval_batch_size=2, gradient_accumulation_steps=1,
            num_train_epochs=1, eval_steps=100, save_steps=100,
            logging_steps=1, warmup_steps=0, generation_max_length=4,
            early_stopping_patience=50, load_best_model_at_end=False,
            hub_model_id="user/404")
        _, hist = train_and_evaluate(cfg, params, tok, items, items, coll,
                                     tcfg, resume=True)
        assert min(e["step"] for e in hist) == 1  # fresh start


class TestBatchLoaderResume:
    def test_resume_api_replaces_private_pokes(self):
        from whisper_context_biasing_tpu.data.prefetch import BatchLoader

        ds = list(range(10))

        def fresh():
            return BatchLoader(ds, lambda xs: xs, 2, shuffle=True, seed=3,
                               drop_last=True, num_workers=1)

        ref = fresh()
        epoch0 = list(ref)   # advances ref to epoch 1
        epoch1 = list(ref)
        assert epoch0 != epoch1  # per-epoch shuffles differ

        resumed = fresh()
        resumed.resume(epoch=1, skip_batches=2)
        assert list(resumed) == epoch1[2:]
        # skip applies to ONE iteration; the next epoch is complete
        assert len(list(resumed)) == len(epoch1)


class TestEmptySpanTrainGuard:
    def test_all_pad_spans_equal_no_spans(self):
        """An all-pad (B,1,1) span tensor (the sanitized replacement for the
        collator's zeros fallback) must leave the loss identical to no spans
        at all — the zeros fallback itself would upweight token id 0."""
        import jax.numpy as jnp

        from whisper_context_biasing_tpu.train.loss import weighted_ce_loss

        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((2, 6, 64)).astype(np.float32))
        labels = jnp.asarray([[0, 5, 7, 0, 3, 63]] * 2, jnp.int32)
        pad = 63  # tiny-vocab stand-in for eot/span-pad
        base = weighted_ce_loss(logits, labels, None, 1.5, span_pad_id=pad,
                                special_id_threshold=pad)
        allpad = jnp.full((2, 1, 1), pad, jnp.int32)
        same = weighted_ce_loss(logits, labels, allpad, 1.5, span_pad_id=pad,
                                special_id_threshold=pad)
        np.testing.assert_allclose(float(base), float(same), rtol=1e-6)
        # the unsanitized zeros fallback upweights label positions of id 0
        zeros = jnp.zeros((2, 1, 1), jnp.int32)
        skewed = weighted_ce_loss(logits, labels, zeros, 1.5, span_pad_id=pad,
                                  special_id_threshold=pad)
        assert abs(float(skewed) - float(base)) > 1e-6


class TestEvalCliHubBestCheckpoint:
    """scripts/evaluation.py --best_checkpoint with --hub_model_id syncs the
    whole Hub repo into --output before the local scan (reference
    /root/reference/scripts/evaluation.py:154-155,213); offline the sync
    no-ops and the scan degrades to local-only."""

    def _locate(self):
        import importlib.util

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "wcb_evaluation", os.path.join(repo, "scripts", "evaluation.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.locate_best_checkpoint

    def _fake_ckpt(self, root, step, wer):
        import json

        d = os.path.join(root, f"checkpoint-{step}")
        os.makedirs(d)
        with open(os.path.join(d, "trainer_state.json"), "w") as f:
            json.dump({"eval_wer": wer, "eval_step": step,
                       "log_history": [{"step": step, "eval_wer": wer}]}, f)
        np.savez(os.path.join(d, "params.npz"))
        return d

    def test_hub_sync_populates_then_scan(self, tmp_path, monkeypatch):
        import shutil

        from whisper_context_biasing_tpu.utils import hub

        hub_repo = tmp_path / "hub_repo"
        hub_repo.mkdir()
        best = self._fake_ckpt(str(hub_repo), 4, 10.0)
        self._fake_ckpt(str(hub_repo), 2, 50.0)
        calls = {}

        def fake_sync(repo_id, local_dir, token=None):
            calls["repo_id"], calls["token"] = repo_id, token
            for name in os.listdir(hub_repo):
                shutil.copytree(hub_repo / name,
                                os.path.join(local_dir, name))
            return True

        monkeypatch.setattr(hub, "sync_from_hub", fake_sync)
        out = str(tmp_path / "out")
        os.makedirs(out)
        found = self._locate()(out, "user/model", "tkn")
        assert calls == {"repo_id": "user/model", "token": "tkn"}
        assert os.path.basename(found) == os.path.basename(best)
        assert found.startswith(out)  # scans the synced local copy

    def test_offline_degrades_to_local_scan(self, tmp_path, monkeypatch):
        from whisper_context_biasing_tpu.utils import hub

        local = self._fake_ckpt(str(tmp_path), 6, 20.0)
        monkeypatch.setattr(hub, "sync_from_hub", lambda *a, **k: False)
        assert self._locate()(str(tmp_path), "user/model", None) == local

    def test_no_hub_id_never_touches_hub(self, tmp_path, monkeypatch):
        from whisper_context_biasing_tpu.utils import hub

        def boom(*a, **k):  # pragma: no cover
            raise AssertionError("sync_from_hub must not be called")

        monkeypatch.setattr(hub, "sync_from_hub", boom)
        local = self._fake_ckpt(str(tmp_path), 8, 30.0)
        assert self._locate()(str(tmp_path), None, None) == local
