"""Draft-model distillation tests: loss semantics (identical models agree
perfectly; KL is zero), the jitted step actually raises draft/target
agreement, grad-accum equivalence, mismatched-mel on-device path, and the
runner's checkpoint/metric plumbing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from whisper_context_biasing_tpu.models import init_params, tiny_test_config
from whisper_context_biasing_tpu.train import (
    init_train_state,
    make_agreement_step,
    make_distill_loss_fn,
    make_distill_step,
    make_optimizer,
)

V = 120  # tiny vocab keeps the softmax cheap


def small_cfg(**kw):
    return tiny_test_config(**{"n_vocab": V, **kw})


def make_batch(seed=0, b=2, s=12, n_mels=80, n_audio_ctx=64):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((b, n_mels, 2 * n_audio_ctx)).astype(np.float32)
    dec = rng.integers(0, V, size=(b, s)).astype(np.int32)
    labels = np.concatenate([dec[:, 1:], np.full((b, 1), -100, np.int32)], axis=1)
    labels[:, -3:] = -100  # some ignored tail positions
    return {
        "input_features": jnp.asarray(feats),
        "decoder_input_ids": jnp.asarray(dec),
        "labels": jnp.asarray(labels),
    }


class TestLossSemantics:
    def test_identical_models_agree(self):
        cfg = small_cfg()
        params = init_params(cfg, 0)
        loss_fn = make_distill_loss_fn(cfg, cfg)
        batch = make_batch()
        loss, aux = jax.jit(loss_fn)(params, params, batch)
        assert float(aux["agreement"]) == pytest.approx(1.0)
        assert float(aux["soft"]) == pytest.approx(0.0, abs=1e-4)
        # loss reduces to hard CE alone at hard_weight=0.5
        assert float(loss) == pytest.approx(0.5 * float(aux["hard"]), abs=1e-4)

    def test_vocab_mismatch_rejected(self):
        with pytest.raises(ValueError, match="vocab mismatch"):
            make_distill_loss_fn(small_cfg(), small_cfg(n_vocab=V + 1))

    def test_teacher_gets_no_grad(self):
        cfg = small_cfg()
        ps = init_params(cfg, 0)
        pt = init_params(cfg, 1)
        loss_fn = make_distill_loss_fn(cfg, cfg)
        g = jax.grad(lambda t: loss_fn(ps, t, make_batch())[0])(pt)
        assert all(float(jnp.abs(x).max()) == 0.0 for x in jax.tree.leaves(g))


class TestDistillStep:
    def test_agreement_rises(self):
        cfg = small_cfg()
        student = init_params(cfg, 0)
        teacher = init_params(cfg, 7)
        opt = make_optimizer(peak_lr=1e-2, warmup_steps=0, total_steps=300)
        # pure soft loss: the quantity under test is teacher-matching
        step = make_distill_step(cfg, cfg, opt, hard_weight=0.0,
                                 temperature=1.0, donate=False)
        state = init_train_state(student, opt)
        batch = make_batch()
        first = None
        for _ in range(200):
            state, m = step(state, teacher, batch)
            if first is None:
                first = {k: float(v) for k, v in m.items()}
        last = {k: float(v) for k, v in m.items()}
        assert last["loss"] < first["loss"]
        # random init argmax-agrees near 0; distillation drags it up even
        # though the near-uniform teacher makes ties slow to resolve
        assert last["agreement"] > max(0.5, first["agreement"])

    def test_grad_accum_matches_flat(self):
        cfg = small_cfg()
        student = init_params(cfg, 0)
        teacher = init_params(cfg, 7)
        opt = make_optimizer(peak_lr=1e-3, warmup_steps=0, total_steps=10)
        flat_step = make_distill_step(cfg, cfg, opt, donate=False)
        accum_step = make_distill_step(cfg, cfg, opt, grad_accum=2, donate=False)
        big = make_batch(b=4)
        micro = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in big.items()}
        s1, m1 = flat_step(init_train_state(student, opt), teacher, big)
        s2, m2 = accum_step(init_train_state(student, opt), teacher, micro)
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s1.params, s2.params)
        assert max(jax.tree.leaves(d)) < 1e-5

    def test_agreement_eval_step(self):
        cfg = small_cfg()
        ps, pt = init_params(cfg, 0), init_params(cfg, 1)
        ev = make_agreement_step(cfg, cfg)
        m = ev(ps, pt, make_batch())
        assert set(m) == {"loss", "soft", "hard", "agreement"}
        assert 0.0 <= float(m["agreement"]) <= 1.0


class TestMismatchedMels:
    @pytest.mark.slow
    def test_raw_audio_two_frontends(self):
        # an 80-mel draft distilling against a 128-mel target from ONE raw
        # audio batch: both fused mel variants run inside the jitted loss
        cfg_d = small_cfg(n_mels=80, n_audio_ctx=1500)
        cfg_t = small_cfg(n_mels=128, n_audio_ctx=1500)
        pd, pt = init_params(cfg_d, 0), init_params(cfg_t, 1)
        rng = np.random.default_rng(0)
        batch = {
            "audio": jnp.asarray(rng.standard_normal((1, 480000)), jnp.float32),
            "decoder_input_ids": jnp.asarray([[5, 9, 11, 2]], jnp.int32),
            "labels": jnp.asarray([[9, 11, 2, -100]], jnp.int32),
        }
        loss_fn = make_distill_loss_fn(cfg_d, cfg_t, mel_interpret=True)
        loss, aux = loss_fn(pd, pt, batch)
        assert np.isfinite(float(loss))
        assert 0.0 <= float(aux["agreement"]) <= 1.0


class TestCLI:
    @pytest.mark.slow
    def test_distill_cli_smoke(self, tmp_path, monkeypatch):
        """scripts/distill.py end-to-end on a synthetic WAV corpus: runs a
        short tiny.en->tiny.en distillation, writes checkpoints + summary +
        safetensors export."""
        import importlib.util
        import json
        import os
        import sys
        import wave

        root = tmp_path / "corpus"
        jsonl = root / "jsonl"
        jsonl.mkdir(parents=True)
        rng = np.random.default_rng(0)
        rows = [
            {"id": "0", "file": "a0.wav", "text": "take aspirin daily",
             "description": "aspirin", "bias_words": ["aspirin"]},
            {"id": "1", "file": "a1.wav", "text": "plain words here",
             "description": "plain", "bias_words": []},
        ]
        for phase in ("train", "dev"):
            with open(jsonl / f"{phase}.jsonl", "w") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")
            d = root / "audio" / phase
            d.mkdir(parents=True)
            for r in rows:
                sig = (rng.standard_normal(16000) * 3000).astype(np.int16)
                with wave.open(str(d / r["file"]), "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(16000)
                    w.writeframes(sig.tobytes())

        out = tmp_path / "draft"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "wcb_distill_cli", os.path.join(repo, "scripts", "distill.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(sys, "argv", [
            "distill.py", "--model", "tiny.en", "--draft_model", "tiny.en",
            "--data_root", str(root), "--data_dir", "audio",
            "--jsonl_data", str(jsonl), "--output", str(out),
            "--batch", "2", "--epoch", "1", "--warmup_steps", "0",
            "--logging_steps", "1", "--eval_batches", "1",
            "--model_parallelism", "0", "--prompt",
        ])
        mod.main()
        assert (out / "distill_results.json").is_file()
        with open(out / "distill_results.json") as f:
            summary = json.load(f)
        assert summary["total_steps"] >= 1
        assert 0.0 <= summary["best_agreement"] <= 1.0
        from whisper_context_biasing_tpu.train.checkpoint import (
            list_checkpoints,
        )
        assert list_checkpoints(str(out))
        assert (out / "model.safetensors").is_file()


class TestRunner:
    def test_distill_and_evaluate_checkpoints(self, tmp_path):
        import json
        import os

        from whisper_context_biasing_tpu.train import (
            DistillConfig,
            distill_and_evaluate,
        )
        from whisper_context_biasing_tpu.train.checkpoint import (
            find_best_checkpoint,
            list_checkpoints,
        )

        cfg = small_cfg()
        teacher = init_params(cfg, 7)
        student = init_params(cfg, 0)
        # the jitted step donates its input state, so the caller's buffers
        # are consumed — snapshot to host for the changed-params check
        student0 = jax.tree.map(np.asarray, student)

        class SynthDataset:
            def __init__(self, n):
                self.n = n
                self.rng = np.random.default_rng(3)
                self.rows = [self._row() for _ in range(n)]

            def _row(self):
                s = 8
                dec = self.rng.integers(0, V, size=s).astype(np.int64)
                labels = np.concatenate([dec[1:], [-100]]).astype(np.int64)
                feats = self.rng.standard_normal((80, 128)).astype(np.float32)
                return {"input_features": feats, "decoder_input_ids": dec,
                        "labels": labels}

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return self.rows[i]

        def collate(rows):
            return {k: np.stack([r[k] for r in rows]).astype(
                        np.int32 if k != "input_features" else np.float32)
                    for k in rows[0]}

        dcfg = DistillConfig(
            output_dir=str(tmp_path), per_device_train_batch_size=2,
            num_train_epochs=1, warmup_steps=0, learning_rate=1e-3,
            eval_steps=2, save_steps=2, logging_steps=1, eval_batches=2,
            save_total_limit=1)
        ds = SynthDataset(8)
        params, hist = distill_and_evaluate(
            cfg, student, cfg, teacher, ds, SynthDataset(4), collate, dcfg)
        ckpts = list_checkpoints(str(tmp_path))
        assert ckpts, "no checkpoint written"
        best = find_best_checkpoint(str(tmp_path),
                                    metric_key="eval_disagreement")
        assert best is not None
        with open(os.path.join(best, "trainer_state.json")) as f:
            meta = json.load(f)
        assert "eval_agreement" in meta and "eval_step" in meta
        assert any("eval_agreement" in h for h in hist)
        assert any("best_agreement" in h for h in hist)
        # params changed (training actually ran)
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             jax.tree.map(np.asarray, params), student0)
        assert max(jax.tree.leaves(diffs)) > 0

    def test_probe_pads_partial_eval_batch(self, tmp_path):
        """A dev set not divisible by the batch size must reach the eval fn
        cycle-padded to the static batch shape (mesh sharding + compile
        stability; review regression)."""
        from whisper_context_biasing_tpu.train import (
            DistillConfig,
            distill_and_evaluate,
        )

        cfg = small_cfg()
        rng = np.random.default_rng(3)

        class DS:
            def __init__(self, n):
                self.rows = []
                for _ in range(n):
                    dec = rng.integers(0, V, size=8).astype(np.int64)
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

        seen = []

        def spy_shard(b):
            seen.append(next(iter(b.values())).shape[0])
            return b

        dcfg = DistillConfig(
            output_dir=str(tmp_path), per_device_train_batch_size=2,
            num_train_epochs=1, warmup_steps=0, eval_steps=1, save_steps=10,
            logging_steps=10, eval_batches=3)
        distill_and_evaluate(
            cfg, init_params(cfg, 0), cfg, init_params(cfg, 1),
            DS(4), DS(3), collate, dcfg, eval_shard_fn=spy_shard)
        assert seen and all(s == 2 for s in seen)  # 3-row dev: 2 + pad(1->2)
