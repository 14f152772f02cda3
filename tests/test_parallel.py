"""Sharding tests on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8): tensor-parallel forward parity and a
full dp+tp train step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from whisper_context_biasing_tpu.models import forward, init_params, tiny_test_config
from whisper_context_biasing_tpu.parallel import (
    make_mesh,
    param_specs,
    shard_batch,
    shard_params,
)
from whisper_context_biasing_tpu.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from jax.sharding import PartitionSpec as P
from conftest import cpu_devices

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = init_params(cfg, 0)
    rng = np.random.default_rng(0)
    batch = {
        "input_features": (rng.standard_normal((8, 80, 128)) * 0.3).astype(np.float32),
        "decoder_input_ids": np.tile([[50257, 5, 6, 7]], (8, 1)).astype(np.int32),
        "labels": np.tile([[5, 6, 7, 50256]], (8, 1)).astype(np.int32),
        "bias_spans": np.full((8, 2, 3), 50256, np.int32),
    }
    return cfg, params, batch


class TestSpecs:
    def test_spec_shapes(self, setup):
        cfg, params, _ = setup
        specs = param_specs(params)
        assert specs["decoder"]["self_attn"]["wq"] == P(None, None, "model")
        assert specs["decoder"]["self_attn"]["wo"] == P(None, "model", None)
        assert specs["decoder"]["mlp"]["w1"] == P(None, None, "model")
        assert specs["decoder"]["token_emb"] == P("model", None)
        assert specs["encoder"]["ln_post"]["scale"] == P()
        assert specs["encoder"]["conv1"]["w"] == P()


@pytest.mark.slow
class TestTensorParallelParity:
    @pytest.mark.parametrize("model_par", [2, 4])
    def test_forward_matches_single_device(self, setup, model_par):
        cfg, params, batch = setup
        ref = np.asarray(
            forward(params, cfg, jnp.asarray(batch["input_features"]),
                    jnp.asarray(batch["decoder_input_ids"]))
        )
        mesh = make_mesh(model_parallelism=model_par, devices=cpu_devices())
        p_sh = shard_params(params, mesh)
        b_sh = shard_batch(
            {"input_features": batch["input_features"],
             "decoder_input_ids": batch["decoder_input_ids"]},
            mesh,
        )
        with mesh:
            out = np.asarray(
                jax.jit(lambda p, m, t: forward(p, cfg, m, t))(
                    p_sh, b_sh["input_features"], b_sh["decoder_input_ids"]
                )
            )
        np.testing.assert_allclose(out, ref, atol=2e-3)


@pytest.mark.slow
class TestDistributedTrainStep:
    def test_dp_tp_step(self, setup):
        cfg, params, batch = setup
        mesh = make_mesh(model_parallelism=2, devices=cpu_devices())  # 4-way dp x 2-way tp
        opt = make_optimizer(peak_lr=1e-4, warmup_steps=0, total_steps=10)
        step = make_train_step(cfg, opt, donate=False)
        p_sh = shard_params(params, mesh)
        b_sh = shard_batch(batch, mesh)
        with mesh:
            state = init_train_state(p_sh, opt)
            state, metrics = step(state, b_sh)
            loss = float(metrics["loss"])
        assert np.isfinite(loss)
        # loss must equal the single-device step loss
        step1 = make_train_step(cfg, opt, donate=False)
        _, m1 = step1(init_train_state(params, opt), jax.tree.map(jnp.asarray, batch))
        assert loss == pytest.approx(float(m1["loss"]), rel=1e-4)

    def test_distill_step_sharded_matches_single_device(self, setup):
        """Draft distillation under dp x tp: loss and agreement must match
        the single-device step (teacher and student both mesh-sharded)."""
        from whisper_context_biasing_tpu.train import make_distill_step

        cfg, params, batch = setup
        teacher = init_params(cfg, 3)
        opt = make_optimizer(peak_lr=1e-4, warmup_steps=0, total_steps=10)
        step = make_distill_step(cfg, cfg, opt, donate=False)
        b = {k: batch[k] for k in ("input_features", "decoder_input_ids",
                                   "labels")}
        _, m1 = step(init_train_state(params, opt), teacher,
                     jax.tree.map(jnp.asarray, b))

        mesh = make_mesh(model_parallelism=2, devices=cpu_devices())
        p_sh = shard_params(params, mesh)
        t_sh = shard_params(teacher, mesh)
        b_sh = shard_batch(b, mesh)
        with mesh:
            state = init_train_state(p_sh, opt)
            state, m2 = step(state, t_sh, b_sh)
            loss = float(m2["loss"])
        assert loss == pytest.approx(float(m1["loss"]), rel=1e-4)
        assert float(m2["agreement"]) == pytest.approx(
            float(m1["agreement"]), abs=1e-6)

    def test_grad_accum_sharded(self, setup):
        cfg, params, batch = setup
        # data=4 so each microbatch of 4 shards evenly
        mesh = make_mesh(model_parallelism=2, devices=cpu_devices())
        opt = make_optimizer(peak_lr=1e-4, warmup_steps=0, total_steps=10)
        step = make_train_step(cfg, opt, grad_accum=2, donate=False)
        stacked = jax.tree.map(lambda a: np.stack([a[:4], a[4:]]), batch)
        p_sh = shard_params(params, mesh)
        b_sh = shard_batch(stacked, mesh, extra_leading_axes=1)
        with mesh:
            state = init_train_state(p_sh, opt)
            state, metrics = step(state, b_sh)
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
class TestShardedDecode:
    def test_dp_greedy_decode_matches_single_device(self, setup):
        """Serving path: batch-sharded greedy decode under the mesh must
        reproduce single-device tokens exactly."""
        import jax.numpy as jnp
        from whisper_context_biasing_tpu.decode import greedy_decode, pack_prefixes

        cfg, params, batch = setup
        mel = jnp.asarray(batch["input_features"])
        ids, mask = pack_prefixes([[50257]] * 8, 50256)
        ref = greedy_decode(params, cfg, mel, jnp.asarray(ids), jnp.asarray(mask),
                            max_new=6)
        ref_toks = np.asarray(ref.tokens)

        mesh = make_mesh(model_parallelism=2, devices=cpu_devices())
        p_sh = shard_params(params, mesh)
        b_sh = shard_batch({"mel": batch["input_features"], "ids": ids, "mask": mask}, mesh)
        with mesh:
            out = greedy_decode(p_sh, cfg, b_sh["mel"], b_sh["ids"], b_sh["mask"],
                                max_new=6)
            toks = np.asarray(out.tokens)
        np.testing.assert_array_equal(toks, ref_toks)

    def test_decode_batch_mesh_uneven_with_bias(self, setup):
        """decode_batch(mesh=...) pads an uneven batch to a dp multiple,
        shards it, and returns exactly the single-device token lists."""
        from whisper_context_biasing_tpu.decode import decode_batch
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg, params, batch = setup
        tok = load_tokenizer(multilingual=True)
        mel = batch["input_features"][:5]  # 5 rows, dp=4 -> pads to 8
        spans = np.full((5, 2, 3), tok.eot, np.int32)
        spans[0, 0, :2] = [7, 8]
        ref = decode_batch(params, cfg, tok, mel, max_new=6,
                           bias_spans=spans, bias_boost=0.5)

        mesh = make_mesh(model_parallelism=2, devices=cpu_devices())
        p_sh = shard_params(params, mesh)
        out = decode_batch(p_sh, cfg, tok, mel, max_new=6,
                           bias_spans=spans, bias_boost=0.5, mesh=mesh)
        assert out == ref

    def test_speculative_decode_batch_mesh(self, setup):
        """Speculative decode under a dp x tp mesh: the per-row cache
        offsets (vmapped dynamic_update_slice + slot-causal masks) are
        row-local, so batch sharding must reproduce the single-device
        (= plain greedy) token lists exactly."""
        from whisper_context_biasing_tpu.decode import (
            decode_batch, speculative_decode_batch)
        from whisper_context_biasing_tpu.models import tiny_test_config
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg, params, batch = setup
        cfg_d = tiny_test_config(n_audio_layers=1, n_text_layers=1,
                                 d_model=32, n_heads=2)
        params_d = init_params(cfg_d, 7)
        tok = load_tokenizer(multilingual=True)
        mel = batch["input_features"][:5]  # 5 rows, dp=4 -> pads to 8
        spans = np.full((5, 2, 3), tok.eot, np.int32)
        spans[0, 0, :2] = [7, 8]
        ref = decode_batch(params, cfg, tok, mel, max_new=6,
                           bias_spans=spans, bias_boost=0.5)

        mesh = make_mesh(model_parallelism=2, devices=cpu_devices())
        p_sh = shard_params(params, mesh)
        pd_sh = shard_params(params_d, mesh)
        out = speculative_decode_batch(
            pd_sh, cfg_d, p_sh, cfg, tok, mel, max_new=6, k=3,
            bias_spans=spans, bias_boost=0.5, mesh=mesh)
        assert out == ref

    def test_chunked_long_form_mesh_matches_single_device(self, setup):
        """SURVEY §5 sequence scaling: chunked long-form windows decode in
        parallel ACROSS the mesh — dp-sharded window batches must reproduce
        single-device tokens exactly."""
        from whisper_context_biasing_tpu.decode import transcribe_chunked
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg, params, _ = setup
        tok = load_tokenizer()
        rng = np.random.default_rng(9)
        win = cfg.n_audio_ctx * 320
        audios = [rng.standard_normal(int(win * 1.6)).astype(np.float32) * 0.1,
                  rng.standard_normal(win // 2).astype(np.float32) * 0.1]

        def mel_fn(chunk):
            r = np.random.default_rng(
                int(abs(np.asarray(chunk)).sum() * 1e3) % 2**31)
            return (r.standard_normal((np.asarray(chunk).shape[0], 80, 128))
                    * 0.5).astype(np.float32)

        kw = dict(mel_fn=mel_fn, max_new=5, temperatures=(0.0,),
                  no_speech_threshold=None, logprob_threshold=None,
                  compression_ratio_threshold=None, window_samples=win,
                  use_timestamps=False)
        ref = transcribe_chunked(params, cfg, tok, audios, **kw)

        mesh = make_mesh(model_parallelism=2, devices=cpu_devices())
        p_sh = shard_params(params, mesh)
        got = transcribe_chunked(p_sh, cfg, tok, audios, mesh=mesh, **kw)
        assert got == ref

    def test_medusa_decode_batch_mesh(self, setup):
        """medusa_decode_batch(mesh=...) shards the batch over 'data' and
        reproduces single-device tokens exactly."""
        from whisper_context_biasing_tpu.decode import medusa_decode_batch
        from whisper_context_biasing_tpu.models import init_medusa_params
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg, params, batch = setup
        tok = load_tokenizer()
        md = init_medusa_params(cfg, 2, 0)
        mel = batch["input_features"]
        ref = medusa_decode_batch(params, cfg, md, tok, mel, max_new=5)
        mesh = make_mesh(model_parallelism=2, devices=cpu_devices())
        p_sh = shard_params(params, mesh)
        got = medusa_decode_batch(p_sh, cfg, md, tok, mel, max_new=5,
                                  mesh=mesh)
        assert got == ref
        # chain mode (n_chains stamped in the head dict) under the same mesh
        md2 = dict(md, n_chains=2)
        got2 = medusa_decode_batch(p_sh, cfg, md2, tok, mel, max_new=5,
                                   mesh=mesh)
        assert got2 == ref

    def test_sequential_long_form_mesh_matches_single_device(self, setup):
        """transcribe_long_batch(mesh=...) shards every window call's file
        batch over 'data' and must reproduce single-device tokens exactly
        (history conditioning included)."""
        from whisper_context_biasing_tpu.decode import transcribe_long_batch
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg, params, _ = setup
        tok = load_tokenizer()
        rng = np.random.default_rng(11)
        win = cfg.n_audio_ctx * 320
        audios = [rng.standard_normal(int(win * 1.5)).astype(np.float32) * 0.1,
                  rng.standard_normal(win // 2).astype(np.float32) * 0.1]

        def mel_fn(chunk):
            r = np.random.default_rng(
                int(abs(np.asarray(chunk)).sum() * 1e3) % 2**31)
            return (r.standard_normal((np.asarray(chunk).shape[0], 80, 128))
                    * 0.5).astype(np.float32)

        kw = dict(mel_fn=mel_fn, max_new=5, temperatures=(0.0,),
                  no_speech_threshold=None, logprob_threshold=None,
                  compression_ratio_threshold=None, window_samples=win)
        ref = transcribe_long_batch(params, cfg, tok, audios, **kw)

        mesh = make_mesh(model_parallelism=2, devices=cpu_devices())
        p_sh = shard_params(params, mesh)
        got = transcribe_long_batch(p_sh, cfg, tok, audios, mesh=mesh, **kw)
        assert got == ref

    def test_beam_decode_batch_mesh(self, setup):
        from whisper_context_biasing_tpu.decode import beam_decode_batch
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer

        cfg, params, batch = setup
        tok = load_tokenizer(multilingual=True)
        mel = batch["input_features"][:4]
        ref = beam_decode_batch(params, cfg, tok, mel, num_beams=2, max_new=5)

        mesh = make_mesh(model_parallelism=1, devices=cpu_devices())  # pure dp
        p_sh = shard_params(params, mesh)
        out = beam_decode_batch(p_sh, cfg, tok, mel, num_beams=2, max_new=5,
                                mesh=mesh)
        assert out == ref


class TestAutoMesh:
    """VERDICT r2 ask #3: pure data parallelism must be reachable from the
    reference CLI surface (default --model_parallelism 1 => dp over all
    visible same-platform devices; 0 opts out)."""

    def test_auto_mesh_semantics(self):
        from whisper_context_biasing_tpu.parallel import auto_mesh

        assert auto_mesh(0) is None
        assert auto_mesh(1, devices=cpu_devices()[:1]) is None
        m = auto_mesh(1, devices=cpu_devices())
        assert m.shape == {"data": 8, "model": 1}
        m = auto_mesh(2, devices=cpu_devices())
        assert m.shape == {"data": 4, "model": 2}
        # batch_divisor shrinks dp to the largest divisor of the batch
        m = auto_mesh(1, devices=cpu_devices(), batch_divisor=6)
        assert m.shape == {"data": 6, "model": 1}
        m = auto_mesh(2, devices=cpu_devices(), batch_divisor=3)
        assert m.shape == {"data": 3, "model": 2}
        assert auto_mesh(1, devices=cpu_devices(), batch_divisor=1) is None
        # an explicit tensor-parallel request that can't be honored must
        # raise, never silently shrink or run single-device
        with pytest.raises(ValueError):
            auto_mesh(3, devices=cpu_devices())
        with pytest.raises(ValueError):
            auto_mesh(4, devices=cpu_devices()[:2])

    @pytest.mark.slow
    def test_train_cli_dp_matches_single_device(self, tmp_path, monkeypatch):
        """Drive scripts/train.py main() unmodified (tiny test model patched
        in) on the 8-CPU host: default flags must auto-mesh pure dp and log
        the same per-step losses as --model_parallelism 0."""
        import importlib.util
        import json as _json
        import os
        import sys
        import wave

        from whisper_context_biasing_tpu.audio import log_mel_spectrogram_np
        from whisper_context_biasing_tpu.train import list_checkpoints

        # tiny wav corpus
        root = tmp_path / "corpus"
        jsonl = root / "jsonl"
        jsonl.mkdir(parents=True)
        rng = np.random.default_rng(0)
        rows = [
            {"id": str(i), "file": f"a{i}.wav", "text": t,
             "description": t, "bias_words": []}
            for i, t in enumerate(
                ["take aspirin daily", "promisec treats pressure",
                 "use the nebulizer now", "plain words here"])
        ]
        for phase in ("train", "dev", "test"):
            with open(jsonl / f"{phase}.jsonl", "w") as f:
                for r in rows:
                    f.write(_json.dumps(r) + "\n")
            d = root / "audio" / phase
            d.mkdir(parents=True, exist_ok=True)
            for r in rows:
                sig = (rng.standard_normal(16000) * 3000).astype(np.int16)
                with wave.open(str(d / r["file"]), "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(16000)
                    w.writeframes(sig.tobytes())

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "wcb_train_cli", os.path.join(repo, "scripts", "train.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        monkeypatch.setattr(mod, "get_config",
                            lambda name, **kw: tiny_test_config())
        ds_cls = mod.PromptWhisperDataset
        monkeypatch.setattr(
            mod, "PromptWhisperDataset",
            lambda **kw: ds_cls(
                feature_extractor=lambda a: log_mel_spectrogram_np(a)[:, :128],
                **kw),
        )

        def run(mp: int) -> list:
            out = str(tmp_path / f"out_mp{mp}")
            monkeypatch.setattr(sys, "argv", [
                "train.py", "--data_root", str(root), "--data_dir", "audio",
                "--jsonl_data", str(jsonl), "--output", out,
                "--batch", "2", "--grad_accum", "1", "--epoch", "1",
                "--eval_steps", "99", "--save_steps", "2", "--lr", "1e-4",
                "--logging_steps", "1",
                "--seed", "7", "--model_parallelism", str(mp),
            ])
            mod.main()
            newest = list_checkpoints(out)[-1]
            with open(os.path.join(newest, "trainer_state.json")) as f:
                hist = _json.load(f)["log_history"]
            return [(e["step"], e["loss"]) for e in hist if "loss" in e]

        dp_losses = run(1)      # auto-mesh: dp=2 (batch 2) x tp=1
        ref_losses = run(0)     # single device
        assert dp_losses and len(dp_losses) == len(ref_losses)
        for (s1, l1), (s0, l0) in zip(dp_losses, ref_losses):
            assert s1 == s0
            assert l1 == pytest.approx(l0, rel=2e-4)


@pytest.mark.slow
class TestShardedEval:
    def test_evaluate_wer_mesh_matches_single_device(self, setup, tmp_path):
        """evaluate_wer with a (data, model) mesh must score identically to
        the unsharded pass (same decode tokens -> same WER artifact)."""
        from whisper_context_biasing_tpu.data.collator import SpeechSeq2SeqCollator
        from whisper_context_biasing_tpu.tokenizer import load_tokenizer
        from whisper_context_biasing_tpu.train import evaluate_wer

        cfg, params, _ = setup
        tok = load_tokenizer()
        coll = SpeechSeq2SeqCollator(
            pad_token_id=tok.pad_token_id, decoder_start_token_id=tok.sot,
            decoder_prev_token_id=tok.sop, bias_span_pad_id=tok.eot)
        rng = np.random.default_rng(5)
        items = []
        for i in range(6):
            text = [" take aspirin", " hello world", " blood pressure"][i % 3]
            items.append({
                "input_features": (rng.standard_normal((80, 128)) * 0.4)
                .astype(np.float32),
                "labels": np.asarray(
                    [tok.sot] + tok.encode(text, add_special_tokens=False)
                    + [tok.eot], np.int32),
                "bias_spans": [],
            })

        ref = evaluate_wer(params, cfg, tok, items, coll, batch_size=4,
                           max_new=6,
                           refs_pred_file=str(tmp_path / "ref.txt"))
        mesh = make_mesh(devices=cpu_devices()[:4], model_parallelism=2)
        sharded = shard_params(params, mesh)
        got = evaluate_wer(sharded, cfg, tok, items, coll, batch_size=4,
                           max_new=6, mesh=mesh,
                           refs_pred_file=str(tmp_path / "got.txt"))
        assert got["wer"] == ref["wer"]
        assert (tmp_path / "got.txt").read_text() == (tmp_path / "ref.txt").read_text()
