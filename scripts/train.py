#!/usr/bin/env python
"""Train the Whisper medical context-biasing model (TPU-native).

CLI surface preserved from the reference ``scripts/train.py:26-45`` with the
documented dead flags fixed (SURVEY.md §7): ``--lr``/``--epoch`` are honored
(defaults = the values the reference hardcodes: lr 1e-5, 5 epochs), hub sync
is optional/gated (this environment is offline), and bias spans are collected
tokenizer-only instead of decoding the whole test audio set.

New TPU-native flags: --model (family preset), --vocab/--merges (real
tokenizer assets; offline byte-fallback otherwise), --init_checkpoint
(HF safetensors or native checkpoint), --model_parallelism,
--prompt_generation / --bias_boost (decode-time biasing, a new capability).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from whisper_context_biasing_tpu.utils import setup_jax
setup_jax()

from whisper_context_biasing_tpu.data import PromptWhisperDataset, SpeechSeq2SeqCollator
from whisper_context_biasing_tpu.metrics import compute_bias_wer
from whisper_context_biasing_tpu.models import get_config, init_params, load_safetensors
from whisper_context_biasing_tpu.tokenizer import load_tokenizer
from whisper_context_biasing_tpu.train import (
    TrainingConfig,
    evaluate_wer,
    load_checkpoint,
    train_and_evaluate,
)
from whisper_context_biasing_tpu.parallel import auto_mesh, shard_batch, shard_params

DEFAULT_DATA_DIR = "data/medical-united-syn-med-test"
DEFAULT_JSONL = "data/medical-united-syn-med-test-jsonl"


def parse_args():
    p = argparse.ArgumentParser(description="Train Whisper medical model with context biasing")
    # reference surface (scripts/train.py:26-45)
    p.add_argument("--output", type=str, default="results")
    p.add_argument("--data_root", type=str, default="")
    p.add_argument("--data_dir", type=str, default=DEFAULT_DATA_DIR)
    p.add_argument("--jsonl_data", type=str, default=DEFAULT_JSONL)
    p.add_argument("--refs_pred_file", type=str, default=None)
    p.add_argument("--bias_weight", type=float, default=1.5)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--epoch", type=float, default=5)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--hub_model_id", type=str, default=None,
                   help="kept for API parity; hub sync is skipped offline")
    p.add_argument("--hf_token", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--prompt", action="store_true")
    p.add_argument("--random", action="store_true")
    p.add_argument("--bias_list", action="store_true")
    p.add_argument("--bias_nums", type=int, default=0)
    p.add_argument("--bias_desc", action="store_true")
    # TPU-native additions
    p.add_argument("--model", type=str, default="base.en")
    p.add_argument("--vocab", type=str, default=None)
    p.add_argument("--merges", type=str, default=None)
    p.add_argument("--init_checkpoint", type=str, default=None,
                   help="HF model.safetensors or native checkpoint-N dir")
    p.add_argument("--model_parallelism", type=int, default=1,
                   help="tensor-parallel degree over a (data, model) mesh; "
                        "1 (default) = pure data parallel over all visible "
                        "same-platform devices, 0 = single device")
    p.add_argument("--eval_steps", type=int, default=135)
    p.add_argument("--save_steps", type=int, default=135)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--eval_batch", type=int, default=2)
    p.add_argument("--grad_accum", type=int, default=4)
    p.add_argument("--prompt_generation", action="store_true",
                   help="condition eval generation on the context prefix")
    p.add_argument("--bias_boost", type=float, default=0.0,
                   help="decode-time bias-span logit bonus")
    p.add_argument("--flash_attention", action="store_true",
                   help="Pallas flash attention in the encoder (fwd+bwd kernels)")
    p.add_argument("--fused_ln", action="store_true",
                   help="fused LayerNorm+QKV and LayerNorm+bias+gelu Pallas "
                        "kernels (ops/fused_block.py). Measured SLOWER than "
                        "the XLA fusions for training at base.en (docs/"
                        "PERF.md round 5) — opt-in for larger-d experiments")
    p.add_argument("--remat", default="auto",
                   choices=["auto", "full", "dots", "wide", "none"],
                   help="rematerialization policy for transformer blocks: "
                        "auto = full (fastest AND min-HBM since the fused "
                        "flash backward — recompute beats saved-activation "
                        "traffic, round-4 docs/PERF.md; none/dots kept for "
                        "measurement)")
    p.add_argument("--freeze_encoder", action="store_true",
                   help="train the decoder only (reference freeze_encoder())")
    p.add_argument("--lora_rank", type=int, default=0,
                   help=">0: parameter-efficient LoRA fine-tune (rank-r "
                        "adapters on the attention q/v projections; "
                        "checkpoints hold the tiny adapter tree, final "
                        "weights are merged dense — train/lora.py). "
                        "--freeze_encoder adapts the decoder only")
    p.add_argument("--lora_alpha", type=float, default=16.0)
    p.add_argument("--speed_perturb", type=float, nargs="*", default=None,
                   help="sox-style speed augmentation factors, e.g. "
                        "0.9 1.0 1.1 (train phase only; one drawn per "
                        "sample per epoch, deterministic)")
    p.add_argument("--spec_augment", action="store_true",
                   help="SpecAugment mel masking inside the train step "
                        "(2 freq masks <=27 bins + 2 time masks <=5%%; "
                        "train-time only — the reference has no spectrogram "
                        "augmentation)")
    p.add_argument("--checkpoint_backend", choices=["npz", "orbax"],
                   default="npz",
                   help="orbax: tensorstore array serialization — sharded "
                        "params save without a host gather (large meshes)")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args()


def main():
    args = parse_args()
    print(f"Arguments: {vars(args)}")
    from whisper_context_biasing_tpu.train import latest_checkpoint
    from whisper_context_biasing_tpu.utils import warn_missing_assets
    # --resume with an existing checkpoint restores real weights; don't
    # tell the operator the run is random-init in that case
    resumable = args.resume and latest_checkpoint(args.output)
    warn_missing_assets(args.vocab, args.init_checkpoint or resumable, "train")

    if args.speed_perturb and any(f <= 0 for f in args.speed_perturb):
        raise SystemExit(f"--speed_perturb factors must be > 0, got "
                         f"{args.speed_perturb}")
    tokenizer = load_tokenizer(args.vocab, args.merges,
                               multilingual=not args.model.endswith(".en"))
    remat = args.remat
    if remat == "auto":
        # round 4 (docs/PERF.md): with the fused flash backward the step is
        # no longer compute-dominated and remat=full measures FASTEST at
        # every size (base.en: 4560 vs none 4092 audio_s/s) while also
        # minimizing HBM — the old small-model "none" heuristic is stale
        remat = "full"
    model_cfg = get_config(args.model, flash_attention=args.flash_attention,
                           fused_ln_qkv=args.fused_ln,
                           fused_ln_mlp=args.fused_ln, remat=remat)
    collator = SpeechSeq2SeqCollator(
        pad_token_id=tokenizer.pad_token_id,
        decoder_start_token_id=tokenizer.sot,
        decoder_prev_token_id=tokenizer.sop,
        pad_to_multiple=32,
        # must match the loss's span_pad_id (cfg.pad_token_id == eot): for
        # multilingual models eot is 50257, not the .en default 50256 —
        # a mismatch silently disables WeightCE bias weighting
        bias_span_pad_id=tokenizer.eot,
    )

    for phase in ("train", "dev", "test"):
        path = os.path.join(args.jsonl_data, f"{phase}.jsonl")
        if not os.path.isfile(path):
            raise FileNotFoundError(f"JSONL file not found: {path}")

    ds_kwargs = dict(
        base_path=os.path.join(args.data_root, args.data_dir),
        jsonl_data=args.jsonl_data, tokenizer=tokenizer,
        prompt=args.prompt, random=args.random, bias_list=args.bias_list,
        bias_nums=args.bias_nums, bias_desc=args.bias_desc, seed=args.seed,
        n_mels=model_cfg.n_mels,  # 128 for large-v3
        # dataset gates on phase, so dev/test are never perturbed
        speed_perturb=(tuple(args.speed_perturb)
                       if args.speed_perturb else None),
    )
    data_train = PromptWhisperDataset(phase="train", **ds_kwargs)
    data_eval = PromptWhisperDataset(phase="dev", **ds_kwargs)
    data_test = PromptWhisperDataset(phase="test", **ds_kwargs)
    for name, ds in (("train", data_train), ("dev", data_eval), ("test", data_test)):
        if len(ds) == 0:
            raise ValueError(f"{name} dataset is empty")
        print(f"{name} data length: {len(ds)}")

    # spans need only the tokenizer (fixes scripts/train.py:163 audio decode)
    bias_spans = data_test.all_bias_spans()

    # model init: native checkpoint > HF safetensors > random
    from whisper_context_biasing_tpu.train.checkpoint import is_native_checkpoint
    if is_native_checkpoint(args.init_checkpoint):
        params, _, _ = load_checkpoint(args.init_checkpoint)
    elif args.init_checkpoint:
        params, model_cfg = load_safetensors(args.init_checkpoint, model_cfg)
    else:
        print("no init checkpoint given: random init (offline environment)")
        params = init_params(model_cfg, args.seed)

    # Auto-mesh: pure dp over all same-platform devices by default (the
    # reference trains single-GPU; TPU-native default is every chip of the
    # host), dp × tp when --model_parallelism > 1, single-device with 0.
    shard_fn = None
    mesh = auto_mesh(args.model_parallelism, batch_divisor=args.batch)
    if mesh is not None:
        print(f"mesh: data={mesh.shape['data']} x model={mesh.shape['model']}")
        params = shard_params(params, mesh)
        shard_fn = lambda b: shard_batch(  # noqa: E731
            b, mesh, extra_leading_axes=1 if args.grad_accum > 1 else 0
        )

    tcfg = TrainingConfig(
        output_dir=args.output,
        per_device_train_batch_size=args.batch,
        per_device_eval_batch_size=args.eval_batch,
        gradient_accumulation_steps=args.grad_accum,
        learning_rate=args.lr,
        num_train_epochs=args.epoch,
        eval_steps=args.eval_steps,
        save_steps=args.save_steps,
        logging_steps=args.logging_steps,
        bias_weight=args.bias_weight,
        freeze_encoder=args.freeze_encoder,
        prompt_generation=args.prompt_generation,
        bias_boost=args.bias_boost,
        seed=args.seed,
        hub_model_id=args.hub_model_id,
        hub_token=args.hf_token,
        checkpoint_backend=args.checkpoint_backend,
        spec_augment=args.spec_augment,
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
    )
    print("Starting training...")
    params, log_history = train_and_evaluate(
        model_cfg, params, tokenizer, data_train, data_eval, collator, tcfg,
        resume=args.resume, shard_fn=shard_fn, mesh=mesh,
    )

    print("Starting final evaluation on test set...")
    refs_pred_file = args.refs_pred_file or os.path.join(args.output, "refs_and_pred.txt")
    result = evaluate_wer(
        params, model_cfg, tokenizer, data_test, collator,
        tcfg.per_device_eval_batch_size, tcfg.generation_max_length - 1,
        refs_pred_file=refs_pred_file,
        prompt_generation=args.prompt_generation, bias_boost=args.bias_boost,
        mesh=mesh,
    )
    print("Test set evaluation results:", result)
    with open(os.path.join(args.output, "test_results.json"), "w") as f:
        json.dump(result, f, indent=4)

    print("Calculating bias WER...")
    bias_result = compute_bias_wer(refs_pred_file, bias_spans, tokenizer)
    print("Bias WER result:", bias_result)
    bias_file = os.path.join(args.output, "bias_wer_results.json")
    with open(bias_file, "w") as f:
        json.dump(bias_result, f, indent=4)

    # hub sync parity (reference scripts/train.py:285-307), gated offline
    if args.hub_model_id and args.hf_token:
        from whisper_context_biasing_tpu.utils import (
            push_to_hub_if_exists, upload_results_to_hub,
        )

        # the reference's hub artifacts are HF checkpoints: export the final
        # weights in transformers-loadable form alongside the native ones
        try:
            from whisper_context_biasing_tpu.models import save_safetensors

            save_safetensors(params, model_cfg, args.output)
        except Exception as e:  # noqa: BLE001 — sync must not fail training
            print(f"HF export skipped: {e}")

        upload_results_to_hub(os.path.join(args.output, "test_results.json"),
                              args.hub_model_id, "results/test_results.json",
                              args.hf_token)
        upload_results_to_hub(bias_file, args.hub_model_id,
                              "results/bias_wer_results.json", args.hf_token)
        push_to_hub_if_exists(args.output, args.hub_model_id, args.hf_token)


if __name__ == "__main__":
    main()
