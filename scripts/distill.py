#!/usr/bin/env python
"""Distill a speculative-decoding draft model from a trained target.

No reference counterpart (the reference has no speculative decoding): this
CLI trains the small draft that ``transcribe.py --draft_model`` /
``serve.py --draft_model`` consume, by matching the frozen target's output
distribution on the same prompted corpus the target was trained on
(train/distill.py). The metric that matters is printed every eval: dev-set
top-1 agreement — the speculative acceptance rate.

Typical flow:
  1. train the target:   scripts/train.py  --model large-v3 ...
  2. distill the draft:  scripts/distill.py --model large-v3 \
        --init_checkpoint results/            # target weights (frozen)
        --draft_model base --output draft/    # student
  3. serve the pair:     scripts/serve.py --model large-v3 ... \
        --draft_model base --draft_checkpoint draft/checkpoint-N

A draft whose mel frontend differs from the target's (e.g. 80-mel base
drafting for 128-mel large-v3) is supported: the data pipeline ships raw
audio and both fused log-mel variants run on device inside the jitted step.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from whisper_context_biasing_tpu.utils import setup_jax
setup_jax()

from whisper_context_biasing_tpu.data import PromptWhisperDataset, SpeechSeq2SeqCollator
from whisper_context_biasing_tpu.models import (
    get_config,
    init_params,
    load_checkpoint_or_safetensors,
)
from whisper_context_biasing_tpu.tokenizer import load_tokenizer
from whisper_context_biasing_tpu.train import DistillConfig, distill_and_evaluate
from whisper_context_biasing_tpu.parallel import auto_mesh, shard_batch, shard_params

DEFAULT_DATA_DIR = "data/medical-united-syn-med-test"
DEFAULT_JSONL = "data/medical-united-syn-med-test-jsonl"


def parse_args():
    p = argparse.ArgumentParser(
        description="Distill a speculative-decode draft model")
    # corpus flags shared with scripts/train.py
    p.add_argument("--output", type=str, default="draft")
    p.add_argument("--data_root", type=str, default="")
    p.add_argument("--data_dir", type=str, default=DEFAULT_DATA_DIR)
    p.add_argument("--jsonl_data", type=str, default=DEFAULT_JSONL)
    p.add_argument("--prompt", action="store_true")
    p.add_argument("--random", action="store_true")
    p.add_argument("--bias_list", action="store_true")
    p.add_argument("--bias_nums", type=int, default=0)
    p.add_argument("--bias_desc", action="store_true")
    p.add_argument("--vocab", type=str, default=None)
    p.add_argument("--merges", type=str, default=None)
    # target (teacher, frozen)
    p.add_argument("--model", type=str, default="base.en",
                   help="target model family (the serving model)")
    p.add_argument("--init_checkpoint", type=str, default=None,
                   help="target weights: HF safetensors or checkpoint-N dir")
    # draft (student)
    p.add_argument("--draft_model", type=str, default="tiny.en",
                   help="draft model family to train")
    p.add_argument("--draft_init", type=str, default=None,
                   help="optional draft init (safetensors / checkpoint-N); "
                        "random init otherwise — start from pretrained "
                        "weights of the family when available")
    # schedule
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epoch", type=float, default=3)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--temperature", type=float, default=2.0)
    p.add_argument("--hard_weight", type=float, default=0.5,
                   help="mix of ground-truth CE vs teacher KL (0 = pure "
                        "distillation, 1 = plain training)")
    p.add_argument("--eval_steps", type=int, default=200)
    p.add_argument("--save_steps", type=int, default=200)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--eval_batches", type=int, default=16)
    p.add_argument("--model_parallelism", type=int, default=1,
                   help="same mesh semantics as scripts/train.py (1 = dp "
                        "over all visible devices, 0 = single device)")
    p.add_argument("--checkpoint_backend", choices=["npz", "orbax"],
                   default="npz",
                   help="orbax: tensorstore arrays (sharded saves without "
                        "a host gather)")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args()


def main():
    args = parse_args()
    print(f"Arguments: {vars(args)}")
    from whisper_context_biasing_tpu.utils import warn_missing_assets
    warn_missing_assets(args.vocab, args.init_checkpoint, "distill")

    tokenizer = load_tokenizer(args.vocab, args.merges,
                               multilingual=not args.model.endswith(".en"))
    cfg_t = get_config(args.model)
    cfg_d = get_config(args.draft_model)
    if cfg_d.n_vocab != cfg_t.n_vocab:
        raise SystemExit(
            f"--draft_model {args.draft_model} (vocab {cfg_d.n_vocab}) does "
            f"not share a token space with --model {args.model} (vocab "
            f"{cfg_t.n_vocab}); pick a draft of the same lingual family")

    # teacher weights
    if args.init_checkpoint:
        params_t, cfg_t = load_checkpoint_or_safetensors(args.init_checkpoint, cfg_t)
    else:
        print("no --init_checkpoint: RANDOM target weights — the distilled "
              "draft will match a random teacher (smoke runs only)")
        params_t = init_params(cfg_t, args.seed)
    # student init
    if args.draft_init:
        params_d, cfg_d = load_checkpoint_or_safetensors(args.draft_init, cfg_d)
    else:
        params_d = init_params(cfg_d, args.seed + 1)

    mixed_mels = cfg_d.n_mels != cfg_t.n_mels
    if mixed_mels:
        print(f"mixed mel frontends (draft {cfg_d.n_mels} / target "
              f"{cfg_t.n_mels}): shipping raw audio, fused on-device mel")
    collator = SpeechSeq2SeqCollator(
        pad_token_id=tokenizer.pad_token_id,
        decoder_start_token_id=tokenizer.sot,
        decoder_prev_token_id=tokenizer.sop,
        pad_to_multiple=32,
        bias_span_pad_id=tokenizer.eot,
    )
    ds_kwargs = dict(
        base_path=os.path.join(args.data_root, args.data_dir),
        jsonl_data=args.jsonl_data, tokenizer=tokenizer,
        prompt=args.prompt, random=args.random, bias_list=args.bias_list,
        bias_nums=args.bias_nums, bias_desc=args.bias_desc, seed=args.seed,
        n_mels=cfg_t.n_mels, return_audio=mixed_mels,
    )
    data_train = PromptWhisperDataset(phase="train", **ds_kwargs)
    data_eval = PromptWhisperDataset(phase="dev", **ds_kwargs)
    for name, ds in (("train", data_train), ("dev", data_eval)):
        if len(ds) == 0:
            raise ValueError(f"{name} dataset is empty")
        print(f"{name} data length: {len(ds)}")

    shard_fn = eval_shard_fn = None
    mesh = auto_mesh(args.model_parallelism, batch_divisor=args.batch)
    if mesh is not None:
        print(f"mesh: data={mesh.shape['data']} x model={mesh.shape['model']}")
        params_t = shard_params(params_t, mesh)
        params_d = shard_params(params_d, mesh)
        shard_fn = lambda b: shard_batch(  # noqa: E731
            b, mesh, extra_leading_axes=1 if args.grad_accum > 1 else 0)
        eval_shard_fn = lambda b: shard_batch(b, mesh)  # noqa: E731

    dcfg = DistillConfig(
        output_dir=args.output,
        per_device_train_batch_size=args.batch,
        gradient_accumulation_steps=args.grad_accum,
        learning_rate=args.lr,
        num_train_epochs=args.epoch,
        warmup_steps=args.warmup_steps,
        temperature=args.temperature,
        hard_weight=args.hard_weight,
        eval_steps=args.eval_steps,
        save_steps=args.save_steps,
        logging_steps=args.logging_steps,
        eval_batches=args.eval_batches,
        seed=args.seed,
        checkpoint_backend=args.checkpoint_backend,
    )
    if mixed_mels:
        # the fused mel Pallas kernel needs a TPU; interpret mode keeps the
        # raw-audio path runnable on CPU hosts (tests, smoke runs)
        from whisper_context_biasing_tpu.parallel.mesh import (
            effective_platform_devices,
        )

        dcfg.mel_interpret = (
            effective_platform_devices()[0].platform == "cpu")
    print("Starting distillation...")
    params_d, log_history = distill_and_evaluate(
        cfg_d, params_d, cfg_t, params_t, data_train, data_eval, collator,
        dcfg, shard_fn=shard_fn, eval_shard_fn=eval_shard_fn, mesh=mesh)

    summary = next((h for h in reversed(log_history)
                    if "best_agreement" in h), {})
    print(f"Distillation done: best dev agreement "
          f"{summary.get('best_agreement', float('nan')):.4f} at step "
          f"{summary.get('best_step', -1)}")
    with open(os.path.join(args.output, "distill_results.json"), "w") as f:
        json.dump(summary, f, indent=2)

    # HF-loadable export of the final draft alongside the native checkpoints,
    # mirroring scripts/train.py's hub export path
    try:
        from whisper_context_biasing_tpu.models import save_safetensors

        save_safetensors(params_d, cfg_d, args.output)
        print(f"safetensors export: {args.output}/model.safetensors")
    except Exception as e:  # noqa: BLE001 — export is best-effort
        print(f"HF export skipped: {e}")


if __name__ == "__main__":
    main()
