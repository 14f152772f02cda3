#!/usr/bin/env python
"""Train Medusa multi-token heads for self-speculative serving.

No reference counterpart: this fits the K prediction heads that
``transcribe.py --medusa heads.npz`` / ``medusa_decode_batch`` consume
("Whisper in Medusa's Ear", models/medusa.py). Unlike scripts/distill.py
there is no second model — the heads (K·d² params) ride the serving
model's own hidden states, train in minutes, and the decoder's verification
guarantees output-exactness at ANY head quality, so this is the cheapest
path to speculative speedups.

    python scripts/medusa.py --model base.en --init_checkpoint ckpt/ \
        --data_root <root> --data_dir <audio> --jsonl_data <jsonl> \
        --medusa_heads 4 --output medusa_out/

Prints per-head dev accuracy and the expected accepted tokens per verify
round (the decode-speed predictor) every eval.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from whisper_context_biasing_tpu.utils import setup_jax
setup_jax()

from whisper_context_biasing_tpu.data import PromptWhisperDataset, SpeechSeq2SeqCollator
from whisper_context_biasing_tpu.models import (
    get_config,
    init_medusa_params,
    init_params,
    load_checkpoint_or_safetensors,
)
from whisper_context_biasing_tpu.tokenizer import load_tokenizer
from whisper_context_biasing_tpu.train import MedusaConfig, train_medusa_heads

DEFAULT_DATA_DIR = "data/medical-united-syn-med-test"
DEFAULT_JSONL = "data/medical-united-syn-med-test-jsonl"


def parse_args():
    p = argparse.ArgumentParser(description="Train Medusa heads")
    p.add_argument("--output", type=str, default="medusa_out")
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
    p.add_argument("--model", type=str, default="base.en")
    p.add_argument("--init_checkpoint", type=str, default=None,
                   help="serving model weights (safetensors / checkpoint-N)")
    p.add_argument("--medusa_heads", type=int, default=4)
    p.add_argument("--medusa_chains", type=int, default=1,
                   help="stamped into medusa.npz: decode-time branching on "
                        "head-1's top-S candidates (tree-attention chains)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epoch", type=float, default=2)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--eval_steps", type=int, default=200)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--eval_batches", type=int, default=16)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args()


def main():
    args = parse_args()
    print(f"Arguments: {vars(args)}")
    from whisper_context_biasing_tpu.utils import warn_missing_assets
    warn_missing_assets(args.vocab, args.init_checkpoint, "medusa")

    tokenizer = load_tokenizer(args.vocab, args.merges,
                               multilingual=not args.model.endswith(".en"))
    cfg = get_config(args.model)
    if args.init_checkpoint:
        params, cfg = load_checkpoint_or_safetensors(args.init_checkpoint, cfg)
    else:
        print("no --init_checkpoint: RANDOM base weights (smoke runs only)")
        params = init_params(cfg, args.seed)

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
        n_mels=cfg.n_mels,
    )
    data_train = PromptWhisperDataset(phase="train", **ds_kwargs)
    data_eval = PromptWhisperDataset(phase="dev", **ds_kwargs)
    for name, ds in (("train", data_train), ("dev", data_eval)):
        if len(ds) == 0:
            raise ValueError(f"{name} dataset is empty")
        print(f"{name} data length: {len(ds)}")

    medusa = init_medusa_params(cfg, args.medusa_heads, args.seed)
    mcfg = MedusaConfig(
        output_dir=args.output, n_heads=args.medusa_heads,
        n_chains=args.medusa_chains,
        per_device_train_batch_size=args.batch, learning_rate=args.lr,
        num_train_epochs=args.epoch, warmup_steps=args.warmup_steps,
        eval_steps=args.eval_steps, logging_steps=args.logging_steps,
        eval_batches=args.eval_batches, seed=args.seed)
    print("Training Medusa heads...")
    _, hist = train_medusa_heads(
        cfg, params, medusa, data_train, data_eval, collator, mcfg)
    summary = hist[-1]
    print(f"Done: dev head accuracy {summary['eval_head_acc']}, expected "
          f"{summary['eval_tokens_per_round']} tokens/verify-round "
          f"({args.output}/medusa.npz)")


if __name__ == "__main__":
    main()
