#!/usr/bin/env python
"""Evaluate a trained Whisper medical context-biasing model.

CLI surface preserved from the reference ``scripts/evaluation.py:21-37``.
Two modes, as in the reference: ``--final_model`` (a checkpoint path via
--model_path, standing in for the hub id in this offline environment) and
``--best_checkpoint`` (lowest recorded eval_wer under --output,
scripts/evaluation.py:75-94). The eval dataset is built WITHOUT the bias-list
args, matching the reference quirk (eval prompting is desc-only or none,
scripts/evaluation.py:133-142).

Fixed deviation (documented): the reference's ``save_refs_and_preds`` writes
"ref: … | pred: …" lines that its own B-WER parser cannot read (it expects
"Ref :/Pred:"), which breaks --only_eval_bias_wer; we always write the
canonical artifact format.
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
    evaluate_wer,
    find_best_checkpoint,
    load_checkpoint,
)

DEFAULT_DATA_DIR = "data/medical-united-syn-med-test"
DEFAULT_JSONL = "data/medical-united-syn-med-test-jsonl"


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate Whisper medical model with context biasing")
    p.add_argument("--output", type=str, default="results")
    p.add_argument("--bias_weight", type=float, default=1.5)
    p.add_argument("--data_root", type=str, default="")
    p.add_argument("--data_dir", type=str, default=DEFAULT_DATA_DIR)
    p.add_argument("--jsonl_data", type=str, default=DEFAULT_JSONL)
    p.add_argument("--prompt", action="store_true")
    p.add_argument("--random", action="store_true")
    p.add_argument("--only_eval_bias_wer", action="store_true")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hub_model_id", type=str, default=None,
                   help="kept for API parity; use --model_path offline")
    p.add_argument("--refs_pred_file", type=str, default=None)
    p.add_argument("--final_model", action="store_true", default=False)
    p.add_argument("--best_checkpoint", action="store_true", default=False)
    p.add_argument("--hf_token", type=str, default=None)
    # TPU-native additions
    p.add_argument("--model", type=str, default="base.en")
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint dir (native) or model.safetensors (HF)")
    p.add_argument("--vocab", type=str, default=None)
    p.add_argument("--merges", type=str, default=None)
    p.add_argument("--prompt_generation", action="store_true")
    p.add_argument("--bias_boost", type=float, default=0.0)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--medusa", type=str, default=None,
                   help="medusa.npz (scripts/medusa.py): self-speculative "
                        "greedy eval decode — identical tokens/WER, faster "
                        "real-weight sweeps; ignored with --num_beams > 1")
    p.add_argument("--medusa_chains", type=int, default=None,
                   help="branch on head-1's top-S candidates per round "
                        "(tree-attention chain mode; default: the value "
                        "saved in medusa.npz, else 1)")
    p.add_argument("--model_parallelism", type=int, default=1,
                   help="tensor-parallel degree over a (data, model) mesh "
                        "(decode batches sharded over 'data', weights over "
                        "'model'); 1 (default) = pure data parallel over "
                        "all visible same-platform devices, 0 = single "
                        "device")
    return p.parse_args()


def load_model(args, model_cfg, path):
    from whisper_context_biasing_tpu.utils import warn_missing_assets
    warn_missing_assets(args.vocab, path, "evaluation")
    from whisper_context_biasing_tpu.train.checkpoint import is_native_checkpoint
    if is_native_checkpoint(path):
        params, _, _ = load_checkpoint(path)
        return params, model_cfg
    if path:
        return load_safetensors(path, model_cfg)
    return init_params(model_cfg, 0), model_cfg


def run_eval(args, params, model_cfg, tokenizer, data_test, collator, bias_spans, model_name):
    refs_pred_file = args.refs_pred_file or os.path.join(args.output, "refs_and_pred.txt")
    # Auto-mesh: pure dp over all same-platform devices by default,
    # dp × tp when --model_parallelism > 1, single-device with 0.
    from whisper_context_biasing_tpu.parallel import auto_mesh, shard_params

    mesh = auto_mesh(args.model_parallelism)
    if mesh is not None:
        print(f"mesh: data={mesh.shape['data']} x model={mesh.shape['model']}")
        params = shard_params(params, mesh)
    medusa = None
    if args.medusa:
        from whisper_context_biasing_tpu.models import load_medusa

        medusa = load_medusa(args.medusa, n_chains=args.medusa_chains)
    result = evaluate_wer(
        params, model_cfg, tokenizer, data_test, collator, args.batch, 224,
        refs_pred_file=refs_pred_file,
        prompt_generation=args.prompt_generation, bias_boost=args.bias_boost,
        num_beams=args.num_beams, mesh=mesh, medusa=medusa,
    )
    if not args.only_eval_bias_wer:
        print(f"{model_name} Test set evaluation results:", result)
        with open(os.path.join(args.output, f"{model_name}_test_results.json"), "w") as f:
            json.dump(result, f, indent=4)

    bias_result = compute_bias_wer(refs_pred_file, bias_spans, tokenizer)
    print(f"{model_name} Bias WER result:", bias_result)
    with open(os.path.join(args.output, f"{model_name}_bias_wer_results.json"), "w") as f:
        json.dump(bias_result, f, indent=4)


def locate_best_checkpoint(output: str, hub_model_id: str | None,
                           hf_token: str | None) -> str | None:
    """--best_checkpoint resolution with the reference's flag semantics
    (/root/reference/scripts/evaluation.py:154-155,213): when a hub repo is
    named, download the WHOLE repo into ``output`` first, then scan
    trainer_state histories for the lowest eval_wer. Gated + offline-safe:
    when the sync no-ops (no network / no huggingface_hub) the scan sees
    whatever already sits under ``output`` — the local-only behavior."""
    if hub_model_id:
        from whisper_context_biasing_tpu.utils import hub

        print(f"Syncing {hub_model_id} into {output} ...")
        hub.sync_from_hub(hub_model_id, output, hf_token)
    return find_best_checkpoint(output)


def main():
    args = parse_args()
    tokenizer = load_tokenizer(args.vocab, args.merges,
                               multilingual=not args.model.endswith(".en"))
    model_cfg = get_config(args.model)
    collator = SpeechSeq2SeqCollator(
        pad_token_id=tokenizer.pad_token_id,
        decoder_start_token_id=tokenizer.sot,
        decoder_prev_token_id=tokenizer.sop,
        pad_to_multiple=32,
        # match the decode/loss span_pad_id (eot); see scripts/train.py
        bias_span_pad_id=tokenizer.eot,
    )

    test_jsonl = os.path.join(args.jsonl_data, "test.jsonl")
    if not os.path.isfile(test_jsonl):
        raise FileNotFoundError(f"Test JSONL file not found: {test_jsonl}")

    # NOTE: no bias_list/bias_nums/bias_desc — reference eval quirk replicated
    data_test = PromptWhisperDataset(
        base_path=os.path.join(args.data_root, args.data_dir),
        jsonl_data=args.jsonl_data, phase="test", tokenizer=tokenizer,
        prompt=args.prompt, random=args.random,
        n_mels=model_cfg.n_mels,  # 128 for large-v3
    )
    if len(data_test) == 0:
        raise ValueError("Test dataset is empty")
    print(f"Test data length: {len(data_test)}")
    bias_spans = data_test.all_bias_spans()

    os.makedirs(args.output, exist_ok=True)
    if not args.final_model and not args.best_checkpoint:
        print("choose a mode: --final_model or --best_checkpoint")
        return

    if args.final_model:
        params, model_cfg2 = load_model(args, model_cfg, args.model_path)
        run_eval(args, params, model_cfg2, tokenizer, data_test, collator,
                 bias_spans, "refs_and_pred")

    if args.best_checkpoint:
        best = locate_best_checkpoint(args.output, args.hub_model_id,
                                      args.hf_token)
        if not best:
            print("No valid checkpoint found in output dir for evaluation.")
            return
        print(f"Loading best checkpoint from: {best}")
        params, _, _ = load_checkpoint(best)
        run_eval(args, params, model_cfg, tokenizer, data_test, collator,
                 bias_spans, "refs_and_pred")


if __name__ == "__main__":
    main()
