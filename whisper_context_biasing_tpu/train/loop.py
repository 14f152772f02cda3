"""Training loop — the native replacement for HF ``Seq2SeqTrainer`` as the
reference drives it (scripts/train.py:225-273):

  * effective batch = per-step batch × grad accumulation (8×4)
  * AdamW + cosine w/ warmup, weight decay, grad clipping
  * eval every ``eval_steps`` optimizer steps: batched greedy decode
    (KV cache — fixing the reference's use_cache=False recompute) scored by
    the compute_wer flow, refs_and_pred.txt artifact written
  * checkpoint every ``save_steps`` with accumulated log_history; retention
    keep-1 + best (load_best_model_at_end on lowest eval_wer)
  * early stopping patience on eval_wer
  * resume from the newest local checkpoint

Generation during eval is UNPROMPTED (prefix = <|startoftranscript|> only),
matching the reference pipeline: HF Seq2SeqTrainer drops the collator's
decoder_input_ids when they shape-match labels, so its generate() never sees
the context prefix — conditioning acts through training only. Prompted
generation is available via ``prompt_generation=True`` (a new capability).
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..data.collator import SpeechSeq2SeqCollator
from ..data.prefetch import BatchLoader, prefetch_to_device
from ..decode.beam import beam_decode
from ..decode.bias_processor import sanitize_bias_spans
from ..decode.greedy import greedy_decode, pack_prefixes
from ..metrics.evaluate import score_predictions
from ..models.config import WhisperConfig
from ..utils.logging import RunLogger
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .optim import make_optimizer
from .step import TrainState, init_train_state, make_train_step


@dataclass
class TrainingConfig:
    output_dir: str
    per_device_train_batch_size: int = 8
    per_device_eval_batch_size: int = 2
    gradient_accumulation_steps: int = 4
    learning_rate: float = 1e-5
    num_train_epochs: float = 5
    warmup_steps: int = 50
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    eval_steps: int = 135
    save_steps: int = 135
    logging_steps: int = 50
    save_total_limit: int = 1
    checkpoint_backend: str = "npz"  # "orbax": tensorstore arrays, sharded
                                     # saves without a host gather
    early_stopping_patience: int = 3
    generation_max_length: int = 225
    bias_weight: float = 1.5
    freeze_encoder: bool = False
    seed: int = 42
    label_pad_multiple: int = 32
    prompt_generation: bool = False
    bias_boost: float = 0.0
    load_best_model_at_end: bool = True
    dataloader_num_workers: int = 4
    mel_on_device: bool = False  # dataset must be built with return_audio=True
    spec_augment: bool = False   # in-graph mel masking (train/augment.py);
                                 # train-time only, reference has none
    lora_rank: int = 0           # >0: train rank-r LoRA adapters instead of
                                 # full weights (train/lora.py); checkpoints
                                 # hold the adapter tree, eval/returns are
                                 # merged dense weights
    lora_alpha: float = 16.0
    use_wandb: bool = False
    wandb_project: str | None = None
    # resume fallback: when no local checkpoint exists, pull a repo snapshot
    # from the Hub first (reference scripts/train.py:169-189); offline the
    # sync degrades to a no-op with a warning (utils/hub.py)
    hub_model_id: str | None = None
    hub_token: str | None = None
    # per-save off-site backup: push every checkpoint-N dir to the Hub as it
    # is written, the reference's PushToHubOnSaveCallback +
    # push_to_hub="every_save" (scripts/train.py:83-85, :252-255). Fires only
    # when hub_model_id is set; offline each push degrades to a warning
    hub_push_on_save: bool = True


def evaluate_wer(
    params,
    model_cfg: WhisperConfig,
    tokenizer,
    dataset,
    collator: SpeechSeq2SeqCollator,
    batch_size: int,
    max_new: int,
    refs_pred_file: str | None = None,
    prompt_generation: bool = False,
    bias_boost: float = 0.0,
    num_beams: int = 1,
    num_workers: int = 4,
    mesh=None,
    medusa: dict | None = None,  # Medusa heads: accelerated greedy eval
) -> dict:
    """Batched greedy (or beam, num_beams>1) decode over a dataset +
    compute_wer scoring.

    Static-shape discipline: item prep runs on BatchLoader threads, the
    final partial batch is padded up to ``batch_size`` (rows stripped after
    decode), prefix lengths are bucketed to multiples of 32, and bias-span
    dims to multiples of 4 — so one eval pass reuses a handful of compiled
    decode programs instead of recompiling per batch shape.

    ``mesh``: shards each decode batch over the mesh's "data" axis (params
    should already be sharded with ``parallel.shard_params``)."""
    import copy

    # shallow-copy the collator: mid-training evals run while the training
    # BatchLoader threads still collate with the shared instance — mutating
    # span_pad_multiple on it would change train batch shapes mid-flight
    collator = copy.copy(collator)

    all_preds: list[list[int]] = []
    all_labels: list[list[int]] = []

    def collate(items):
        batch = collator(items)
        if prompt_generation:
            prefixes = []
            for item in items:
                seq = np.asarray(item["labels"]).tolist()
                sot_at = seq.index(tokenizer.sot) if tokenizer.sot in seq else 0
                prefixes.append(seq[: sot_at + 1])  # context + sot
        else:
            prefixes = [[tokenizer.sot]] * len(items)
        batch["_prefixes"] = prefixes
        return batch

    if collator.max_spans is None and collator.span_pad_multiple is None:
        collator.span_pad_multiple = 4
    if num_beams > 1:
        decode_fn = beam_decode
    elif medusa is not None:
        from ..decode.medusa import medusa_greedy_decode as decode_fn
    else:
        decode_fn = greedy_decode
    # public signature-count diagnostic (utils.compile_count.CountedJit)
    programs_before = decode_fn.cache_size()
    loader = BatchLoader(dataset, collate, batch_size, num_workers=num_workers)
    for batch in loader:
        _eval_decode_batch(
            batch, all_preds, all_labels, params, model_cfg, tokenizer,
            collator, batch_size, max_new, bias_boost, num_beams, mesh,
            medusa,
        )
    result = score_predictions(all_preds, all_labels, tokenizer, refs_pred_file)
    # static-shape discipline diagnostic: one eval pass should compile
    # only a handful of decode programs (prefix-length buckets). Logged,
    # not returned — the result dict is the reference's test_results.json
    # artifact and must stay format-compatible.
    new_programs = decode_fn.cache_size() - programs_before
    if new_programs:
        print(f"evaluate_wer: compiled {new_programs} decode program(s)")
    return result


def _pad_rows(a: np.ndarray, b_full: int) -> np.ndarray:
    """Repeat the first row to reach the static batch size."""
    if a.shape[0] == b_full:
        return a
    reps = np.repeat(a[:1], b_full - a.shape[0], axis=0)
    return np.concatenate([a, reps], axis=0)


def _eval_decode_batch(
    batch, all_preds, all_labels, params, model_cfg, tokenizer, collator,
    batch_size, max_new, bias_boost, num_beams, mesh=None, medusa=None,
):
    prefixes = batch.pop("_prefixes")
    b = len(prefixes)
    ids, mask = pack_prefixes(prefixes, tokenizer.eot, pad_to_multiple=32)
    feats = np.asarray(batch["input_features"])
    if b < batch_size:  # pad the trailing partial batch to the static shape
        feats = _pad_rows(feats, batch_size)
        ids = _pad_rows(ids, batch_size)
        mask = _pad_rows(mask, batch_size)
    spans = None
    if bias_boost and "bias_spans" in batch:
        # drop the collator's all-empty (B,1,1) zeros fallback — it is
        # NOT a real length-1 span of token id 0
        spans = sanitize_bias_spans(batch["bias_spans"])
        if spans is not None:
            spans = jnp.asarray(_pad_rows(np.asarray(spans), batch_size))
    if mesh is not None:
        from ..parallel import shard_decode_inputs

        (feats, ids, mask, spans), _ = shard_decode_inputs(
            mesh, np.asarray(feats), np.asarray(ids), np.asarray(mask),
            None if spans is None else np.asarray(spans))
    if num_beams > 1:
        bres = beam_decode(
            params, model_cfg, jnp.asarray(feats),
            jnp.asarray(ids), jnp.asarray(mask),
            num_beams=num_beams, max_new=max_new, eot_id=tokenizer.eot,
            bias_spans=spans, bias_boost=bias_boost,
            span_pad_id=collator.bias_span_pad_id,
        )
        toks = np.asarray(bres.best)
        lens = np.asarray(
            np.cumprod(toks != tokenizer.eot, axis=1).sum(axis=1)
        )
    elif medusa is not None:
        # self-speculative eval decode: identical tokens, fewer weight reads
        # per emitted token — real-weight WER sweeps finish faster
        from ..decode.medusa import medusa_greedy_decode
        from ..models.medusa import split_medusa

        heads, n_chains = split_medusa(medusa)
        res = medusa_greedy_decode(
            params, model_cfg, heads, jnp.asarray(feats),
            jnp.asarray(ids), jnp.asarray(mask),
            max_new=max_new, eot_id=tokenizer.eot, n_chains=n_chains,
            bias_spans=spans, bias_boost=bias_boost,
            span_pad_id=collator.bias_span_pad_id,
        )
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
    else:
        res = greedy_decode(
            params, model_cfg, jnp.asarray(feats),
            jnp.asarray(ids), jnp.asarray(mask),
            max_new=max_new, eot_id=tokenizer.eot,
            bias_spans=spans, bias_boost=bias_boost,
            span_pad_id=collator.bias_span_pad_id,
        )
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
    for i in range(b):
        all_preds.append(toks[i, : lens[i]].tolist())
        all_labels.append(batch["labels"][i].tolist())


def train_and_evaluate(
    model_cfg: WhisperConfig,
    params,
    tokenizer,
    data_train,
    data_eval,
    collator: SpeechSeq2SeqCollator,
    tcfg: TrainingConfig,
    resume: bool = False,
    shard_fn=None,  # optional: fn(batch_pytree) -> device-sharded batch
    logger: RunLogger | None = None,
    mesh=None,      # optional: shards eval decode batches over "data"
):
    """Runs the full fine-tune. Returns (params, log_history)."""
    os.makedirs(tcfg.output_dir, exist_ok=True)
    if logger is None:
        logger = RunLogger(tcfg.output_dir, use_wandb=tcfg.use_wandb,
                           wandb_project=tcfg.wandb_project)
    accum = tcfg.gradient_accumulation_steps
    chunk = tcfg.per_device_train_batch_size * accum
    steps_per_epoch = max(1, len(data_train) // chunk)
    total_steps = int(steps_per_epoch * tcfg.num_train_epochs)

    optimizer = make_optimizer(
        peak_lr=tcfg.learning_rate, warmup_steps=tcfg.warmup_steps,
        total_steps=total_steps, weight_decay=tcfg.weight_decay,
        max_grad_norm=tcfg.max_grad_norm,
    )
    sa_cfg = None
    if tcfg.spec_augment:
        from .augment import SpecAugmentConfig

        sa_cfg = SpecAugmentConfig()
    merge = None
    if tcfg.lora_rank > 0:
        from .lora import (
            init_lora_params,
            lora_param_count,
            make_lora_train_step,
            merge_lora,
        )

        if tcfg.mel_on_device:
            raise ValueError("lora_rank with mel_on_device is not supported")
        base_params = params
        # freeze_encoder's LoRA analog: adapt the decoder blocks only
        params = init_lora_params(
            base_params, tcfg.lora_rank, jax.random.PRNGKey(tcfg.seed),
            include_encoder=not tcfg.freeze_encoder)
        lora_step = make_lora_train_step(
            model_cfg, optimizer, alpha=tcfg.lora_alpha,
            bias_weight=tcfg.bias_weight, grad_accum=accum,
            spec_augment=sa_cfg, augment_seed=tcfg.seed)
        step_fn = lambda st, b: lora_step(st, base_params, b)  # noqa: E731
        merge = lambda l: merge_lora(base_params, l, tcfg.lora_alpha)  # noqa: E731
        print(f"LoRA rank {tcfg.lora_rank}: "
              f"{lora_param_count(params):,} trainable adapter params")
    else:
        step_fn = make_train_step(
            model_cfg, optimizer, bias_weight=tcfg.bias_weight,
            grad_accum=accum, freeze_encoder=tcfg.freeze_encoder,
            mel_on_device=tcfg.mel_on_device,
            spec_augment=sa_cfg, augment_seed=tcfg.seed,
        )

    log_history: list[dict] = []
    start_step = 0
    resumed_opt_state = None
    if resume:
        ckpt = latest_checkpoint(tcfg.output_dir)
        if ckpt is None and tcfg.hub_model_id:
            # no local checkpoint: fall back to a Hub snapshot (reference
            # scripts/train.py:169-189), gated like every other hub call
            from ..utils import hub

            print(f"no local checkpoint; trying hub snapshot "
                  f"{tcfg.hub_model_id}")
            if hub.sync_from_hub(tcfg.hub_model_id, tcfg.output_dir,
                                 tcfg.hub_token):
                ckpt = latest_checkpoint(tcfg.output_dir)
        if ckpt:
            # restore optimizer moments + schedule count too: re-initializing
            # them would silently re-warm the LR and zero the Adam moments
            opt_template = optimizer.init(params)
            params, resumed_opt_state, meta = load_checkpoint(
                ckpt, opt_state_template=opt_template
            )
            start_step = meta.get("step", 0)
            log_history = meta.get("log_history", [])
            print(f"resumed from {ckpt} at step {start_step} "
                  f"(opt_state {'restored' if resumed_opt_state is not None else 'reset'})")

    state = init_train_state(params, optimizer)
    if resumed_opt_state is not None:
        state = TrainState(state.params, resumed_opt_state, state.step)
    if start_step:
        state = TrainState(state.params, state.opt_state, jnp.int32(start_step))

    best_wer = min((e["eval_wer"] for e in log_history if "eval_wer" in e), default=float("inf"))
    # latest eval (value + the step whose params produced it) at (re)start;
    # updated in the eval branch thereafter
    last_wer, last_eval_step = next(
        ((e["eval_wer"], e["step"]) for e in reversed(log_history)
         if "eval_wer" in e), (None, None))
    bad_evals = 0
    step = start_step
    t0 = time.time()
    loss_window: list[float] = []
    stop = False
    save_thread: threading.Thread | None = None

    def prep(items):
        batch = collator(items)
        if "bias_spans" in batch and sanitize_bias_spans(batch["bias_spans"]) is None:
            # all-empty fallback: replace with an all-pad span (span_len 0,
            # weights stay 1.0) instead of the zeros quirk the loss would
            # read as a real span of token id 0
            batch["bias_spans"] = np.full_like(
                np.asarray(batch["bias_spans"]), collator.bias_span_pad_id)
        if accum > 1:
            batch = {
                k: v.reshape((accum, tcfg.per_device_train_batch_size) + v.shape[1:])
                for k, v in batch.items()
            }
        return batch

    # threaded item prep (audio decode + mel + tokenize) + double-buffered
    # device transfer: the TPU never waits on host-side batch building
    loader = BatchLoader(
        data_train, prep, chunk, shuffle=True, seed=tcfg.seed, drop_last=True,
        num_workers=tcfg.dataloader_num_workers,
    )
    # resumable data order: continue with the epoch permutation the run
    # would have had, skipping the already-trained batches of the partial
    # epoch (BatchLoader.resume docstring)
    loader.resume(start_step // steps_per_epoch, start_step % steps_per_epoch)

    for epoch in range(int(np.ceil(tcfg.num_train_epochs))):
        if stop or step >= total_steps:
            break
        for batch in prefetch_to_device(loader, size=2, put_fn=shard_fn):
            if stop or step >= total_steps:
                break
            state, metrics = step_fn(state, batch)
            step += 1
            loss_window.append(float(metrics["loss"]))

            if step % tcfg.logging_steps == 0:
                entry = {
                    "step": step, "epoch": round(step / steps_per_epoch, 3),
                    "loss": float(np.mean(loss_window)),
                    "grad_norm": float(metrics["grad_norm"]),
                    "elapsed_s": round(time.time() - t0, 1),
                }
                loss_window.clear()
                log_history.append(entry)
                logger.log(entry)

            if step % tcfg.eval_steps == 0:
                last_wer = evaluate_wer(
                    merge(state.params) if merge else state.params,
                    model_cfg, tokenizer, data_eval, collator,
                    tcfg.per_device_eval_batch_size,
                    tcfg.generation_max_length - 1,
                    refs_pred_file=os.path.join(tcfg.output_dir, "refs_and_pred.txt"),
                    prompt_generation=tcfg.prompt_generation,
                    bias_boost=tcfg.bias_boost, mesh=mesh,
                )["wer"]
                entry = {"step": step, "eval_wer": last_wer}
                last_eval_step = step
                log_history.append(entry)
                logger.log(entry)
                if last_wer < best_wer:
                    best_wer, bad_evals = last_wer, 0
                else:
                    bad_evals += 1
                if bad_evals >= tcfg.early_stopping_patience:
                    print(f"early stopping at step {step} (patience "
                          f"{tcfg.early_stopping_patience} on eval_wer)")
                    stop = True

            # saving is independent of evaluation (save_steps need not be a
            # multiple of eval_steps); the metadata carries the latest wer
            # plus the step it was measured at, so find_best_checkpoint can
            # attribute the metric only to the params that achieved it.
            # The write runs on a background thread (params are fetched to
            # host first) so the step loop never blocks on disk.
            if step % tcfg.save_steps == 0 or stop:
                meta = {"log_history": list(log_history)}
                if merge is not None:
                    meta["lora_rank"] = tcfg.lora_rank
                    meta["lora_alpha"] = tcfg.lora_alpha
                if last_wer is not None:
                    meta["eval_wer"] = last_wer
                    meta["eval_step"] = last_eval_step
                if save_thread is not None:
                    save_thread.join()

                def _push(step=step):
                    # reference PushToHubOnSaveCallback parity: every save
                    # pushes the OUTPUT DIR to the Hub as off-site backup
                    # (scripts/train.py:83-85, :252-255) — the folder upload
                    # preserves the checkpoint-N/ layout, so a later
                    # sync_from_hub restores dirs find_best_checkpoint can
                    # scan. Gated + offline-safe (utils/hub.py)
                    if tcfg.hub_push_on_save and tcfg.hub_model_id:
                        from ..utils import hub

                        hub.push_to_hub_if_exists(
                            tcfg.output_dir, tcfg.hub_model_id,
                            tcfg.hub_token)

                if tcfg.checkpoint_backend == "orbax":
                    # orbax copies device shards itself (no host gather —
                    # each device writes its own shards via tensorstore);
                    # runs on the step thread because the params are
                    # donated to the next step_fn call
                    save_checkpoint(tcfg.output_dir, step, state.params,
                                    opt_state=state.opt_state, metadata=meta,
                                    keep=tcfg.save_total_limit,
                                    backend="orbax")
                    _push()
                else:
                    host_params = jax.tree.map(np.asarray, state.params)
                    host_opt = jax.tree.map(np.asarray, state.opt_state)

                    def _save_and_push(step=step, params=host_params,
                                       opt=host_opt, meta=meta):
                        save_checkpoint(tcfg.output_dir, step, params,
                                        opt_state=opt, metadata=meta,
                                        keep=tcfg.save_total_limit)
                        _push(step)

                    save_thread = threading.Thread(target=_save_and_push)
                    save_thread.start()

    if save_thread is not None:
        save_thread.join()
    final_params = state.params
    if tcfg.load_best_model_at_end:
        from .checkpoint import find_best_checkpoint

        best = find_best_checkpoint(tcfg.output_dir)
        if best:
            final_params, _, _ = load_checkpoint(best)
            print(f"loaded best checkpoint: {best} (eval_wer {best_wer:.3f})")
    if merge is not None:
        # downstream consumers (test-set eval, safetensors export, serving)
        # get ordinary dense weights
        final_params = merge(final_params)
    return final_params, log_history
