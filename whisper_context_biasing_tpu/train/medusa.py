"""Medusa head training: fit the multi-token prediction heads.

The heads (models/medusa.py) are trained teacher-forced on the corpus: the
FROZEN base model provides decoder hidden states, and head j learns to
predict the token ``j`` positions past the base model's own next-token
target — i.e. ``labels[t+j]`` from the hidden at position ``t``. Only the
K·d² head parameters train (the base rides along stop-gradded like the
distillation teacher, train/distill.py), so optimizer memory is
negligible and one pass over the fine-tuning corpus suffices.

The metric that matters is per-head top-1 accuracy on dev — head j's
accuracy is the probability its proposal survives verification at depth j,
so the expected accepted run per round is ``1 + sum_j prod_{i<=j} acc_i``
(the decode-speed predictor for decode/medusa.py)."""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.prefetch import BatchLoader, prefetch_to_device
from ..models.config import WhisperConfig
from ..models.medusa import medusa_logits, save_medusa
from ..models.whisper import forward_hidden
from ..utils.logging import RunLogger
from .optim import make_optimizer
from .step import TrainState, init_train_state

IGNORE = -100


def make_medusa_loss_fn(cfg: WhisperConfig, n_heads: int):
    """``loss_fn(medusa, base_params, batch) -> (loss, aux)`` with aux
    ``{"head_acc": (K,) f32}`` — masked CE + accuracy per head."""

    def loss_fn(medusa, base_params, batch):
        base = jax.lax.stop_gradient(base_params)
        _, hid = forward_hidden(base, cfg, batch["input_features"],
                                batch["decoder_input_ids"])
        hid = jax.lax.stop_gradient(hid)
        labels = batch["labels"]           # (B, S): target for input pos t
        lg = medusa_logits(base, medusa, hid)  # (K, B, S, V)
        s = labels.shape[1]
        total = jnp.float32(0)
        accs = []
        for j in range(1, n_heads + 1):
            lgj = lg[j - 1][:, : s - j]            # hidden t predicts...
            tgt = labels[:, j:]                    # ...labels[t+j]
            valid = tgt != IGNORE
            nvalid = jnp.sum(valid).astype(jnp.float32) + 1e-8
            safe = jnp.where(valid, tgt, 0)
            lp = jax.nn.log_softmax(lgj.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
            total = total + jnp.sum(nll * valid) / nvalid
            acc = jnp.sum((jnp.argmax(lgj, -1) == safe) & valid) / nvalid
            accs.append(acc)
        return total / n_heads, {"head_acc": jnp.stack(accs)}

    return loss_fn


def make_medusa_train_step(cfg: WhisperConfig, optimizer, n_heads: int,
                           donate: bool = True):
    """``step(state, base_params, batch) -> (state, metrics)``;
    ``state.params`` is the head tree, the base is frozen."""
    loss_fn = make_medusa_loss_fn(cfg, n_heads)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, base_params, batch):
        (loss, aux), grads = grad_fn(state.params, base_params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        medusa = optax.apply_updates(state.params, updates)
        return TrainState(medusa, opt_state, state.step + 1), {
            "loss": loss, "grad_norm": optax.global_norm(grads), **aux,
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def expected_tokens_per_round(head_acc: np.ndarray) -> float:
    """1 + sum_j prod_{i<=j} acc_i — the decode-speed predictor (each round
    always advances the verified correction plus the accepted run)."""
    run = 1.0
    total = 1.0
    for a in np.asarray(head_acc, np.float64):
        run *= float(a)
        total += run
    return total


@dataclass
class MedusaConfig:
    output_dir: str
    n_heads: int = 4
    per_device_train_batch_size: int = 8
    learning_rate: float = 1e-3
    num_train_epochs: float = 2
    warmup_steps: int = 50
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    eval_steps: int = 200
    logging_steps: int = 50
    eval_batches: int = 16
    seed: int = 42
    n_chains: int = 1       # stamped into medusa.npz: decode-time chain
                            # branching width (decode/medusa.py n_chains)


def train_medusa_heads(
    cfg: WhisperConfig,
    base_params,
    medusa,
    data_train,
    data_eval,
    collator,
    mcfg: MedusaConfig,
):
    """Trains the head tree; returns ``(medusa, log_history)`` and writes
    ``medusa.npz`` + ``medusa_results.json`` into ``output_dir``."""
    steps_per_epoch = max(
        1, len(data_train) // mcfg.per_device_train_batch_size)
    total_steps = int(steps_per_epoch * mcfg.num_train_epochs)
    optimizer = make_optimizer(
        peak_lr=mcfg.learning_rate, total_steps=total_steps,
        warmup_steps=mcfg.warmup_steps, weight_decay=mcfg.weight_decay,
        max_grad_norm=mcfg.max_grad_norm)
    state = init_train_state(medusa, optimizer)
    step_fn = make_medusa_train_step(cfg, optimizer, mcfg.n_heads)
    eval_loss = jax.jit(make_medusa_loss_fn(cfg, mcfg.n_heads))

    loader = BatchLoader(data_train, collator,
                         batch_size=mcfg.per_device_train_batch_size,
                         shuffle=True, seed=mcfg.seed, drop_last=True)

    def probe():
        ev = BatchLoader(data_eval, collator,
                         batch_size=mcfg.per_device_train_batch_size,
                         shuffle=False, drop_last=True)
        accs, n = 0.0, 0
        for i, batch in enumerate(ev):
            if i >= mcfg.eval_batches:
                break
            _, aux = eval_loss(state.params, base_params, batch)
            accs = accs + np.asarray(aux["head_acc"])
            n += 1
        return (accs / n) if n else np.zeros(mcfg.n_heads)

    os.makedirs(mcfg.output_dir, exist_ok=True)
    logger = RunLogger(mcfg.output_dir, filename="medusa_log.jsonl")
    log_history: list[dict] = []
    gstep = 0
    last_probe_step = -1
    acc = np.zeros(mcfg.n_heads)
    t0 = time.time()
    for _ in range(int(np.ceil(mcfg.num_train_epochs))):
        if gstep >= total_steps:
            break
        for batch in prefetch_to_device(iter(loader)):
            if gstep >= total_steps:
                break
            state, m = step_fn(state, base_params, batch)
            gstep += 1
            if gstep % mcfg.logging_steps == 0 or gstep == total_steps:
                row = {"step": gstep, "loss": float(m["loss"]),
                       "head_acc": [round(float(a), 4)
                                    for a in np.asarray(m["head_acc"])],
                       "wall_s": round(time.time() - t0, 1)}
                log_history.append(row)
                logger.log(row)
            if gstep % mcfg.eval_steps == 0 or gstep == total_steps:
                acc = probe()
                last_probe_step = gstep
                row = {"step": gstep,
                       "eval_head_acc": [round(float(a), 4) for a in acc],
                       "eval_tokens_per_round":
                           round(expected_tokens_per_round(acc), 3)}
                log_history.append(row)
                logger.log(row)

    if last_probe_step != gstep:  # normal exits probe at total_steps already
        acc = probe()
    summary = {"n_heads": mcfg.n_heads, "total_steps": gstep,
               "eval_head_acc": [round(float(a), 4) for a in acc],
               "eval_tokens_per_round":
                   round(expected_tokens_per_round(acc), 3)}
    to_save = dict(state.params)
    if mcfg.n_chains > 1:
        to_save["n_chains"] = mcfg.n_chains
    save_medusa(os.path.join(mcfg.output_dir, "medusa.npz"), to_save)
    with open(os.path.join(mcfg.output_dir, "medusa_results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log_history.append(summary)
    logger.log(summary)
    return state.params, log_history
