"""Draft-model distillation for speculative decoding.

The reference repo has no speculative decoding and therefore no draft
training; this module is part of the TPU-native serving stack around
``decode/speculative.py``. Speculative throughput scales with the
draft/target top-1 agreement rate (the acceptance rate: the expensive model
advances ``accepted+1`` tokens per weight read), so the distillation
objective here optimizes that quantity directly:

  loss = (1 - hard_weight) * T^2 * KL(teacher_T || student_T)
         + hard_weight * CE(student, labels)

where ``_T`` denotes temperature-``T`` softened distributions and the
teacher (the serving target model) is frozen under ``stop_gradient``. The
per-batch top-1 agreement between student and teacher argmax — the exact
quantity ``speculative_greedy_decode`` accepts on — is reported as a metric
every step and drives best-checkpoint selection.

TPU-first design notes:

  * ONE jitted step: teacher forward (no grad), student forward/backward,
    AdamW update. Both forwards are MXU matmul chains over the same static
    (B, S) token block; XLA fuses the softened-softmax elementwise tail into
    the final projections.
  * microbatch gradient accumulation by ``lax.scan`` exactly as in
    ``step.py`` — peak memory stays one microbatch of teacher+student logits.
  * mismatched mel frontends (e.g. an 80-mel ``base.en`` draft for a 128-mel
    ``large-v3`` target) are handled on-device: the batch carries raw audio
    (collator's raw-audio path) and BOTH fused Pallas log-mel variants run
    inside the step, so the host never computes a spectrogram twice.
  * the draft/target pair must share a token space (asserted): speculative
    verification compares token ids, so a vocab mismatch can never produce
    a usable draft.

Reference context: the reference trains with HF ``Seq2SeqTrainer``
(scripts/train.py:225-273); the loop here reuses this repo's native
optimizer/checkpoint machinery instead (train/optim.py, train/checkpoint.py).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.collator import IGNORE_INDEX
from ..data.prefetch import BatchLoader, prefetch_to_device
from ..models.config import WhisperConfig
from ..models.whisper import forward
from ..utils.logging import RunLogger
from .checkpoint import save_checkpoint
from .optim import make_optimizer
from .step import TrainState, init_train_state


def _features_for(cfg_draft: WhisperConfig, cfg_target: WhisperConfig,
                  batch, mel_interpret: bool):
    """Resolve (student_feats, teacher_feats) from a batch that carries
    either precomputed ``input_features`` (same n_mels for both models) or
    raw ``audio`` (fused on-device mel, one pass per distinct n_mels)."""
    if "audio" in batch:
        from ..ops.mel_kernel import log_mel_spectrogram_fused

        feats_t = log_mel_spectrogram_fused(
            batch["audio"], n_mels=cfg_target.n_mels, interpret=mel_interpret)
        if cfg_draft.n_mels == cfg_target.n_mels:
            feats_d = feats_t
        else:
            feats_d = log_mel_spectrogram_fused(
                batch["audio"], n_mels=cfg_draft.n_mels, interpret=mel_interpret)
        return feats_d, feats_t
    feats = batch["input_features"]
    feats_d = batch.get("input_features_draft", feats)
    return feats_d, feats


def make_distill_loss_fn(
    cfg_draft: WhisperConfig,
    cfg_target: WhisperConfig,
    temperature: float = 2.0,
    hard_weight: float = 0.5,
    mel_interpret: bool = False,
):
    """Returns ``loss_fn(params_draft, params_target, batch) -> (loss, aux)``
    with aux = {soft, hard, agreement} averaged over valid label positions."""
    if cfg_draft.n_vocab != cfg_target.n_vocab:
        raise ValueError(
            f"draft/target vocab mismatch ({cfg_draft.n_vocab} vs "
            f"{cfg_target.n_vocab}): speculative verification compares token "
            "ids, so the pair must share a tokenizer")
    temp = float(temperature)
    hw = float(hard_weight)

    def loss_fn(params_draft, params_target, batch):
        feats_d, feats_t = _features_for(cfg_draft, cfg_target, batch,
                                         mel_interpret)
        dec = batch["decoder_input_ids"]
        labels = batch["labels"]
        t_logits = jax.lax.stop_gradient(
            forward(params_target, cfg_target, feats_t, dec))
        s_logits = forward(params_draft, cfg_draft, feats_d, dec)

        valid = (labels != IGNORE_INDEX)
        nvalid = jnp.sum(valid).astype(jnp.float32) + 1e-8

        t32 = t_logits.astype(jnp.float32)
        s32 = s_logits.astype(jnp.float32)
        # softened KL(teacher || student), Hinton scaling by T^2 so gradient
        # magnitudes stay comparable across temperatures
        t_logp = jax.nn.log_softmax(t32 / temp, axis=-1)
        s_logp = jax.nn.log_softmax(s32 / temp, axis=-1)
        kl = jnp.sum(jnp.exp(t_logp) * (t_logp - s_logp), axis=-1)  # (B,S)
        soft = jnp.sum(kl * valid) / nvalid * (temp * temp)

        # hard CE against the ground-truth labels (keeps the student honest
        # where the teacher itself is wrong)
        safe = jnp.where(valid, labels, 0)
        logp1 = jax.nn.log_softmax(s32, axis=-1)
        nll = -jnp.take_along_axis(logp1, safe[..., None], axis=-1)[..., 0]
        hard = jnp.sum(nll * valid) / nvalid

        loss = (1.0 - hw) * soft + hw * hard
        agree = jnp.sum(
            (jnp.argmax(s32, -1) == jnp.argmax(t32, -1)) & valid) / nvalid
        return loss, {"soft": soft, "hard": hard, "agreement": agree}

    return loss_fn


def make_distill_step(
    cfg_draft: WhisperConfig,
    cfg_target: WhisperConfig,
    optimizer: optax.GradientTransformation,
    temperature: float = 2.0,
    hard_weight: float = 0.5,
    grad_accum: int = 1,
    donate: bool = True,
    mel_interpret: bool = False,
):
    """Returns ``step(state, params_target, batch) -> (state, metrics)``.

    ``state`` holds the student; the frozen teacher rides along as a plain
    argument (never donated, never updated). With ``grad_accum > 1`` every
    array in ``batch`` carries a leading microbatch axis as in
    ``make_train_step``.
    """
    loss_fn = make_distill_loss_fn(cfg_draft, cfg_target, temperature,
                                   hard_weight, mel_interpret)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def accum_grads(params, params_target, batch):
        def micro(carry, mb):
            acc, loss_sum, aux_sum = carry
            (loss, aux), g = grad_fn(params, params_target, mb)
            return (jax.tree.map(jnp.add, acc, g), loss_sum + loss,
                    jax.tree.map(jnp.add, aux_sum, aux)), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        aux0 = {"soft": jnp.float32(0), "hard": jnp.float32(0),
                "agreement": jnp.float32(0)}
        (g, loss_sum, aux_sum), _ = jax.lax.scan(
            micro, (zeros, jnp.float32(0), aux0), batch)
        scale = 1.0 / grad_accum
        return (loss_sum * scale,
                jax.tree.map(lambda a: a * scale, aux_sum),
                jax.tree.map(lambda a: a * scale, g))

    def step(state: TrainState, params_target, batch):
        if grad_accum > 1:
            loss, aux, grads = accum_grads(state.params, params_target, batch)
        else:
            (loss, aux), grads = grad_fn(state.params, params_target, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss, "grad_norm": gnorm, **aux,
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_agreement_step(
    cfg_draft: WhisperConfig,
    cfg_target: WhisperConfig,
    temperature: float = 2.0,
    hard_weight: float = 0.5,
    mel_interpret: bool = False,
):
    """Jitted forward-only evaluation: returns the distill metrics dict
    (loss/soft/hard/agreement) for one batch — the dev-set acceptance probe."""
    loss_fn = make_distill_loss_fn(cfg_draft, cfg_target, temperature,
                                   hard_weight, mel_interpret)

    @jax.jit
    def eval_step(params_draft, params_target, batch):
        loss, aux = loss_fn(params_draft, params_target, batch)
        return {"loss": loss, **aux}

    return eval_step


@dataclass
class DistillConfig:
    output_dir: str
    per_device_train_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    learning_rate: float = 1e-4
    num_train_epochs: float = 3
    warmup_steps: int = 50
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    temperature: float = 2.0
    hard_weight: float = 0.5
    eval_steps: int = 200
    save_steps: int = 200
    logging_steps: int = 50
    eval_batches: int = 16          # dev batches per acceptance probe
    save_total_limit: int = 2
    seed: int = 42
    mel_interpret: bool = False
    checkpoint_backend: str = "npz"  # or "orbax" (see train/checkpoint.py)


def distill_and_evaluate(
    cfg_draft: WhisperConfig,
    params_draft,
    cfg_target: WhisperConfig,
    params_target,
    data_train,
    data_eval,
    collator,
    dcfg: DistillConfig,
    shard_fn=None,
    eval_shard_fn=None,
    mesh=None,
):
    """Train the student against the frozen teacher; returns
    ``(params_draft, log_history)``. Checkpoints carry ``eval_agreement``
    (higher is better) and the best-agreement step is tracked in the log.

    Mirrors ``train_and_evaluate``'s loader/logging shape (train/loop.py)
    minus WER eval — dev-set quality here is the acceptance probe, which is
    what speculative serving actually pays for.
    """
    accum = dcfg.gradient_accumulation_steps
    steps_per_epoch = max(
        1, len(data_train) // (dcfg.per_device_train_batch_size * accum))
    total_steps = int(steps_per_epoch * dcfg.num_train_epochs)

    optimizer = make_optimizer(
        peak_lr=dcfg.learning_rate, total_steps=total_steps,
        warmup_steps=dcfg.warmup_steps, weight_decay=dcfg.weight_decay,
        max_grad_norm=dcfg.max_grad_norm)
    state = init_train_state(params_draft, optimizer)
    if mesh is not None:
        from ..parallel.sharding import shard_opt_state

        state = TrainState(
            state.params,
            shard_opt_state(state.opt_state, state.params, mesh), state.step)

    step_fn = make_distill_step(
        cfg_draft, cfg_target, optimizer, temperature=dcfg.temperature,
        hard_weight=dcfg.hard_weight, grad_accum=accum,
        mel_interpret=dcfg.mel_interpret)
    eval_fn = make_agreement_step(
        cfg_draft, cfg_target, temperature=dcfg.temperature,
        hard_weight=dcfg.hard_weight, mel_interpret=dcfg.mel_interpret)

    loader = BatchLoader(
        data_train, collator,
        batch_size=dcfg.per_device_train_batch_size * accum,
        shuffle=True, seed=dcfg.seed, drop_last=True)

    def reshape_accum(batch):
        if accum <= 1:
            return batch
        return {k: v.reshape(accum, dcfg.per_device_train_batch_size,
                             *v.shape[1:]) for k, v in batch.items()}

    eval_bs = dcfg.per_device_train_batch_size

    def pad_rows(b):
        # cycle-pad a final partial batch to the static eval batch size:
        # keeps ONE compiled eval program and keeps shard_batch divisible
        # under a data-parallel mesh (duplicated rows bias the probe's mean
        # negligibly; it is a selection signal, not a reported metric)
        n0 = next(iter(b.values())).shape[0]
        if n0 == eval_bs:
            return b
        idx = np.arange(eval_bs) % n0
        return {k: v[idx] for k, v in b.items()}

    def probe_agreement():
        ev = BatchLoader(data_eval, collator, batch_size=eval_bs,
                         shuffle=False, drop_last=False)
        tot, n = 0.0, 0
        for i, b in enumerate(ev):
            if i >= dcfg.eval_batches:
                break
            b = pad_rows(b)
            if eval_shard_fn is not None:
                b = eval_shard_fn(b)
            m = eval_fn(state.params, params_target, b)
            tot += float(m["agreement"])
            n += 1
        return tot / max(n, 1)

    os.makedirs(dcfg.output_dir, exist_ok=True)
    logger = RunLogger(dcfg.output_dir)
    log_history: list[dict] = []
    best = {"agreement": -1.0, "step": -1}
    last_eval: tuple[float, int] | None = None
    gstep = 0
    t0 = time.time()
    epochs = int(np.ceil(dcfg.num_train_epochs))

    def batches():
        for raw in loader:
            yield reshape_accum(raw)

    for epoch in range(epochs):
        if gstep >= total_steps:
            break
        for batch in prefetch_to_device(batches(), size=2, put_fn=shard_fn):
            if gstep >= total_steps:
                break
            state, metrics = step_fn(state, params_target, batch)
            gstep += 1
            if gstep % dcfg.logging_steps == 0 or gstep == total_steps:
                row = {k: float(v) for k, v in metrics.items()}
                row.update(step=gstep, epoch=epoch,
                           wall_s=round(time.time() - t0, 1))
                log_history.append(row)
                logger.log(row)
            if gstep % dcfg.eval_steps == 0 or gstep == total_steps:
                acc = probe_agreement()
                row = {"step": gstep, "eval_agreement": acc}
                log_history.append(row)
                logger.log(row)
                last_eval = (acc, gstep)
                if acc > best["agreement"]:
                    best = {"agreement": acc, "step": gstep}
            if gstep % dcfg.save_steps == 0 or gstep == total_steps:
                meta = {"log_history": list(log_history)}
                if last_eval is not None:
                    # same attribution contract as train/loop.py: the stamp
                    # carries the step the metric was measured at. Retention
                    # minimizes its key, so store 1-agreement alongside the
                    # human-readable agreement.
                    acc, estep = last_eval
                    meta.update(eval_agreement=acc,
                                eval_disagreement=1.0 - acc, eval_step=estep)
                if dcfg.checkpoint_backend == "orbax":
                    save_checkpoint(dcfg.output_dir, gstep, state.params,
                                    opt_state=state.opt_state, metadata=meta,
                                    keep=dcfg.save_total_limit,
                                    best_metric_key="eval_disagreement",
                                    backend="orbax")
                else:
                    host_params = jax.tree.map(np.asarray, state.params)
                    host_opt = jax.tree.map(np.asarray, state.opt_state)
                    save_checkpoint(dcfg.output_dir, gstep, host_params,
                                    opt_state=host_opt, metadata=meta,
                                    keep=dcfg.save_total_limit,
                                    best_metric_key="eval_disagreement")

    row = {"best_agreement": best["agreement"], "best_step": best["step"],
           "total_steps": gstep}
    log_history.append(row)
    logger.log(row)
    return state.params, log_history
