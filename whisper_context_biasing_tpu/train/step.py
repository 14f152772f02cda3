"""Jittable training step: WeightCE forward/backward + AdamW, with
``lax.scan``-based microbatch gradient accumulation (the TPU-native
equivalent of the reference's ``gradient_accumulation_steps=4``,
scripts/train.py:229) and optional encoder freezing
(models/whisper_medical.py:39-43).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.config import WhisperConfig
from ..models.whisper import forward
from .loss import weighted_ce_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_loss_fn(
    cfg: WhisperConfig,
    bias_weight: float,
    use_bias_spans: bool = True,
    mel_on_device: bool = False,
    freeze_encoder: bool = False,
):
    """With ``mel_on_device`` the batch carries raw ``audio`` (B, 480000) and
    the fused Pallas log-mel runs inside the training program — the host-side
    numpy spectrogram (the reference pipeline's single-worker bottleneck)
    disappears from the input path entirely.

    ``freeze_encoder`` stops gradients at the encoder output, so XLA never
    builds the encoder backward pass at all (the encoder is the bulk of the
    FLOPs at 1500 frames) — semantically identical to computing encoder
    grads and discarding them, the reference's ``freeze_encoder()``
    (scripts/evaluation.py:170). Decoder cross-attention projections still
    train; they consume ``enc_out`` as a constant."""
    # span pad / special-id threshold follow the model's vocab layout:
    # eot is 50256 for .en and 50257 for multilingual (specials sit above it)
    pad_id = cfg.pad_token_id

    def loss_fn(params, batch):
        if mel_on_device:
            from ..ops.mel_kernel import log_mel_spectrogram_fused

            feats = log_mel_spectrogram_fused(batch["audio"], n_mels=cfg.n_mels)
        else:
            feats = batch["input_features"]
        if freeze_encoder:
            from ..models.whisper import decode_tokens, encode_audio

            enc_out = jax.lax.stop_gradient(encode_audio(params, cfg, feats))
            logits, _ = decode_tokens(params, cfg, batch["decoder_input_ids"],
                                      enc_out=enc_out)
        else:
            logits = forward(params, cfg, feats, batch["decoder_input_ids"])
        spans = batch.get("bias_spans") if use_bias_spans else None
        return weighted_ce_loss(logits, batch["labels"], spans, bias_weight,
                                span_pad_id=pad_id, special_id_threshold=pad_id)

    return loss_fn


def make_augment_fn(spec_augment, augment_seed: int):
    """SpecAugment applied inside a jitted step: randomness folds the step
    counter into ``augment_seed`` (resume-reproducible), leading microbatch
    axes are flattened through the mask. Shared by the full-weight and LoRA
    steps."""

    def augment(batch, step_no):
        from .augment import apply_spec_augment

        feats = batch["input_features"]
        key = jax.random.fold_in(jax.random.PRNGKey(augment_seed), step_no)
        flat = feats.reshape((-1,) + feats.shape[-2:])  # (A*B or B, m, T)
        flat = apply_spec_augment(flat, key, spec_augment)
        return dict(batch, input_features=flat.reshape(feats.shape))

    return augment


def accumulate_microbatch_grads(grad_of_microbatch, params, batch,
                                grad_accum: int):
    """``lax.scan`` microbatch gradient accumulation (peak memory = one
    microbatch): every array in ``batch`` carries a leading (A, ...) axis;
    returns ``(mean_loss, mean_grads)``. ``grad_of_microbatch(mb)`` must
    return ``(loss, grads-shaped-like-params)``."""

    def micro(carry, mb):
        acc, loss_sum = carry
        loss, g = grad_of_microbatch(mb)
        return (jax.tree.map(jnp.add, acc, g), loss_sum + loss), None

    zeros = jax.tree.map(jnp.zeros_like, params)
    (g, loss_sum), _ = jax.lax.scan(micro, (zeros, jnp.float32(0)), batch)
    scale = 1.0 / grad_accum
    return loss_sum * scale, jax.tree.map(lambda a: a * scale, g)


def make_train_step(
    cfg: WhisperConfig,
    optimizer: optax.GradientTransformation,
    bias_weight: float = 1.5,
    grad_accum: int = 1,
    freeze_encoder: bool = False,
    use_bias_spans: bool = True,
    donate: bool = True,
    mel_on_device: bool = False,
    spec_augment=None,       # SpecAugmentConfig: in-graph mel masking
    augment_seed: int = 0,
):
    """Returns ``step(state, batch) -> (state, metrics)``.

    With ``grad_accum > 1`` every array in ``batch`` must carry a leading
    microbatch axis (A, ...); gradients are averaged across microbatches by a
    ``lax.scan`` so peak memory stays one microbatch.

    ``spec_augment`` masks the mel features inside the step (train-time
    only; randomness folds ``state.step`` into ``augment_seed`` so resume
    reproduces the same masks). Needs precomputed ``input_features`` —
    combine with ``mel_on_device`` is not supported.
    """
    if spec_augment is not None and mel_on_device:
        raise ValueError("spec_augment needs precomputed input_features "
                         "(mel_on_device computes mel inside the loss)")
    loss_fn = make_loss_fn(cfg, bias_weight, use_bias_spans, mel_on_device,
                           freeze_encoder=freeze_encoder)
    grad_fn = jax.value_and_grad(loss_fn)
    augment = make_augment_fn(spec_augment, augment_seed)

    def single_grads(params, batch):
        return grad_fn(params, batch)

    def accum_grads(params, batch):
        return accumulate_microbatch_grads(
            lambda mb: grad_fn(params, mb), params, batch, grad_accum)

    def step(state: TrainState, batch):
        if spec_augment is not None:
            batch = augment(batch, state.step)
        if grad_accum > 1:
            loss, grads = accum_grads(state.params, batch)
        else:
            loss, grads = single_grads(state.params, batch)
        # freeze_encoder needs no grad zeroing here: the loss stops gradients
        # at the encoder output, so encoder grads are structural zeros and the
        # encoder backward is dead code XLA never runs
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        if freeze_encoder:
            # AdamW weight decay would still move zero-grad params; mask it
            updates = dict(
                updates, encoder=jax.tree.map(jnp.zeros_like, updates["encoder"])
            )
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss,
            "grad_norm": gnorm,
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_loss_step(cfg: WhisperConfig, bias_weight: float = 1.5, use_bias_spans: bool = True):
    loss_fn = make_loss_fn(cfg, bias_weight, use_bias_spans)
    return jax.jit(loss_fn)
