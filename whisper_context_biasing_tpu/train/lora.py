"""LoRA fine-tuning: low-rank adapters over the attention projections.

The reference fine-tunes every weight of the model (HF Seq2SeqTrainer over
the full module, scripts/train.py:225-273). LoRA (Hu et al. 2021) trains
rank-``r`` factors ``A (d, r)``, ``B (r, d)`` per target projection instead
— here per-layer-stacked ``(L, d, r) / (L, r, d)`` to match this repo's
scan-over-layers parameter layout — with the frozen base weights entering
as ``W + (alpha/r)·A@B``.

TPU-first shape of the implementation: instead of threading adapters
through the model code, the jitted train step MERGES the adapters into the
frozen base tree first (one batched ``(L,d,r)x(L,r,d)`` einsum per target —
microscopic next to a forward pass) and runs the UNMODIFIED forward on the
merged tree. XLA differentiates through the merge, so gradients (and the
AdamW state) exist only for the adapters: optimizer memory drops from
2x model size to 2x adapter size, and the model/kernel code is untouched.
Under a mesh the base stays sharded ("model" axis) while the small adapters
replicate; the merged product follows the base sharding.

Checkpoints written during LoRA training contain the ADAPTER tree (tiny,
fast to save); ``merge_lora`` exports full weights for serving/eval — the
training loop does this at every eval and at the end, so everything
downstream (WER eval, safetensors export, the serving stack) sees ordinary
dense weights.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# every attention block in the model, in the params-tree layout of
# models/whisper.py:init_params (weights stacked over layers)
_BLOCKS = (("encoder", "attn"), ("decoder", "self_attn"),
           ("decoder", "cross_attn"))
DEFAULT_TARGETS = ("wq", "wv")  # the LoRA paper's best cost/quality point


def init_lora_params(
    params,
    rank: int,
    key: jax.Array,
    targets: tuple[str, ...] = DEFAULT_TARGETS,
    include_encoder: bool = True,
) -> dict:
    """Adapter tree mirroring the base layout: ``lora[top][blk][t] =
    {"a": (L, d, r), "b": (L, r, e)}``. ``a`` gets a scaled-normal init,
    ``b`` zeros, so the merged model starts exactly at the base weights.
    ``include_encoder=False`` adapts the decoder only (the LoRA analog of
    the reference's freeze_encoder())."""
    if rank < 1:
        raise ValueError(f"lora rank must be >= 1, got {rank}")
    lora: dict = {}
    for top, blk in _BLOCKS:
        if not include_encoder and top == "encoder":
            continue
        for t in targets:
            w = params[top][blk][t]          # (L, d, e)
            l, d, e = w.shape
            key, k = jax.random.split(key)
            a = (jax.random.normal(k, (l, d, rank), jnp.float32)
                 / math.sqrt(d))
            b = jnp.zeros((l, rank, e), jnp.float32)
            lora.setdefault(top, {}).setdefault(blk, {})[t] = {"a": a, "b": b}
    return lora


def merge_lora(params, lora: dict, alpha: float = 16.0):
    """Dense weights: ``W + (alpha/r)·A@B`` per adapted projection; every
    other leaf is passed through untouched (no copies)."""
    out = {k: v for k, v in params.items()}
    for top, blocks in lora.items():
        out[top] = {k: v for k, v in params[top].items()}
        for blk, tgts in blocks.items():
            out[top][blk] = {k: v for k, v in params[top][blk].items()}
            for t, ab in tgts.items():
                rank = ab["a"].shape[-1]
                delta = jnp.einsum("ldr,lre->lde", ab["a"], ab["b"])
                w = params[top][blk][t]
                out[top][blk][t] = w + (alpha / rank) * delta.astype(w.dtype)
    return out


def lora_param_count(lora: dict) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(lora))


def make_lora_train_step(
    cfg,
    optimizer,
    alpha: float = 16.0,
    bias_weight: float = 1.5,
    grad_accum: int = 1,
    use_bias_spans: bool = True,
    donate: bool = True,
    spec_augment=None,
    augment_seed: int = 0,
):
    """Returns ``step(state, base_params, batch) -> (state, metrics)`` where
    ``state.params`` is the ADAPTER tree and ``base_params`` rides along
    frozen (like the distillation teacher, train/distill.py). Metrics match
    ``make_train_step``'s contract; ``grad_norm`` is the adapter grad norm."""
    import optax

    from .step import (
        TrainState,
        accumulate_microbatch_grads,
        make_augment_fn,
        make_loss_fn,
    )

    loss_full = make_loss_fn(cfg, bias_weight, use_bias_spans)

    def loss_fn(lora, base, batch):
        merged = merge_lora(jax.lax.stop_gradient(base), lora, alpha)
        return loss_full(merged, batch)

    grad_fn = jax.value_and_grad(loss_fn)
    augment = make_augment_fn(spec_augment, augment_seed)

    def accum_grads(lora, base, batch):
        return accumulate_microbatch_grads(
            lambda mb: grad_fn(lora, base, mb), lora, batch, grad_accum)

    def step(state: TrainState, base, batch):
        if spec_augment is not None:
            batch = augment(batch, state.step)
        if grad_accum > 1:
            loss, grads = accum_grads(state.params, base, batch)
        else:
            loss, grads = grad_fn(state.params, base, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        lora = optax.apply_updates(state.params, updates)
        return TrainState(lora, opt_state, state.step + 1), {
            "loss": loss, "grad_norm": optax.global_norm(grads),
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())
