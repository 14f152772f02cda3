"""Optimizer and LR schedule.

Reference recipe (scripts/train.py:225-257): AdamW, lr 1e-5, cosine schedule
with 50 warmup steps, weight decay 0.01, grad accumulation 4, fp16. The
TPU-native counterpart keeps f32 master params + Adam moments and runs the
forward/backward in bf16 (the caller controls compute dtype via the model
config).
"""

from __future__ import annotations

import optax


def warmup_cosine_schedule(
    peak_lr: float, warmup_steps: int, total_steps: int, end_lr_scale: float = 0.0
) -> optax.Schedule:
    """Linear warmup then cosine decay to end_lr_scale*peak (HF
    ``lr_scheduler_type="cosine"`` contract)."""
    warmup = optax.linear_schedule(0.0, peak_lr, max(1, warmup_steps))
    cosine = optax.cosine_decay_schedule(
        peak_lr, max(1, total_steps - warmup_steps), alpha=end_lr_scale
    )
    return optax.join_schedules([warmup, cosine], [warmup_steps])


def make_optimizer(
    peak_lr: float = 1e-5,
    warmup_steps: int = 50,
    total_steps: int = 10000,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: float | None = 1.0,
) -> optax.GradientTransformation:
    schedule = warmup_cosine_schedule(peak_lr, warmup_steps, total_steps)
    tx = optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    if max_grad_norm is not None:
        # HF Trainer default max_grad_norm=1.0 applies to the reference run
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
