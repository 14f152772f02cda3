"""Training layer: WeightCE loss, AdamW+cosine, jitted train step with
microbatch accumulation, checkpoint/resume with best-by-WER retention."""

from .loss import bias_span_weights, weighted_ce_loss
from .optim import make_optimizer, warmup_cosine_schedule
from .step import (
    TrainState,
    init_train_state,
    make_eval_loss_step,
    make_loss_fn,
    make_train_step,
)
from .augment import SpecAugmentConfig, apply_spec_augment
from .medusa import (
    MedusaConfig,
    expected_tokens_per_round,
    make_medusa_loss_fn,
    make_medusa_train_step,
    train_medusa_heads,
)
from .lora import (
    init_lora_params,
    lora_param_count,
    make_lora_train_step,
    merge_lora,
)
from .loop import TrainingConfig, evaluate_wer, train_and_evaluate
from .distill import (
    DistillConfig,
    distill_and_evaluate,
    make_agreement_step,
    make_distill_loss_fn,
    make_distill_step,
)
from .checkpoint import (
    find_best_checkpoint,
    is_native_checkpoint,
    latest_checkpoint,
    list_checkpoints,
    load_checkpoint,
    save_checkpoint,
)

__all__ = [
    "bias_span_weights",
    "weighted_ce_loss",
    "make_optimizer",
    "warmup_cosine_schedule",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "make_eval_loss_step",
    "make_loss_fn",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "find_best_checkpoint",
    "is_native_checkpoint",
    "list_checkpoints",
    "TrainingConfig",
    "train_and_evaluate",
    "evaluate_wer",
    "SpecAugmentConfig",
    "apply_spec_augment",
    "MedusaConfig",
    "expected_tokens_per_round",
    "make_medusa_loss_fn",
    "make_medusa_train_step",
    "train_medusa_heads",
    "init_lora_params",
    "lora_param_count",
    "make_lora_train_step",
    "merge_lora",
    "DistillConfig",
    "distill_and_evaluate",
    "make_agreement_step",
    "make_distill_loss_fn",
    "make_distill_step",
]
