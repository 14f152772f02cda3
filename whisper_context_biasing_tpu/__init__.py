"""whisper_context_biasing_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
medical-domain Whisper ASR with contextual biasing.

Re-designed from scratch with the capabilities of the reference repo
thanh-nt25/Whisper-context-biasing (PyTorch/HF-Trainer, single GPU):

  * decoder prompt conditioning: per-utterance context (clinical description and/or
    bias-word list) prepended after ``<|startofprev|>`` (reference:
    data_utils/data_loader.py:182-366)
  * bias-weighted cross-entropy fine-tuning loss (reference:
    models/whisper_medical.py:116-156, semantics of scripts/check_WeightCE.py)
  * WER + count-based bias-word WER metrics (reference: utils/compute_metric.py)

The compute path here is pure JAX: a fused log-mel frontend, functional Whisper
encoder/decoder with scan-over-layers, a ``lax.while_loop`` KV-cache decoder with a
vectorized bias-trie logits processor, and jittable WeightCE batch transforms —
sharded over ``jax.sharding.Mesh(("data", "model"))``.
"""

__version__ = "0.1.0"
