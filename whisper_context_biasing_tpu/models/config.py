"""Whisper architecture configurations (public model family dimensions).

The reference fine-tunes ``openai/whisper-base.en`` via HF Transformers
(scripts/train.py:96,193); this framework supports the whole family
tiny..large-v3 in both English-only (vocab 51864) and multilingual
(51865/51866) variants.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax.numpy as jnp


@dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_audio_ctx: int = 1500
    d_model: int = 512
    n_heads: int = 8
    n_audio_layers: int = 6
    n_text_layers: int = 6
    n_vocab: int = 51864
    n_text_ctx: int = 448
    multilingual: bool = False
    # compute dtype for block matmuls; params are kept f32 master copies
    dtype: str = "bfloat16"
    # Pallas flash attention for encoder self-attention (ops/flash_attention.py);
    # flash_interpret runs the kernel in interpreter mode (CPU tests)
    flash_attention: bool = False
    flash_interpret: bool = False
    # q-block rows per Pallas grid cell. 256 is a safe default for the
    # training backward kernels; decode-only configs can use 1536 (one block
    # per head: whole 30 s window's scores stay in VMEM, ~9% faster fwd)
    flash_block_q: int = 256
    # flash attention in the decoder's full-sequence (training) mode too:
    # causal self-attn + cross-attn. Wins at long label sequences (prompted
    # training, S -> 448) where the (B, H, S, 1500) cross scores are large;
    # at short S the XLA path is faster (docs/PERF.md)
    flash_decoder: bool = True
    # static label-length threshold below which the decoder keeps the XLA
    # attention path even with flash_decoder=True (measured crossover on
    # v5e, docs/PERF.md: XLA wins at S=128, flash wins at S=448); tests
    # override to 0 to exercise the kernels at tiny shapes
    flash_decoder_min_seq: int = 256
    # rematerialization policy for transformer blocks in training:
    #   "full"  — jax.checkpoint, recompute everything in backward (min HBM)
    #   "dots"  — save MXU matmul outputs, recompute the rest (docs/PERF.md)
    #   "wide"  — save everything except the 4*d MLP intermediates (no
    #             attention recompute, drops the dominant residual traffic)
    #   "none"  — no remat (max HBM, min FLOPs)
    remat: str = "full"
    # Pallas single-query int8 cross attention for the decode step
    # (ops/quant_cross_attention.py): per-batch-row VMEM dequant, fixes the
    # batch>=32 bf16-KV spill. Needs quantize_cross_kv; TPU or
    # flash_interpret=True. Off by default so CPU paths stay Pallas-free.
    fused_quant_cross: bool = False
    # int8 cross-attention K/V for decode: halves the dominant HBM traffic of
    # single-token steps (models/whisper.py:quantize_cross_kv)
    quantize_cross_kv: bool = False
    # tanh-approximate gelu instead of exact erf. The erf runs on the VPU and
    # is ~10% of encoder wall time at batch 64 (docs/PERF.md round 2b); the
    # tanh approximation's error (~3e-3 absolute) is below bf16 rounding at
    # typical activation magnitudes, so bf16 serving configs lose nothing.
    # Off by default: f32/f64 parity tests pin exact gelu (HF semantics).
    gelu_approx: bool = False
    # fused LayerNorm+matmul Pallas kernels (ops/fused_block.py) on the
    # full-sequence (training) path: attn_ln folded into the QKV projection
    # read, and mlp_ln + bias + gelu folded into the first MLP matmul — the
    # normalized tensor and the (N, 4d) pre-activation never reach HBM.
    # Inert on the cached decode path and for int8-quantized weights.
    # flash_interpret=True runs these in interpreter mode too (CPU tests).
    fused_ln_qkv: bool = False
    fused_ln_mlp: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    # reference-parity aliases (HF WhisperConfig names used by the reference)
    @property
    def vocab_size(self) -> int:
        return self.n_vocab

    @property
    def max_target_positions(self) -> int:
        return self.n_text_ctx

    @property
    def decoder_start_token_id(self) -> int:
        return 50258 if self.multilingual else 50257

    @property
    def pad_token_id(self) -> int:
        return 50257 if self.multilingual else 50256

    @property
    def eos_token_id(self) -> int:
        return self.pad_token_id


_FAMILY = {
    # name: (d_model, n_heads, n_audio_layers, n_text_layers)
    "tiny": (384, 6, 4, 4),
    "base": (512, 8, 6, 6),
    "small": (768, 12, 12, 12),
    "medium": (1024, 16, 24, 24),
    "large": (1280, 20, 32, 32),
    "large-v2": (1280, 20, 32, 32),
    "large-v3": (1280, 20, 32, 32),
    # turbo: large-v3 encoder with a pruned-and-distilled 4-layer decoder
    # (openai/whisper-large-v3-turbo) — 8x fewer decode-step weight reads
    "large-v3-turbo": (1280, 20, 32, 4),
    # distil-whisper (hf.co/distil-whisper): the teacher's encoder with a
    # 2-layer distilled decoder (4 for distil-small.en) — purpose-built
    # speculative drafts for their teachers (decode/speculative.py), or
    # standalone fast servers. distil-small/medium ship English-only;
    # distil-large-v2/v3 multilingual.
    "distil-small": (768, 12, 12, 4),
    "distil-medium": (1024, 16, 24, 2),
    "distil-large-v2": (1280, 20, 32, 2),
    "distil-large-v3": (1280, 20, 32, 2),
}


def get_config(name: str, **overrides) -> WhisperConfig:
    """``get_config("base.en")``, ``get_config("large-v3")`` etc."""
    base = name
    english = name.endswith(".en")
    if english:
        base = name[: -len(".en")]
    if base not in _FAMILY:
        raise ValueError(f"unknown whisper model: {name!r} (know {sorted(_FAMILY)})")
    # the large-v3 lineage rules (128 mels, 51866 vocab) apply to the
    # distilled variants of the same teachers
    stem = base[len("distil-"):] if base.startswith("distil-") else base
    if english and stem.startswith("large"):
        raise ValueError(f"no English-only variant of {base!r}")
    if not english and base in ("distil-small", "distil-medium"):
        raise ValueError(f"{base!r} ships English-only: use {base}.en")
    d, h, audio_layers, text_layers = _FAMILY[base]
    if english:
        vocab = 51864
    elif stem.startswith("large-v3"):
        vocab = 51866
    else:
        vocab = 51865
    cfg = WhisperConfig(
        n_mels=128 if stem.startswith("large-v3") else 80,
        d_model=d,
        n_heads=h,
        n_audio_layers=audio_layers,
        n_text_layers=text_layers,
        n_vocab=vocab,
        multilingual=not english,
    )
    return replace(cfg, **overrides)


def tiny_test_config(**overrides) -> WhisperConfig:
    """A miniature config for fast CPU tests."""
    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=64, d_model=64, n_heads=2,
        n_audio_layers=2, n_text_layers=2, n_vocab=51864, n_text_ctx=448,
        dtype="float32",
    )
    return replace(cfg, **overrides)
