"""Model layer: functional JAX Whisper + configs + HF checkpoint import."""

from .alignment import (
    ALIGNMENT_HEADS,
    alignment_matrix,
    default_alignment_mask,
    heads_to_mask,
    infer_model_name,
    lookup_alignment_heads,
    resolve_alignment_mask,
)
from .config import WhisperConfig, get_config, tiny_test_config
from .whisper import (
    decode_tokens,
    encode_audio,
    forward,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
    sinusoids,
)
from .medusa import (
    init_medusa_params,
    load_medusa,
    medusa_logits,
    save_medusa,
    split_medusa,
)
from .load_hf import (
    load_checkpoint_or_safetensors,
    save_safetensors,
    state_dict_from_params,
    load_pretrained,
    load_safetensors,
    load_torch_model,
    params_from_state_dict,
)

__all__ = [
    "ALIGNMENT_HEADS",
    "alignment_matrix",
    "default_alignment_mask",
    "infer_model_name",
    "lookup_alignment_heads",
    "resolve_alignment_mask",
    "heads_to_mask",
    "WhisperConfig",
    "get_config",
    "tiny_test_config",
    "forward",
    "encode_audio",
    "decode_tokens",
    "precompute_cross_kv",
    "init_kv_cache",
    "init_medusa_params",
    "medusa_logits",
    "save_medusa",
    "load_medusa",
    "split_medusa",
    "init_params",
    "sinusoids",
    "load_pretrained",
    "load_checkpoint_or_safetensors",
    "load_safetensors",
    "load_torch_model",
    "params_from_state_dict",
    "save_safetensors",
    "state_dict_from_params",
]
