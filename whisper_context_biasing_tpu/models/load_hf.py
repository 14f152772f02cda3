"""HF Whisper checkpoint import.

Converts HuggingFace Whisper weights (the format the reference trains in:
``WhisperForConditionalGenerationWeightCE.from_pretrained``,
scripts/train.py:193) into this framework's stacked params pytree. Sources:

  * a safetensors file (``model.safetensors`` from any HF whisper checkpoint)
  * an in-memory ``dict[str, np.ndarray]`` state dict (used by the parity
    tests to diff our forward pass against HF's torch kernels offline)

Weight-layout transforms: HF linear weights are (out, in) -> ours (in, out);
conv stems (O, I, W) -> (W, I, O); per-layer tensors are stacked along a
leading layer axis for scan-over-layers.
"""

from __future__ import annotations

import os
import re

import numpy as np
import jax.numpy as jnp

from .config import WhisperConfig, get_config
from .whisper import Params


def _strip_prefix(sd: dict) -> dict:
    """Drop the 'model.' prefix used by WhisperForConditionalGeneration."""
    out = {}
    for k, v in sd.items():
        out[k[6:] if k.startswith("model.") else k] = v
    return out


def _stack(sd, tmpl: str, n: int, transform=None) -> jnp.ndarray:
    arrs = []
    for i in range(n):
        a = np.asarray(sd[tmpl.format(i)])
        arrs.append(transform(a) if transform else a)
    return jnp.asarray(np.stack(arrs))


def _t(a):  # (out, in) -> (in, out)
    return a.T


def config_from_state_dict(sd: dict) -> WhisperConfig:
    sd = _strip_prefix(sd)
    d = sd["decoder.embed_tokens.weight"].shape[1]
    vocab = sd["decoder.embed_tokens.weight"].shape[0]
    n_mels = sd["encoder.conv1.weight"].shape[1]
    n_audio_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"encoder\.layers\.(\d+)\.", k))
    )
    n_text_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"decoder\.layers\.(\d+)\.", k))
    )
    # head count is not recoverable from the weights alone; every public
    # Whisper model uses head_dim=64 — pass an explicit cfg for other dims
    head_dim = 64
    return WhisperConfig(
        n_mels=n_mels, d_model=d, n_heads=max(1, d // head_dim),
        n_audio_layers=n_audio_layers, n_text_layers=n_text_layers,
        n_vocab=vocab, multilingual=vocab != 51864,
        # context windows come from the positional tables, not defaults —
        # a non-standard fine-tune (e.g. longer decoder context) would
        # otherwise be silently truncated at generation time
        n_audio_ctx=sd["encoder.embed_positions.weight"].shape[0],
        n_text_ctx=sd["decoder.embed_positions.weight"].shape[0],
    )


def params_from_state_dict(sd: dict, cfg: WhisperConfig | None = None) -> tuple[Params, WhisperConfig]:
    sd = _strip_prefix(sd)
    if cfg is None:
        cfg = config_from_state_dict(sd)
    La, Lt = cfg.n_audio_layers, cfg.n_text_layers

    def attn(prefix: str, n: int) -> dict:
        return {
            "wq": _stack(sd, prefix + ".q_proj.weight", n, _t),
            "bq": _stack(sd, prefix + ".q_proj.bias", n),
            "wk": _stack(sd, prefix + ".k_proj.weight", n, _t),
            "wv": _stack(sd, prefix + ".v_proj.weight", n, _t),
            "bv": _stack(sd, prefix + ".v_proj.bias", n),
            "wo": _stack(sd, prefix + ".out_proj.weight", n, _t),
            "bo": _stack(sd, prefix + ".out_proj.bias", n),
        }

    def ln(tmpl: str, n: int) -> dict:
        return {
            "scale": _stack(sd, tmpl + ".weight", n),
            "bias": _stack(sd, tmpl + ".bias", n),
        }

    def mlp(tmpl: str, n: int) -> dict:
        return {
            "w1": _stack(sd, tmpl + ".fc1.weight", n, _t),
            "b1": _stack(sd, tmpl + ".fc1.bias", n),
            "w2": _stack(sd, tmpl + ".fc2.weight", n, _t),
            "b2": _stack(sd, tmpl + ".fc2.bias", n),
        }

    enc = {
        "conv1": {
            "w": jnp.asarray(np.asarray(sd["encoder.conv1.weight"]).transpose(2, 1, 0)),
            "b": jnp.asarray(np.asarray(sd["encoder.conv1.bias"])),
        },
        "conv2": {
            "w": jnp.asarray(np.asarray(sd["encoder.conv2.weight"]).transpose(2, 1, 0)),
            "b": jnp.asarray(np.asarray(sd["encoder.conv2.bias"])),
        },
        "pos_emb": jnp.asarray(np.asarray(sd["encoder.embed_positions.weight"])),
        "attn_ln": ln("encoder.layers.{0}.self_attn_layer_norm", La),
        "attn": attn("encoder.layers.{0}.self_attn", La),
        "mlp_ln": ln("encoder.layers.{0}.final_layer_norm", La),
        "mlp": mlp("encoder.layers.{0}", La),
        "ln_post": {
            "scale": jnp.asarray(np.asarray(sd["encoder.layer_norm.weight"])),
            "bias": jnp.asarray(np.asarray(sd["encoder.layer_norm.bias"])),
        },
    }
    dec = {
        "token_emb": jnp.asarray(np.asarray(sd["decoder.embed_tokens.weight"])),
        "pos_emb": jnp.asarray(np.asarray(sd["decoder.embed_positions.weight"])),
        "self_attn_ln": ln("decoder.layers.{0}.self_attn_layer_norm", Lt),
        "self_attn": attn("decoder.layers.{0}.self_attn", Lt),
        "cross_attn_ln": ln("decoder.layers.{0}.encoder_attn_layer_norm", Lt),
        "cross_attn": attn("decoder.layers.{0}.encoder_attn", Lt),
        "mlp_ln": ln("decoder.layers.{0}.final_layer_norm", Lt),
        "mlp": mlp("decoder.layers.{0}", Lt),
        "ln": {
            "scale": jnp.asarray(np.asarray(sd["decoder.layer_norm.weight"])),
            "bias": jnp.asarray(np.asarray(sd["decoder.layer_norm.bias"])),
        },
    }
    params: Params = {"encoder": enc, "decoder": dec}

    if "proj_out.weight" in sd:
        proj = np.asarray(sd["proj_out.weight"])
        if not np.array_equal(proj, np.asarray(sd["decoder.embed_tokens.weight"])):
            params["proj_out"] = jnp.asarray(proj)  # untied head
    return params, cfg


def state_dict_from_params(params: Params, cfg: WhisperConfig) -> dict:
    """The inverse of :func:`params_from_state_dict`: our stacked pytree ->
    an HF ``WhisperForConditionalGeneration`` state dict (numpy float32).

    Interop parity: the reference publishes its fine-tunes as HF checkpoints
    (hub pushes, scripts/train.py:285-307); this lets models trained here be
    loaded by transformers / openai-whisper tooling anywhere. Quantized
    (int8) params are not exportable — dequantize or export the float
    master copy."""
    enc, dec = params["encoder"], params["decoder"]
    sd: dict[str, np.ndarray] = {}

    def put(key, v):
        # contiguity matters: transposed weight views must be materialized
        # before safetensors serialization
        sd["model." + key] = np.ascontiguousarray(v, dtype=np.float32)

    def put_attn(prefix, grp, n):
        for i in range(n):
            put(f"{prefix.format(i)}.q_proj.weight", np.asarray(grp["wq"][i]).T)
            put(f"{prefix.format(i)}.q_proj.bias", grp["bq"][i])
            put(f"{prefix.format(i)}.k_proj.weight", np.asarray(grp["wk"][i]).T)
            put(f"{prefix.format(i)}.v_proj.weight", np.asarray(grp["wv"][i]).T)
            put(f"{prefix.format(i)}.v_proj.bias", grp["bv"][i])
            put(f"{prefix.format(i)}.out_proj.weight", np.asarray(grp["wo"][i]).T)
            put(f"{prefix.format(i)}.out_proj.bias", grp["bo"][i])

    def put_ln(tmpl, grp, n):
        for i in range(n):
            put(f"{tmpl.format(i)}.weight", grp["scale"][i])
            put(f"{tmpl.format(i)}.bias", grp["bias"][i])

    def put_mlp(tmpl, grp, n):
        for i in range(n):
            put(f"{tmpl.format(i)}.fc1.weight", np.asarray(grp["w1"][i]).T)
            put(f"{tmpl.format(i)}.fc1.bias", grp["b1"][i])
            put(f"{tmpl.format(i)}.fc2.weight", np.asarray(grp["w2"][i]).T)
            put(f"{tmpl.format(i)}.fc2.bias", grp["b2"][i])

    import jax

    if any(np.asarray(leaf).dtype == np.int8
           for leaf in jax.tree_util.tree_leaves(params)):
        raise ValueError("quantized (int8) params are not exportable — "
                         "export the float master copy")

    La, Lt = cfg.n_audio_layers, cfg.n_text_layers
    put("encoder.conv1.weight", np.asarray(enc["conv1"]["w"]).transpose(2, 1, 0))
    put("encoder.conv1.bias", enc["conv1"]["b"])
    put("encoder.conv2.weight", np.asarray(enc["conv2"]["w"]).transpose(2, 1, 0))
    put("encoder.conv2.bias", enc["conv2"]["b"])
    put("encoder.embed_positions.weight", enc["pos_emb"])
    put_ln("encoder.layers.{0}.self_attn_layer_norm", enc["attn_ln"], La)
    put_attn("encoder.layers.{0}.self_attn", enc["attn"], La)
    put_ln("encoder.layers.{0}.final_layer_norm", enc["mlp_ln"], La)
    put_mlp("encoder.layers.{0}", enc["mlp"], La)
    put("encoder.layer_norm.weight", enc["ln_post"]["scale"])
    put("encoder.layer_norm.bias", enc["ln_post"]["bias"])

    put("decoder.embed_tokens.weight", dec["token_emb"])
    put("decoder.embed_positions.weight", dec["pos_emb"])
    put_ln("decoder.layers.{0}.self_attn_layer_norm", dec["self_attn_ln"], Lt)
    put_attn("decoder.layers.{0}.self_attn", dec["self_attn"], Lt)
    put_ln("decoder.layers.{0}.encoder_attn_layer_norm", dec["cross_attn_ln"], Lt)
    put_attn("decoder.layers.{0}.encoder_attn", dec["cross_attn"], Lt)
    put_ln("decoder.layers.{0}.final_layer_norm", dec["mlp_ln"], Lt)
    put_mlp("decoder.layers.{0}", dec["mlp"], Lt)
    put("decoder.layer_norm.weight", dec["ln"]["scale"])
    put("decoder.layer_norm.bias", dec["ln"]["bias"])

    proj = params.get("proj_out", dec["token_emb"])
    sd["proj_out.weight"] = np.ascontiguousarray(proj, dtype=np.float32)
    return sd


def save_safetensors(params: Params, cfg: WhisperConfig, path: str) -> None:
    """Write an HF-compatible ``model.safetensors`` (directory or file path)."""
    from safetensors.numpy import save_file

    if os.path.isdir(path) or not path.endswith(".safetensors"):
        os.makedirs(path, exist_ok=True)
        path = os.path.join(path, "model.safetensors")
    elif os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    save_file(state_dict_from_params(params, cfg), path)


def load_safetensors(path: str, cfg: WhisperConfig | None = None) -> tuple[Params, WhisperConfig]:
    """Load an HF whisper checkpoint directory or .safetensors file."""
    from safetensors.numpy import load_file

    if os.path.isdir(path):
        path = os.path.join(path, "model.safetensors")
    sd = load_file(path)
    return params_from_state_dict(sd, cfg)


def load_torch_model(model, cfg: WhisperConfig | None = None) -> tuple[Params, WhisperConfig]:
    """Convert an in-memory torch WhisperModel/ForConditionalGeneration."""
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    if cfg is None and hasattr(model, "config"):
        hf = model.config
        cfg = WhisperConfig(
            n_mels=hf.num_mel_bins, d_model=hf.d_model,
            n_heads=hf.encoder_attention_heads,
            n_audio_layers=hf.encoder_layers, n_text_layers=hf.decoder_layers,
            n_vocab=hf.vocab_size, n_text_ctx=hf.max_target_positions,
            multilingual=hf.vocab_size != 51864,
        )
    return params_from_state_dict(sd, cfg)


def load_checkpoint_or_safetensors(path: str, cfg: WhisperConfig | None = None):
    """Load either a native checkpoint-N dir (npz or orbax backed) or an HF
    safetensors checkpoint; returns (params, cfg)."""
    from ..train.checkpoint import is_native_checkpoint

    if is_native_checkpoint(path):
        from ..train.checkpoint import load_checkpoint

        params, _, _ = load_checkpoint(path)
        if cfg is None:
            raise ValueError("cfg required when loading a native checkpoint")
        return params, cfg
    return load_safetensors(path, cfg)


def load_pretrained(name_or_path: str, **overrides) -> tuple[Params, WhisperConfig]:
    """Entry point: a model name resolves to a config with random init unless
    a local checkpoint path is given (offline-first; no hub download).
    ``overrides`` (dtype, kernel flags, ...) apply in both branches."""
    if os.path.exists(name_or_path):
        params, cfg = load_safetensors(name_or_path)
        if overrides:
            from dataclasses import replace

            cfg = replace(cfg, **overrides)
        return params, cfg
    from .whisper import init_params

    cfg = get_config(name_or_path.split("/")[-1].replace("whisper-", ""), **overrides)
    return init_params(cfg), cfg
