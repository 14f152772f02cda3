"""HF export: state_dict_from_params must invert params_from_state_dict
exactly, and the saved safetensors must roundtrip (interop with the
reference's HF checkpoint artifacts, scripts/train.py:285-307)."""

import numpy as np
import pytest

from whisper_context_biasing_tpu.models import (
    init_params,
    params_from_state_dict,
    save_safetensors,
    state_dict_from_params,
    tiny_test_config,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = init_params(cfg, 0)
    return cfg, params


class TestExport:
    def test_roundtrip_identity(self, setup):
        cfg, params = setup
        sd = state_dict_from_params(params, cfg)
        params2, cfg2 = params_from_state_dict(sd, cfg)
        import jax

        leaves1 = jax.tree_util.tree_leaves_with_path(params)
        leaves2 = {tuple(str(k) for k in p): v
                   for p, v in jax.tree_util.tree_leaves_with_path(params2)}
        for path, v in leaves1:
            key = tuple(str(k) for k in path)
            np.testing.assert_allclose(np.asarray(v), np.asarray(leaves2[key]),
                                       atol=1e-7, err_msg=str(key))

    def test_hf_key_set_matches_torch_model(self, setup):
        """Exported keys must be exactly the torch model's state-dict keys
        (so transformers load_state_dict(strict=True) succeeds)."""
        import torch
        from transformers import (
            WhisperConfig as HFConfig,
            WhisperForConditionalGeneration,
        )

        hf_cfg = HFConfig(
            vocab_size=51864, num_mel_bins=80, d_model=64,
            encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=2, decoder_attention_heads=2,
            encoder_ffn_dim=256, decoder_ffn_dim=256,
            max_source_positions=64, max_target_positions=448,
        )
        torch.manual_seed(0)
        hf = WhisperForConditionalGeneration(hf_cfg).eval()
        from whisper_context_biasing_tpu.models import load_torch_model

        params, cfg = load_torch_model(hf)
        sd = state_dict_from_params(params, cfg)
        theirs = set(hf.state_dict().keys())
        ours = set(sd.keys())
        assert ours == theirs, (sorted(ours - theirs), sorted(theirs - ours))
        # and load it back into torch, strictly, with value parity
        hf.load_state_dict({k: torch.tensor(v) for k, v in sd.items()},
                           strict=True)
        for k, v in hf.state_dict().items():
            np.testing.assert_allclose(v.numpy(), sd[k], atol=1e-7)

    def test_save_and_load_safetensors(self, setup, tmp_path):
        from whisper_context_biasing_tpu.models import load_safetensors

        cfg, params = setup
        save_safetensors(params, cfg, str(tmp_path))
        assert (tmp_path / "model.safetensors").is_file()
        params2, _ = load_safetensors(str(tmp_path), cfg)
        import jax

        by_path = {tuple(str(k) for k in p): v
                   for p, v in jax.tree_util.tree_leaves_with_path(params2)}
        for path, v in jax.tree_util.tree_leaves_with_path(params):
            key = tuple(str(k) for k in path)
            np.testing.assert_allclose(np.asarray(v), np.asarray(by_path[key]),
                                       atol=1e-7, err_msg=str(key))

    def test_quantized_params_rejected(self, setup):
        from whisper_context_biasing_tpu.models.whisper import (
            quantize_decoder_weights,
        )

        cfg, params = setup
        q = quantize_decoder_weights(params)
        with pytest.raises(ValueError, match="not exportable"):
            state_dict_from_params(q, cfg)

    def test_untied_proj_out_preserved(self, setup):
        cfg, params = setup
        rng = np.random.default_rng(1)
        p2 = dict(params)
        p2["proj_out"] = rng.standard_normal(
            (cfg.n_vocab, cfg.d_model)).astype(np.float32)
        sd = state_dict_from_params(p2, cfg)
        np.testing.assert_allclose(sd["proj_out.weight"], p2["proj_out"])
        params3, _ = params_from_state_dict(sd, cfg)
        assert "proj_out" in params3
