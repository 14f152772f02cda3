"""Server engine unit tests (no HTTP, no TPU): the long-form routing path
added to scripts/serve.py — >30 s requests run the sequential-window seek
loop with the engine's static batch shape and bucketed prompt lengths."""

import importlib.util
import os
import sys
from argparse import Namespace

import numpy as np
import pytest

from whisper_context_biasing_tpu.audio.mel import N_SAMPLES
from whisper_context_biasing_tpu.data.collator import SpeechSeq2SeqCollator
from whisper_context_biasing_tpu.decode import transcribe_long_batch
from whisper_context_biasing_tpu.models import init_params, tiny_test_config
from whisper_context_biasing_tpu.tokenizer import load_tokenizer


def _load_serve():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "serve.py")
    spec = importlib.util.spec_from_file_location("serve_mod", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["serve_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def engine():
    """An Engine wired by hand around the tiny CPU config (the real
    constructor builds a TPU config and warms the compile)."""
    import jax.numpy as jnp

    serve = _load_serve()
    eng = serve.Engine.__new__(serve.Engine)
    eng.args = Namespace(
        batch=2, max_tokens=4, num_beams=1, bias_words=None, bias_boost=0.0,
        timestamps=False, no_long_form=False,
        temperatures=[0.0], logprob_threshold=float("nan"),
    )
    eng.jnp = jnp
    eng.cfg = tiny_test_config()
    eng.params = init_params(eng.cfg, 0)
    eng.tokenizer = load_tokenizer()
    eng.collator = SpeechSeq2SeqCollator(
        pad_token_id=eng.tokenizer.pad_token_id,
        decoder_start_token_id=eng.tokenizer.sot,
        bias_span_pad_id=eng.tokenizer.eot,
    )
    eng.mesh = None
    rng = np.random.default_rng(0)

    def mel_fn(chunk, n_mels=80):
        r = np.random.default_rng(int(abs(np.asarray(chunk)).sum() * 1e3) % 2**31)
        return jnp.asarray(
            (r.standard_normal((np.asarray(chunk).shape[0], 80, 128)) * 0.5)
            .astype(np.float32))

    eng.mel_fn = mel_fn
    eng.transcribe_long_batch = transcribe_long_batch
    return eng


class TestServeLongForm:
    def test_run_long_returns_text_per_request(self, engine):
        audios = [np.ones(N_SAMPLES + 16000, np.float32) * 0.1,  # 31 s
                  np.ones(8000, np.float32) * 0.2]               # 0.5 s
        texts = engine._run_long(audios, [None, None], [None, None])
        assert len(texts) == 2
        assert all(isinstance(t, str) for t in texts)

    def test_run_long_pads_to_static_batch(self, engine):
        # a single long request must still work (batch padded internally)
        texts = engine._run_long([np.ones(N_SAMPLES + 100, np.float32)],
                                 [None], [None])
        assert len(texts) == 1

    def test_run_long_with_context_and_bias(self, engine):
        audios = [np.ones(N_SAMPLES + 100, np.float32) * 0.1]
        texts = engine._run_long(audios, ["aspirin for pain"], [["aspirin"]])
        assert len(texts) == 1

    def test_worker_routing_threshold(self):
        """The worker routes on raw sample count: >480000 == long-form."""
        assert N_SAMPLES == 480000
