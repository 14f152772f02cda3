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
  * plus decode-time bias-trie shallow fusion, beam search, long-form decode,
    GSPMD dp/tp sharding, and Pallas kernels — see README.md / docs/DESIGN.md

Common entry points are re-exported here::

    from whisper_context_biasing_tpu import (
        load_tokenizer, get_config, init_params, load_pretrained,
        PromptWhisperDataset, SpeechSeq2SeqCollator,
        greedy_decode, beam_decode, decode_batch, transcribe_long,
        TrainingConfig, train_and_evaluate, evaluate_wer,
        compute_bias_wer, corpus_wer, BasicTextNormalizer,
    )
"""

__version__ = "0.1.0"

from .tokenizer import load_tokenizer, WhisperTokenizer  # noqa: F401
from .models import (  # noqa: F401
    WhisperConfig,
    get_config,
    init_params,
    load_pretrained,
    load_checkpoint_or_safetensors,
)
from .data import PromptWhisperDataset, SpeechSeq2SeqCollator  # noqa: F401
from .decode import (  # noqa: F401
    beam_decode,
    beam_decode_batch,
    decode_batch,
    greedy_decode,
    transcribe_long,
    transcribe_long_batch,
)
from .train import (  # noqa: F401
    TrainingConfig,
    evaluate_wer,
    train_and_evaluate,
)
from .metrics import (  # noqa: F401
    BasicTextNormalizer,
    compute_bias_wer,
    corpus_wer,
    score_predictions,
)
from .pipeline import Pipeline, TranscriptionResult  # noqa: F401
