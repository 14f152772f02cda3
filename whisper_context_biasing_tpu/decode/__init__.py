"""Decode layer: single-XLA-program greedy/beam decoding with KV cache and
vectorized bias-word logits processing."""

from .bias_processor import (
    BiasTrieState,
    advance_bias_state,
    bias_bonus,
    bias_score_adjust,
    init_bias_state,
    sanitize_bias_spans,
    seed_bias_state_from_prefix,
)
from .greedy import GreedyResult, decode_batch, greedy_decode, pack_prefixes
from .speculative import (
    load_draft,
    speculative_decode_batch,
    speculative_greedy_decode,
)
from .beam import BeamResult, beam_decode, beam_decode_batch
from .language import detect_language, resolve_start_tokens
from .chunked import chunk_layout, merge_longest_common_sequence, transcribe_chunked
from .medusa import medusa_decode_batch, medusa_greedy_decode
from .long_form import (split_windows, transcribe_long, transcribe_long_batch,
                        unpack_long_form)
from .streaming import StreamingTranscriber
from .word_timestamps import WordTiming, find_word_timestamps

__all__ = [
    "BiasTrieState",
    "init_bias_state",
    "bias_bonus",
    "bias_score_adjust",
    "sanitize_bias_spans",
    "seed_bias_state_from_prefix",
    "advance_bias_state",
    "GreedyResult",
    "greedy_decode",
    "speculative_greedy_decode",
    "medusa_greedy_decode",
    "medusa_decode_batch",
    "speculative_decode_batch",
    "load_draft",
    "decode_batch",
    "pack_prefixes",
    "BeamResult",
    "beam_decode",
    "beam_decode_batch",
    "detect_language",
    "resolve_start_tokens",
    "split_windows",
    "transcribe_long",
    "transcribe_chunked",
    "chunk_layout",
    "merge_longest_common_sequence",
    "transcribe_long_batch",
    "unpack_long_form",
    "StreamingTranscriber",
    "WordTiming",
    "find_word_timestamps",
]
