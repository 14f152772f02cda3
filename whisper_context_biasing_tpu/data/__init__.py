"""Data layer: jsonl prompted datasets, batch collation, device prefetch."""

from .dataset import PromptWhisperDataset, read_jsonl
from .collator import BIAS_SPAN_PAD_ID, IGNORE_INDEX, SpeechSeq2SeqCollator
from .prefetch import BatchLoader, batched_indices, prefetch_to_device

__all__ = [
    "PromptWhisperDataset",
    "read_jsonl",
    "SpeechSeq2SeqCollator",
    "IGNORE_INDEX",
    "BIAS_SPAN_PAD_ID",
    "BatchLoader",
    "batched_indices",
    "prefetch_to_device",
]
