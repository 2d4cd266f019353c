"""Tokenizer abstraction.

The reference tokenizes queries with sentencepiece T5 and documents with
WordPiece BERT via HuggingFace (main_models.py:797-798).  Both load here when
checkpoints are present on disk; otherwise a deterministic hashing tokenizer
keeps the full pipeline runnable hermetically (tests, airgapped TPU pods).
The model never sees strings — every consumer works on the [B, L] int32
arrays these produce.
"""

from __future__ import annotations

import re
from typing import Sequence

import numpy as np


def fnv1a(data: bytes) -> int:
    """32-bit FNV-1a — shared with the native C++ tokenizer
    (native/gdr_native.cpp) so both paths produce identical ids."""
    h = 0x811C9DC5
    for byte in data:
        h = ((h ^ byte) * 0x01000193) & 0xFFFFFFFF
    return h


class HashTokenizer:
    """Deterministic word-hash tokenizer: token = 2 + (fnv1a(word) % (V-2)).

    Ids 0/1 stay reserved (pad/eos) to match the model's conventions.
    A C++ fast path (gdr_tpu.native) handles batch encoding when the native
    library is built; results are bit-identical to this implementation.
    """

    def __init__(self, vocab_size: int = 32128, lower: bool = True,
                 use_native: bool = True):
        self.vocab_size = vocab_size
        self.lower = lower
        self.use_native = use_native

    def _word_id(self, w: str) -> int:
        return 2 + fnv1a(w.encode()) % (self.vocab_size - 2)

    def encode(self, text: str, max_length: int) -> tuple[np.ndarray, np.ndarray]:
        if self.lower:
            text = text.lower()
        words = re.findall(r"\w+|[^\w\s]", text)[: max_length]
        ids = np.zeros(max_length, np.int32)
        for i, w in enumerate(words):
            ids[i] = self._word_id(w)
        mask = (ids != 0).astype(np.int32)
        return ids, mask

    def encode_batch(self, texts: Sequence[str], max_length: int
                     ) -> tuple[np.ndarray, np.ndarray]:
        if self.use_native:
            from gdr_tpu import native
            if native.available():
                return native.hash_encode_batch(texts, max_length,
                                                self.vocab_size, self.lower)
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            ids[i], mask[i] = self.encode(t, max_length)
        return ids, mask


class HFTokenizer:
    """Wraps a HuggingFace tokenizer behind the same (ids, mask) interface."""

    def __init__(self, name_or_path: str):
        from transformers import AutoTokenizer
        # local_files_only: never block on network (airgapped TPU pods)
        self.tok = AutoTokenizer.from_pretrained(name_or_path,
                                                 local_files_only=True)
        self.vocab_size = self.tok.vocab_size

    def encode(self, text: str, max_length: int):
        out = self.tok(text, max_length=max_length, padding="max_length",
                       truncation=True, return_tensors="np")
        return (out["input_ids"][0].astype(np.int32),
                out["attention_mask"][0].astype(np.int32))

    def encode_batch(self, texts: Sequence[str], max_length: int):
        out = self.tok(list(texts), max_length=max_length,
                       padding="max_length", truncation=True,
                       return_tensors="np")
        return (out["input_ids"].astype(np.int32),
                out["attention_mask"].astype(np.int32))


def load_tokenizer(name_or_path: str | None, vocab_size: int = 32128):
    """Resolve a tokenizer:

    - a ``.json`` file → in-repo trained subword model
      (gdr_tpu/data/subword.py — the reference's sentencepiece/WordPiece
      capability, trainable offline);
    - a directory / HF name → HuggingFace tokenizer (local files only);
    - otherwise the deterministic hash fallback (hermetic).
    """
    if name_or_path:
        import os
        if name_or_path.endswith(".json") and os.path.isfile(name_or_path):
            from gdr_tpu.data.subword import SubwordTokenizer
            return SubwordTokenizer(name_or_path)
        try:
            return HFTokenizer(name_or_path)
        except Exception:
            pass
    return HashTokenizer(vocab_size=vocab_size)
