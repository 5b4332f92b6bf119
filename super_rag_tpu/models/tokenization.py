"""Tokenizers feeding the on-TPU encoders.

Two implementations behind one protocol:
  * HashTokenizer — offline, weight-free: words hash into the model vocab
    (pairs with from-scratch/random-init encoders and the demo path).
  * HFTokenizer — wraps a local HuggingFace tokenizer when a real
    checkpoint directory is available (no network access assumed).

Both emit fixed-shape (ids, mask[, type_ids]) batches padded to the
sequence-length buckets in models/encoder.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol, Sequence

import numpy as np

from super_rag_tpu.models.encoder import bucket_length
from super_rag_tpu.tokenize.analyzer import fnv1a32, _WORD_RE, _CJK_RE


class Tokenizer(Protocol):
    def encode_batch(
        self, texts: Sequence[str], max_len: int = 512
    ) -> tuple[np.ndarray, np.ndarray]: ...

    def encode_pairs(
        self, queries: Sequence[str], docs: Sequence[str], max_len: int = 512
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]: ...


@dataclass
class HashTokenizer:
    """Word-level hashing tokenizer: ids in [num_special, vocab)."""

    vocab_size: int = 30522
    pad_id: int = 0
    cls_id: int = 1
    sep_id: int = 2
    num_special: int = 3

    def _word_ids(self, text: str) -> list[int]:
        text = text.lower()
        words = _WORD_RE.findall(text)
        for run in _CJK_RE.findall(text):
            words.extend(run)
        span = self.vocab_size - self.num_special
        return [self.num_special + (fnv1a32(w) % span) for w in words]

    def encode_batch(self, texts, max_len: int = 512):
        rows = [
            [self.cls_id] + self._word_ids(t)[: max_len - 2] + [self.sep_id]
            for t in texts
        ]
        seq = bucket_length(max(len(r) for r in rows)) if rows else 8
        seq = min(seq, max_len)
        ids = np.full((len(rows), seq), self.pad_id, np.int32)
        mask = np.zeros((len(rows), seq), bool)
        for i, r in enumerate(rows):
            r = r[:seq]
            ids[i, : len(r)] = r
            mask[i, : len(r)] = True
        return ids, mask

    def encode_pairs(self, queries, docs, max_len: int = 512):
        assert len(queries) == len(docs)
        rows, types = [], []
        for q, d in zip(queries, docs):
            qi = self._word_ids(q)
            di = self._word_ids(d)
            qi = qi[: max_len // 4]
            di = di[: max_len - len(qi) - 3]
            row = [self.cls_id] + qi + [self.sep_id] + di + [self.sep_id]
            rows.append(row)
            types.append([0] * (len(qi) + 2) + [1] * (len(di) + 1))
        seq = min(bucket_length(max(len(r) for r in rows)), max_len)
        ids = np.full((len(rows), seq), self.pad_id, np.int32)
        mask = np.zeros((len(rows), seq), bool)
        tt = np.zeros((len(rows), seq), np.int32)
        for i, (r, t) in enumerate(zip(rows, types)):
            r, t = r[:seq], t[:seq]
            ids[i, : len(r)] = r
            mask[i, : len(r)] = True
            tt[i, : len(t)] = t
        return ids, mask, tt


class HFTokenizer:
    """Local HuggingFace tokenizer (path-only; never downloads)."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(path, local_files_only=True)

    def encode_batch(self, texts, max_len: int = 512):
        enc = self._tok(
            list(texts), padding=True, truncation=True, max_length=max_len,
            return_tensors="np",
        )
        ids = enc["input_ids"].astype(np.int32)
        seq = min(bucket_length(ids.shape[1]), max_len)
        if seq > ids.shape[1]:
            pad = seq - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, pad)))
            enc["attention_mask"] = np.pad(enc["attention_mask"], ((0, 0), (0, pad)))
        return ids, enc["attention_mask"].astype(bool)

    def encode_pairs(self, queries, docs, max_len: int = 512):
        enc = self._tok(
            list(queries), list(docs), padding=True, truncation=True,
            max_length=max_len, return_tensors="np",
        )
        ids = enc["input_ids"].astype(np.int32)
        seq = min(bucket_length(ids.shape[1]), max_len)
        if seq > ids.shape[1]:
            pad = seq - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, pad)))
            enc["attention_mask"] = np.pad(enc["attention_mask"], ((0, 0), (0, pad)))
            enc["token_type_ids"] = np.pad(enc["token_type_ids"], ((0, 0), (0, pad)))
        return (
            ids,
            enc["attention_mask"].astype(bool),
            enc["token_type_ids"].astype(np.int32),
        )
