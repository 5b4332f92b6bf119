"""On-device cross-encoder rerank service.

Counterpart of the reference's RerankService
(llm/rerank/rerank_service.py:39-135: async_rerank with a 1000-doc cap,
index validation, provider dialects) — but scoring runs on the TPU via
models/cross_encoder.py instead of a remote rerank API.  Pairs are
tokenized host-side, bucketed by sequence length, and scored in fixed
batch shapes so the jit cache stays small.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from super_rag_tpu.models.cross_encoder import CrossEncoder
from super_rag_tpu.models.encoder import EncoderConfig
from super_rag_tpu.models.tokenization import HashTokenizer

MAX_RERANK_DOCS = 1000  # reference cap (rerank_service.py:37)


class RerankService:
    """Callable (query, texts) -> np.ndarray scores, usable directly as
    CollectionEngine/nodeflow's ``reranker``."""

    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        params=None,
        tokenizer=None,
        max_len: int = 256,
        batch_size: int = 32,
        seed: int = 0,
    ):
        self.cfg = config or EncoderConfig(
            vocab_size=30522, hidden_dim=256, num_layers=4, num_heads=8,
            mlp_dim=1024, max_len=512,
        )
        self.model = CrossEncoder(self.cfg)
        self.params = (
            params
            if params is not None
            else self.model.init_params(jax.random.PRNGKey(seed))
        )
        self.tokenizer = tokenizer or HashTokenizer(vocab_size=self.cfg.vocab_size)
        # never tokenize past the position table: Embed(cfg.max_len) is
        # gather-clipped by XLA, so tokens beyond it silently all share
        # the last position embedding (train/serve skew, r4 fix)
        self.max_len = min(max_len, self.cfg.max_len)
        self.batch_size = batch_size

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "RerankService":
        """Load a trained on-TPU cross-encoder (train/rerank.py output);
        picks up the BPE tokenizer sidecar saved next to the weights so
        serving tokenizes exactly like training."""
        import os

        from super_rag_tpu.models.encoder_service import load_params

        params, cfg = load_params(path)
        if "tokenizer" not in kw:
            tok_path = path + ".tokenizer.json"
            if os.path.exists(tok_path):
                from super_rag_tpu.models.subword import BPETokenizer

                kw["tokenizer"] = BPETokenizer.load(tok_path)
        return cls(config=cfg, params=params, **kw)

    @classmethod
    def from_hf_checkpoint(cls, path: str, **kw) -> "RerankService":
        """Load a local BertForSequenceClassification checkpoint."""
        import torch  # noqa: PLC0415 — only for checkpoint IO
        from transformers import AutoConfig

        from super_rag_tpu.models.hf_loader import (
            config_from_hf,
            cross_encoder_params_from_bert,
        )
        from super_rag_tpu.models.tokenization import HFTokenizer

        hf_cfg = AutoConfig.from_pretrained(path, local_files_only=True)
        cfg = config_from_hf(hf_cfg)
        sd = torch.load(f"{path}/pytorch_model.bin", map_location="cpu")
        params = jax.tree.map(jnp.asarray,
                              cross_encoder_params_from_bert(sd, cfg))
        return cls(config=cfg, params=params, tokenizer=HFTokenizer(path), **kw)

    @functools.cached_property
    def _apply(self):
        return jax.jit(
            lambda ids, mask, tt: self.model.apply(
                {"params": self.params}, ids, mask, tt
            )
        )

    def __call__(self, query: str, texts: Sequence[str]) -> np.ndarray:
        texts = list(texts)[:MAX_RERANK_DOCS]
        if not texts:
            return np.zeros(0, np.float32)
        ids, mask, tt = self.tokenizer.encode_pairs(
            [query] * len(texts), texts, max_len=self.max_len
        )
        # pad the pair count to the fixed batch size (bounded jit cache)
        out = np.zeros(len(texts), np.float32)
        bs = self.batch_size
        pad_n = (-len(texts)) % bs
        if pad_n:
            ids = np.pad(ids, ((0, pad_n), (0, 0)))
            mask = np.pad(mask, ((0, pad_n), (0, 0)))
            tt = np.pad(tt, ((0, pad_n), (0, 0)))
        for i in range(0, len(ids), bs):
            scores = self._apply(
                jnp.asarray(ids[i : i + bs]),
                jnp.asarray(mask[i : i + bs]),
                jnp.asarray(tt[i : i + bs]),
            )
            take = min(bs, len(texts) - i)
            if take > 0:
                out[i : i + take] = np.asarray(scores)[:take]
        return out
