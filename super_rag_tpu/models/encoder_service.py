"""EncoderService: the on-TPU batch embedder behind the engine.

The north star replaces remote embedding HTTP calls with 'a JAX batch
encoder for embeddings' (BASELINE.json).  This service wraps TextEncoder
with tokenization, sequence-length bucketing, and fixed batch shapes
(bounded jit cache), and satisfies the engine's embedder protocol
(.embed(texts) -> [B, dim], .dim).  Parameters load from an npz
checkpoint (scripts/train_encoder.py writes them) or a local HF BERT
checkpoint, or initialize randomly for from-scratch training.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from super_rag_tpu.models.encoder import EncoderConfig, TextEncoder
from super_rag_tpu.models.tokenization import HashTokenizer


def save_params(params, path: str, cfg: EncoderConfig) -> None:
    """Flatten the param tree into an npz + config sidecar."""
    import json

    flat = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(tree)

    walk(params)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path + ".npz", **flat)
    cfg_dict = {k: (v if not hasattr(v, "dtype") else str(v))
                for k, v in cfg.__dict__.items()}
    cfg_dict["dtype"] = jnp.dtype(cfg.dtype).name
    with open(path + ".json", "w") as f:
        json.dump(cfg_dict, f)


def load_params(path: str) -> tuple[dict, EncoderConfig]:
    import json

    with open(path + ".json") as f:
        cfg_dict = json.load(f)
    cfg_dict["dtype"] = jnp.dtype(cfg_dict["dtype"])
    if cfg_dict.get("embed_dim") is not None:
        cfg_dict["embed_dim"] = int(cfg_dict["embed_dim"])
    cfg = EncoderConfig(**cfg_dict)
    tree: dict = {}
    with np.load(path + ".npz") as z:
        for key in z.files:
            parts = key.split("/")
            cur = tree
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
            cur[parts[-1]] = jnp.asarray(z[key])
    return tree, cfg


class EncoderService:
    """Batch embedder over TextEncoder with bucketed fixed shapes."""

    def __init__(self, cfg: Optional[EncoderConfig] = None, params=None,
                 tokenizer=None, batch_size: int = 128, max_len: int = 256,
                 seed: int = 0):
        self.cfg = cfg or EncoderConfig(
            vocab_size=30522, hidden_dim=256, num_layers=4, num_heads=8,
            mlp_dim=1024, max_len=512,
        )
        self.model = TextEncoder(self.cfg)
        self.params = (
            params if params is not None
            else self.model.init_params(jax.random.PRNGKey(seed))
        )
        self.tokenizer = tokenizer or HashTokenizer(
            vocab_size=self.cfg.vocab_size
        )
        self.batch_size = batch_size
        self.max_len = min(max_len, self.cfg.max_len)

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "EncoderService":
        params, cfg = load_params(path)
        # a trained subword tokenizer saved next to the weights travels
        # with them — serving must tokenize exactly like training did
        if "tokenizer" not in kw:
            tok_path = path + ".tokenizer.json"
            if os.path.exists(tok_path):
                from super_rag_tpu.models.subword import BPETokenizer

                kw["tokenizer"] = BPETokenizer.load(tok_path)
        return cls(cfg=cfg, params=params, **kw)

    @classmethod
    def from_hf_checkpoint(cls, path: str, **kw) -> "EncoderService":
        import torch
        from transformers import AutoConfig

        from super_rag_tpu.models.hf_loader import (
            config_from_hf,
            encoder_params_from_bert,
        )
        from super_rag_tpu.models.tokenization import HFTokenizer

        hf_cfg = AutoConfig.from_pretrained(path, local_files_only=True)
        cfg = config_from_hf(hf_cfg)
        sd = torch.load(os.path.join(path, "pytorch_model.bin"),
                        map_location="cpu")
        params = jax.tree.map(jnp.asarray, encoder_params_from_bert(sd, cfg))
        return cls(cfg=cfg, params=params, tokenizer=HFTokenizer(path), **kw)

    @property
    def dim(self) -> int:
        return self.cfg.out_dim

    @functools.cached_property
    def _apply(self):
        return jax.jit(
            lambda ids, mask: self.model.apply({"params": self.params},
                                               ids, mask)
        )

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        texts = list(texts)
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        out = np.zeros((len(texts), self.dim), np.float32)
        bs = self.batch_size
        for i in range(0, len(texts), bs):
            block = texts[i : i + bs]
            ids, mask = self.tokenizer.encode_batch(block, max_len=self.max_len)
            # pad the batch dim to the fixed size (bounded jit cache:
            # one program per (bucketed seq len))
            pad_n = bs - len(block)
            if pad_n:
                ids = np.pad(ids, ((0, pad_n), (0, 0)))
                mask = np.pad(mask, ((0, pad_n), (0, 0)))
            vecs = self._apply(jnp.asarray(ids), jnp.asarray(mask))
            out[i : i + len(block)] = np.asarray(vecs)[: len(block)]
        return out

    def embed_device(self, texts: Sequence[str]) -> jax.Array:
        """Like embed() but the result STAYS ON DEVICE (no host sync):
        downstream index writes consume it directly, so tokenization of
        the next batch overlaps the forward pass (ingest pipelining)."""
        texts = list(texts)
        if not texts:
            return jnp.zeros((0, self.dim), jnp.float32)
        outs = []
        bs = self.batch_size
        for i in range(0, len(texts), bs):
            block = texts[i : i + bs]
            ids, mask = self.tokenizer.encode_batch(block, max_len=self.max_len)
            pad_n = bs - len(block)
            if pad_n:
                ids = np.pad(ids, ((0, pad_n), (0, 0)))
                mask = np.pad(mask, ((0, pad_n), (0, 0)))
            outs.append(self._apply(jnp.asarray(ids), jnp.asarray(mask)))
        full = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return full[: len(texts)]
