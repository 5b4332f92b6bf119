"""JAX dual encoder: on-TPU batch embedding of chunks and queries.

Replaces the reference's remote-HTTP embedding provider
(super_rag/llm/embed/embedding_service.py:168-175 calls litellm.embedding
with a ThreadPoolExecutor) with an in-process flax transformer encoder:
token batches go HBM-resident, the whole embed step is one jitted XLA
program, and batching happens at the device level (bucketed sequence
lengths) instead of 10-doc HTTP requests.

Architecture is a standard post-LN BERT-style encoder with mean pooling
and L2 normalization — the shape used by sentence-embedding checkpoints,
so HF BERT weights map 1:1 (models/hf_loader.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# Sequence-length buckets: pad each batch to the smallest bucket that fits
# so the number of compiled programs stays bounded (XLA static shapes).
SEQ_BUCKETS = (64, 128, 256, 512)


def bucket_length(n: int) -> int:
    for b in SEQ_BUCKETS:
        if n <= b:
            return b
    return SEQ_BUCKETS[-1]


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30522
    hidden_dim: int = 384
    num_layers: int = 6
    num_heads: int = 12
    mlp_dim: int = 1536
    max_len: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    embed_dim: Optional[int] = None  # projection dim; None = hidden_dim
    dtype: jnp.dtype = jnp.bfloat16  # activation dtype

    @property
    def out_dim(self) -> int:
        return self.embed_dim or self.hidden_dim


class SelfAttention(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        h = cfg.hidden_dim
        nh = cfg.num_heads
        hd = h // nh
        dense = lambda name: nn.Dense(h, dtype=cfg.dtype, name=name)
        q = dense("query")(x).reshape(*x.shape[:-1], nh, hd)
        k = dense("key")(x).reshape(*x.shape[:-1], nh, hd)
        v = dense("value")(x).reshape(*x.shape[:-1], nh, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(cfg.dtype)
        att = jnp.where(mask[:, None, None, :], att, -1e9)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(*x.shape)
        return nn.Dense(h, dtype=cfg.dtype, name="out")(out)


class Block(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        # Post-LN (BERT): residual then LayerNorm.
        a = SelfAttention(cfg, name="attention")(x, mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="attention_ln")(x + a)
        m = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype, name="mlp_in")(x)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(cfg.hidden_dim, dtype=cfg.dtype, name="mlp_out")(m)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            name="mlp_ln")(x + m)


class Backbone(nn.Module):
    """Token embeddings + transformer stack; returns per-token states."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, token_ids, mask, token_type_ids=None):
        cfg = self.cfg
        b, s = token_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_dim, dtype=cfg.dtype,
                       name="token_embed")(token_ids)
        pos = nn.Embed(cfg.max_len, cfg.hidden_dim, dtype=cfg.dtype,
                       name="position_embed")(
            jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
        )
        x = tok + pos
        if cfg.type_vocab_size:
            tt = token_type_ids if token_type_ids is not None else jnp.zeros(
                (b, s), jnp.int32
            )
            x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_dim,
                             dtype=cfg.dtype, name="type_embed")(tt)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="embed_ln")(x)
        for li in range(cfg.num_layers):
            x = Block(cfg, name=f"layer_{li}")(x, mask)
        return x


class TextEncoder(nn.Module):
    """Mean-pooled, L2-normalized sentence encoder."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, token_ids, mask, token_type_ids=None):
        x = Backbone(self.cfg, name="backbone")(token_ids, mask, token_type_ids)
        m = mask[..., None].astype(x.dtype)
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0
        )
        if self.cfg.embed_dim and self.cfg.embed_dim != self.cfg.hidden_dim:
            pooled = nn.Dense(self.cfg.embed_dim, dtype=self.cfg.dtype,
                              name="proj")(pooled)
        pooled = pooled.astype(jnp.float32)
        norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        return pooled / jnp.where(norm > 0, norm, 1.0)

    def init_params(self, rng: jax.Array, seq_len: int = 16):
        ids = jnp.zeros((1, seq_len), jnp.int32)
        mask = jnp.ones((1, seq_len), jnp.bool_)
        return self.init(rng, ids, mask)["params"]
