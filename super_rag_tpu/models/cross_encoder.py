"""On-device cross-encoder reranker.

Replaces the reference's remote rerank API calls
(super_rag/llm/rerank/rerank_service.py:95-104 litellm.arerank /
DashScope HTTP dialect) with a sequence-pair classifier scored on-TPU:
top-K candidates from hybrid search are tokenized as
[CLS] query [SEP] doc [SEP] pairs and scored in one batched forward pass,
fusible into the same XLA program as the search (BASELINE.md config #4:
top-100 -> top-5).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_rag_tpu.models.encoder import Backbone, EncoderConfig


class CrossEncoder(nn.Module):
    """CLS-pooled pair scorer; higher = more relevant."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, token_ids, mask, token_type_ids=None):
        x = Backbone(self.cfg, name="backbone")(token_ids, mask, token_type_ids)
        cls = x[:, 0, :]
        # BERT pooler: tanh(dense(CLS)), then a 1-dim classification head.
        pooled = jnp.tanh(
            nn.Dense(self.cfg.hidden_dim, dtype=self.cfg.dtype, name="pooler")(cls)
        )
        score = nn.Dense(1, dtype=jnp.float32, name="classifier")(
            pooled.astype(jnp.float32)
        )
        return score[..., 0]

    def init_params(self, rng: jax.Array, seq_len: int = 16):
        ids = jnp.zeros((1, seq_len), jnp.int32)
        mask = jnp.ones((1, seq_len), jnp.bool_)
        return self.init(rng, ids, mask)["params"]


def rerank_scores(
    model: CrossEncoder,
    params,
    token_ids: jax.Array,  # [B*K, S] packed pairs
    mask: jax.Array,
    token_type_ids: jax.Array | None = None,
) -> jax.Array:
    return model.apply({"params": params}, token_ids, mask, token_type_ids)
