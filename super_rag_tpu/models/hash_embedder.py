"""Deterministic hash embedder — the weight-free stand-in encoder.

The reference's tests hit live embedding APIs (SURVEY.md section 4); here
every test and the demo path run a fully deterministic embedder: terms
hash to buckets (tokenize/analyzer.py), each bucket owns a fixed random
projection row, and a document embeds as the L2-normalized mean of its
term rows.  Same text -> same vector across processes, no weights, and
similar texts share terms so retrieval behaves qualitatively like a real
encoder.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from super_rag_tpu.tokenize.analyzer import Analyzer


@functools.lru_cache(maxsize=8)
def _projection(buckets: int, dim: int, seed: int) -> np.ndarray:
    # NumPy (not jax.random) so the cached table is always concrete —
    # a jax array created under an active trace would leak tracers.
    rng = np.random.default_rng(seed)
    # f32 draw: numpy's f64 normal path is ~50x slower on this host,
    # and at vocab 1<<17 x dim 768 the f64 table took minutes per process
    table = rng.standard_normal((buckets + 1, dim), dtype=np.float32)
    table[buckets] = 0.0  # pad bucket row is zero
    return table


@dataclass
class HashEmbedder:
    dim: int = 256
    buckets: int = 1 << 14
    seed: int = 7
    max_terms: int = 64
    analyzer: Analyzer = field(default_factory=lambda: Analyzer(vocab_size=1 << 14))

    def __post_init__(self):
        if self.analyzer.vocab_size != self.buckets:
            self.analyzer = Analyzer(vocab_size=self.buckets)

    def _ids(self, texts: list[str]) -> np.ndarray:
        out = np.full((len(texts), self.max_terms), self.buckets, np.int32)
        for i, t in enumerate(texts):
            ids = self.analyzer.term_ids(t)[: self.max_terms]
            out[i, : len(ids)] = ids
        return out

    def embed(self, texts: list[str]) -> jax.Array:
        """[len(texts), dim] L2-normalized embeddings."""
        ids = jnp.asarray(self._ids(texts))
        table = jnp.asarray(_projection(self.buckets, self.dim, self.seed))
        return _embed_ids(ids, table, self.buckets)


@functools.partial(jax.jit, static_argnames=("buckets",))
def _embed_ids(ids: jax.Array, table: jax.Array, buckets: int) -> jax.Array:
    vecs = jnp.take(table, ids, axis=0)  # [B, L, D]; pad rows are zero
    count = jnp.sum(ids != buckets, axis=1, keepdims=True).astype(jnp.float32)
    mean = jnp.sum(vecs, axis=1) / jnp.maximum(count, 1.0)
    norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
    return mean / jnp.where(norm > 0, norm, 1.0)
