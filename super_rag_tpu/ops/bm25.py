"""Device-resident BM25: masked scoring over a padded doc-term table.

TPU-native replacement for the full-text half of SeekDB's hybrid query
(reference: super_rag/vectorstore/seekdb_connector.py:98-107).  Instead of
variable-length postings lists (gather/scatter-hostile), every document is
a fixed row of L (term_id, tf) slots — a dense [N, L] tile layout the VPU
streams at full bandwidth:

    idf_table[B, V+1]  scattered once per query batch (pad bucket idf=0)
    score[b, d] = sum_l idf_table[b, terms[d, l]] * sat(tf[d, l], len[d])

where sat is the BM25 tf-saturation.  Saturation is computed on the fly
from raw tf + doc_len (not precomputed impacts) so inserts never force a
corpus-wide reweight when avgdl drifts.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


class LexicalCorpus(NamedTuple):
    """Device-resident BM25 shard.

    terms    [N, L] int32   hashed term buckets, pad rows = vocab_size
    tfs      [N, L] bf16    raw term frequencies (0 in pad slots)
    doc_len  [N]    f32     total token count per doc
    """

    terms: jax.Array
    tfs: jax.Array
    doc_len: jax.Array

    @property
    def size(self) -> int:
        return self.terms.shape[0]

    @property
    def slots(self) -> int:
        return self.terms.shape[1]


def build_lexical_corpus(
    terms: jax.Array, tfs: jax.Array, doc_len: jax.Array
) -> LexicalCorpus:
    return LexicalCorpus(
        terms=terms.astype(jnp.int32),
        tfs=tfs.astype(jnp.bfloat16),
        doc_len=doc_len.astype(jnp.float32),
    )


def _idf_table(
    query_terms: jax.Array,  # [B, Q] int32, padded with vocab_size
    query_idf: jax.Array,  # [B, Q] f32
    vocab_size: int,
) -> jax.Array:
    """Scatter per-query idf into a dense [B, V+1] lookup (pad col = 0)."""
    b, q = query_terms.shape
    table = jnp.zeros((b, vocab_size + 1), jnp.float32)
    rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, q))
    table = table.at[rows, query_terms].set(query_idf)
    return table.at[:, vocab_size].set(0.0)


def _bm25_block(
    idf_table: jax.Array,  # [B, V+1]
    terms: jax.Array,  # [T, L]
    tfs: jax.Array,  # [T, L]
    doc_len: jax.Array,  # [T]
    avgdl: jax.Array,  # scalar
    k1: float,
    b: float,
) -> jax.Array:
    tf = tfs.astype(jnp.float32)
    norm = k1 * (1.0 - b + b * doc_len[:, None] / avgdl)  # [T, 1]
    sat = tf * (k1 + 1.0) / (tf + norm)  # [T, L]; 0 where tf=0
    # Gather the per-query idf of every (doc, slot) term: [B, T, L].
    qw = jnp.take(idf_table, terms, axis=1)
    return jnp.einsum("btl,tl->bt", qw, sat)


@functools.partial(
    jax.jit,
    static_argnames=("vocab_size", "k", "k1", "b", "block_size"),
)
def bm25_search(
    query_terms: jax.Array,
    query_idf: jax.Array,
    corpus: LexicalCorpus,
    avgdl: jax.Array,
    *,
    vocab_size: int,
    k: int,
    mask: Optional[jax.Array] = None,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Top-k BM25 scores of a query batch against a corpus shard.

    ``query_terms [B, Q]`` is padded with ``vocab_size`` (the reserved pad
    bucket, idf pinned to 0); ``query_idf`` carries per-term idf computed
    host-side by tokenize.analyzer.DocFrequency.  Returns (scores [B, k],
    indices [B, k]); masked rows score -inf.
    """
    table = _idf_table(query_terms, query_idf, vocab_size)
    n = corpus.size
    k_eff = min(k, n)
    avgdl = jnp.maximum(avgdl.astype(jnp.float32), 1e-6)

    if n <= block_size:
        s = _bm25_block(
            table, corpus.terms, corpus.tfs, corpus.doc_len, avgdl, k1, b
        )
        if mask is not None:
            s = jnp.where(mask[None, :], s, NEG_INF)
        return jax.lax.top_k(s, k_eff)

    pad = (-n) % block_size
    terms = jnp.pad(corpus.terms, ((0, pad), (0, 0)), constant_values=vocab_size)
    tfs = jnp.pad(corpus.tfs, ((0, pad), (0, 0)))
    dl = jnp.pad(corpus.doc_len, (0, pad), constant_values=1.0)
    keep = jnp.ones((n,), jnp.bool_) if mask is None else mask
    keep = jnp.pad(keep, (0, pad), constant_values=False)
    nb = terms.shape[0] // block_size
    slots = terms.shape[1]

    def body(carry, inp):
        t, f, d, m, base = inp
        s = _bm25_block(table, t, f, d, avgdl, k1, b)
        s = jnp.where(m[None, :], s, NEG_INF)
        v, i = jax.lax.top_k(s, min(k_eff, block_size))
        return carry, (v, i.astype(jnp.int32) + base)

    _, (vals, idxs) = jax.lax.scan(
        body,
        None,
        (
            terms.reshape(nb, block_size, slots),
            tfs.reshape(nb, block_size, slots),
            dl.reshape(nb, block_size),
            keep.reshape(nb, block_size),
            jnp.arange(nb, dtype=jnp.int32) * block_size,
        ),
    )
    kb = vals.shape[-1]
    bsz = query_terms.shape[0]
    vals = jnp.moveaxis(vals, 0, 1).reshape(bsz, nb * kb)
    idxs = jnp.moveaxis(idxs, 0, 1).reshape(bsz, nb * kb)
    fv, pos = jax.lax.top_k(vals, k_eff)
    return fv, jnp.take_along_axis(idxs, pos, axis=-1)
