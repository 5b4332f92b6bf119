"""Sharded hybrid search: per-chip dense+BM25 top-k, ICI merge, global RRF.

One SPMD program over the corpus mesh: every chip scores its row shard
with the same kernels as the single-chip path (dense blocked matmul
top-k, doc-major BM25), contributes its local candidates to two
all_gathers (k*devices values each — a few KB over ICI), and the fused
RRF top-k computes replicated.  This is the TPU-native replacement for
SeekDB's internal scatter/gather (SURVEY.md 2.10 'Index sharding /
partial-result merge').
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from super_rag_tpu.ops.bm25 import LexicalCorpus, bm25_search
from super_rag_tpu.ops.dense import DenseCorpus, Metric, dense_search
from super_rag_tpu.ops.hybrid import HybridResult, _rrf_on_device
from super_rag_tpu.parallel.mesh import CORPUS_AXIS


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "vocab_size", "k", "candidates", "metric",
                     "block_size", "has_scales", "has_inverted",
                     "postings_per_query_term"),
)
def sharded_hybrid_search(
    query_emb: jax.Array,  # [B, D] replicated
    query_terms: jax.Array,  # [B, Q]
    query_idf: jax.Array,  # [B, Q]
    values: jax.Array,  # [N, D] row-sharded
    scales: Optional[jax.Array],  # [N] row-sharded (int8) or None
    terms: jax.Array,  # [N, L] row-sharded
    tfs: jax.Array,  # [N, L] row-sharded
    doc_len: jax.Array,  # [N] row-sharded
    valid: jax.Array,  # [N] bool row-sharded
    avgdl: jax.Array,  # scalar
    inv_ids: Optional[jax.Array] = None,  # [n_dev, V+1, P] shard postings
    inv_impact: Optional[jax.Array] = None,  # [n_dev, V+1, P]
    *,
    mesh: Mesh,
    vocab_size: int,
    k: int,
    candidates: int = 100,
    metric: Metric = Metric.COSINE,
    block_size: int = 4096,
    has_scales: bool = False,
    has_inverted: bool = False,
    postings_per_query_term: Optional[int] = 256,
) -> HybridResult:
    n_dev = mesh.devices.size
    shard_rows = values.shape[0] // n_dev
    kc = min(candidates, shard_rows)

    row = P(CORPUS_AXIS)
    in_specs = (
        P(), P(), P(),  # queries replicated
        P(CORPUS_AXIS, None),  # values
        row if has_scales else P(),
        P(CORPUS_AXIS, None),  # terms
        P(CORPUS_AXIS, None),  # tfs
        row,  # doc_len
        row,  # valid
        P(),  # avgdl
        P(CORPUS_AXIS, None, None) if has_inverted else P(),  # inv ids
        P(CORPUS_AXIS, None, None) if has_inverted else P(),  # inv impact
    )

    def local(qe, qt, qi, v, s, t, f, dl, keep, ad, iids, iimp):
        shard_id = jax.lax.axis_index(CORPUS_AXIS)
        base = shard_id * shard_rows
        corpus = DenseCorpus(values=v, scales=s if has_scales else None)
        dv, di = dense_search(qe, corpus, k=kc, metric=metric, mask=keep,
                              block_size=block_size)
        if has_inverted:
            # per-shard inverted postings (local doc ids); the validity
            # mask is the shard's slice
            from super_rag_tpu.ops.bm25_inverted import (
                InvertedIndex,
                inverted_bm25_search,
            )

            inv = InvertedIndex(postings_ids=iids[0],
                                postings_impact=iimp[0],
                                num_docs=shard_rows)
            lv, li = inverted_bm25_search(
                qt, qi, inv, k=kc, mask=keep, has_mask=True,
                postings_per_query_term=postings_per_query_term,
            )
        else:
            lv, li = bm25_search(
                qt, qi, LexicalCorpus(terms=t, tfs=f, doc_len=dl), ad,
                vocab_size=vocab_size, k=kc, mask=keep, block_size=block_size,
            )
        di = (di + base).astype(jnp.int32)
        li = (li + base).astype(jnp.int32)
        # candidates ride ICI; [n_dev, B, kc] each
        adv = jax.lax.all_gather(dv, CORPUS_AXIS)
        adi = jax.lax.all_gather(di, CORPUS_AXIS)
        alv = jax.lax.all_gather(lv, CORPUS_AXIS)
        ali = jax.lax.all_gather(li, CORPUS_AXIS)
        b = qe.shape[0]

        def flat(x):
            return jnp.moveaxis(x, 0, 1).reshape(b, n_dev * kc)

        # global per-branch top-candidates, then RRF (ranks must be
        # computed on the GLOBAL ordering, not per shard)
        gdv, pos = jax.lax.top_k(flat(adv), kc)
        gdi = jnp.take_along_axis(flat(adi), pos, axis=-1)
        glv, pos = jax.lax.top_k(flat(alv), kc)
        gli = jnp.take_along_axis(flat(ali), pos, axis=-1)
        res = _rrf_on_device(gdv, gdi, glv, gli, k, 60.0)
        return res.scores, res.indices, res.dense_scores, res.bm25_scores

    fn = shard_map(
        local, mesh=mesh, in_specs=in_specs,
        out_specs=(P(), P(), P(), P()), check_vma=False,
    )
    dummy = jnp.zeros((), jnp.float32)
    s_, i_, d_, b_ = fn(
        query_emb, query_terms, query_idf, values,
        scales if has_scales else dummy, terms, tfs, doc_len, valid, avgdl,
        inv_ids if has_inverted else dummy,
        inv_impact if has_inverted else dummy,
    )
    return HybridResult(scores=s_, indices=i_, dense_scores=d_, bm25_scores=b_)
