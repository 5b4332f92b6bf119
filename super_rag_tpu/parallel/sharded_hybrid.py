"""Sharded hybrid search: per-chip dense+BM25 top-k, ICI merge, global RRF.

One SPMD program over the corpus mesh running the SAME kernel tiers as the
single-chip path (ops/hybrid.py): per-shard IVF (latency tier) > fused
Pallas flat matmul top-k > blocked XLA dense; inverted BM25 postings with
exact rescoring of the fused candidate pool; a replicated fresh-tail scan
for rows added since lexical compaction.  Every chip contributes its local
candidates to all_gathers (k*devices values each — a few KB over ICI) and
the fused RRF top-k computes replicated.  This is the TPU-native
replacement for SeekDB's internal scatter/gather (SURVEY.md 2.10 'Index
sharding / partial-result merge').
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from super_rag_tpu.ops.bm25 import LexicalCorpus, _bm25_block, _idf_table, bm25_search
from super_rag_tpu.ops.dense import DenseCorpus, Metric, dense_search
from super_rag_tpu.ops.hybrid import (
    HybridResult,
    _rescored_lexical_branch,
    _rrf_on_device,
)
from super_rag_tpu.parallel.mesh import CORPUS_AXIS, SLICE_AXIS, row_axes

NEG_INF = float("-inf")


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "vocab_size", "k", "candidates", "metric",
                     "block_size", "has_scales", "has_inverted",
                     "postings_per_query_term", "use_pallas", "interpret",
                     "dense_tile", "per_tile_k", "int8_queries", "rescore",
                     "has_ivf", "has_ivf_scales", "has_overflow", "nprobe",
                     "ivf_residual",
                     "has_tail"),
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
    ivf_centroids: Optional[jax.Array] = None,  # [n_dev, nlist, D]
    ivf_values: Optional[jax.Array] = None,  # [n_dev, nlist, C, D]
    ivf_scales: Optional[jax.Array] = None,  # [n_dev, nlist, C]
    ivf_row_ids: Optional[jax.Array] = None,  # [n_dev, nlist, C] local ids
    ivf_of_values: Optional[jax.Array] = None,  # [n_dev, M, D] overflow
    ivf_of_scales: Optional[jax.Array] = None,  # [n_dev, M]
    ivf_of_rows: Optional[jax.Array] = None,  # [n_dev, M] local ids, -1 pad
    tail_terms: Optional[jax.Array] = None,  # [T, L] replicated fresh rows
    tail_tfs: Optional[jax.Array] = None,  # [T, L]
    tail_dlen: Optional[jax.Array] = None,  # [T]
    tail_rows: Optional[jax.Array] = None,  # [T] GLOBAL row ids, -1 pad
    tail_keep: Optional[jax.Array] = None,  # [T] bool (validity+filters)
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
    use_pallas: bool = False,
    interpret: bool = False,
    dense_tile: int = 2048,
    per_tile_k: Optional[int] = None,
    int8_queries: bool = False,
    rescore: bool = True,
    has_ivf: bool = False,
    has_ivf_scales: bool = False,
    has_overflow: bool = False,
    ivf_residual: bool = False,
    nprobe: int = 32,
    has_tail: bool = False,
) -> HybridResult:
    n_dev = mesh.devices.size
    shard_rows = values.shape[0] // n_dev
    kc = min(candidates, shard_rows)
    raxes = row_axes(mesh)
    multi_slice = SLICE_AXIS in raxes

    row = P(raxes)
    shard3 = P(raxes, None, None)

    def spec_or_none(cond, spec):
        return spec if cond else P()

    in_specs = (
        P(), P(), P(),  # queries replicated
        P(raxes, None),  # values
        row if has_scales else P(),
        P(raxes, None),  # terms
        P(raxes, None),  # tfs
        row,  # doc_len
        row,  # valid
        P(),  # avgdl
        spec_or_none(has_inverted, shard3),
        spec_or_none(has_inverted, shard3),
        spec_or_none(has_ivf, shard3),
        spec_or_none(has_ivf, P(raxes, None, None, None)),
        spec_or_none(has_ivf and has_ivf_scales, shard3),
        spec_or_none(has_ivf, shard3),
        spec_or_none(has_ivf and has_overflow, shard3),
        spec_or_none(has_ivf and has_overflow, P(raxes, None)),
        spec_or_none(has_ivf and has_overflow, P(raxes, None)),
        P(), P(), P(), P(), P(),  # tail replicated
    )

    def local(qe, qt, qi, v, s, t, f, dl, keep, ad,
              iids, iimp, ivc, ivv, ivs, ivr, ofv, ofs, ofr,
              tt, tf_, tdl, trow, tkeep):
        shard_id = jax.lax.axis_index(CORPUS_AXIS)
        if multi_slice:
            corpus_size = mesh.shape[CORPUS_AXIS]
            shard_id = (jax.lax.axis_index(SLICE_AXIS) * corpus_size
                        + shard_id)
        base = (shard_id * shard_rows).astype(jnp.int32)

        # -- dense tier: IVF > Pallas flat > blocked XLA (ops/hybrid.py) --
        if has_ivf:
            from super_rag_tpu.ops.ivf import IVFIndex, ivf_search

            overflow = None
            of_rows = None
            if has_overflow:
                of_keep = (ofr[0] >= 0) & jnp.take(keep, jnp.maximum(ofr[0], 0))
                overflow = DenseCorpus(
                    values=ofv[0],
                    scales=ofs[0] if has_ivf_scales else None,
                )
                of_rows = ofr[0]
            ivf = IVFIndex(
                centroids=ivc[0], values=ivv[0],
                scales=ivs[0] if has_ivf_scales else None,
                row_ids=ivr[0], overflow=None, overflow_rows=None,
                residual=ivf_residual,
            )
            dv, di = ivf_search(qe, ivf, k=kc, nprobe=nprobe, mask=keep,
                                metric=metric)
            if has_overflow:
                ov, oi_local = dense_search(
                    qe, overflow, k=min(kc, overflow.size),
                    metric=Metric.DOT, mask=of_keep,
                )
                oi = jnp.take(of_rows, oi_local)
                dv = jnp.concatenate([dv, ov], axis=1)
                di = jnp.concatenate([di, oi], axis=1)
                dv, pos = jax.lax.top_k(dv, kc)
                di = jnp.take_along_axis(di, pos, axis=-1)
        elif use_pallas:
            from super_rag_tpu.ops.pallas_topk import pallas_dense_topk

            corpus = DenseCorpus(values=v, scales=s if has_scales else None)
            dv, di = pallas_dense_topk(
                qe, corpus, k=kc, metric=metric, mask=keep, tile=dense_tile,
                int8_queries=int8_queries, per_tile_k=per_tile_k,
                interpret=interpret,
            )
        else:
            corpus = DenseCorpus(values=v, scales=s if has_scales else None)
            dv, di = dense_search(qe, corpus, k=kc, metric=metric, mask=keep,
                                  block_size=block_size)

        # -- lexical tier: inverted postings (+ exact pool rescore) -------
        local_lex = LexicalCorpus(terms=t, tfs=f, doc_len=dl)
        if has_inverted:
            from super_rag_tpu.ops.bm25_inverted import (
                InvertedIndex,
                inverted_bm25_search,
            )

            inv = InvertedIndex(postings_ids=iids[0],
                                postings_impact=iimp[0],
                                num_docs=shard_rows)
            kg = min(2 * kc, shard_rows) if rescore else kc
            lv, li = inverted_bm25_search(
                qt, qi, inv, k=kg, mask=keep, has_mask=True,
                postings_per_query_term=postings_per_query_term,
            )
            if rescore:
                # exact rescoring against the LOCAL doc-major rows — the
                # global merge of exact per-shard scores is then the exact
                # ranking of the pooled candidates (ops/hybrid.py r2)
                lv, li = _rescored_lexical_branch(
                    dv, di.astype(jnp.int32), lv, li.astype(jnp.int32),
                    qt, qi, local_lex, ad, kc, 1.2, 0.75,
                )
        else:
            lv, li = bm25_search(
                qt, qi, local_lex, ad,
                vocab_size=vocab_size, k=kc, mask=keep, block_size=block_size,
            )
        di = jnp.where(di >= 0, di + base, -1).astype(jnp.int32)
        li = jnp.where(li >= 0, li + base, -1).astype(jnp.int32)
        b = qe.shape[0]

        def merge_axis(vals, ids, axis, kk):
            # [B, kc] per shard -> gather along one mesh axis -> local
            # top-k; candidates ride the link, scores stay per-branch
            av = jnp.moveaxis(jax.lax.all_gather(vals, axis), 0, 1)
            ai = jnp.moveaxis(jax.lax.all_gather(ids, axis), 0, 1)
            av = av.reshape(b, -1)
            ai = ai.reshape(b, -1)
            mv, pos = jax.lax.top_k(av, min(kk, av.shape[-1]))
            return mv, jnp.take_along_axis(ai, pos, axis=-1)

        # global per-branch top-candidates, then RRF (ranks must be
        # computed on the GLOBAL ordering, not per shard).  Merge is
        # hierarchical: corpus axis first (ICI), then — only the slice
        # winners, kc candidates each — across the slice axis (DCN).
        gdv, gdi = merge_axis(dv, di, CORPUS_AXIS, kc)
        glv, gli = merge_axis(lv, li, CORPUS_AXIS, n_dev * kc)
        if multi_slice:
            # truncate each slice's lexical pool to its top kc before the
            # DCN hop — the global lexical top-kc is contained in the
            # union of per-slice top-kc (row ids are disjoint per shard)
            glv, pos = jax.lax.top_k(glv, min(kc, glv.shape[-1]))
            gli = jnp.take_along_axis(gli, pos, axis=-1)
            gdv, gdi = merge_axis(gdv, gdi, SLICE_AXIS, kc)
            glv, gli = merge_axis(glv, gli, SLICE_AXIS, glv.shape[-1])
        if has_tail:
            # fresh rows since lexical compaction: scanned doc-major,
            # replicated on every chip (identical result), exact scores
            table = _idf_table(qt, qi, vocab_size)
            ts = _bm25_block(table, tt, tf_, tdl,
                             jnp.maximum(ad.astype(jnp.float32), 1e-6),
                             1.2, 0.75)
            ts = jnp.where(tkeep[None, :], ts, NEG_INF)
            kt = min(kc, ts.shape[1])
            tv, tpos = jax.lax.top_k(ts, kt)
            ti = jnp.take(trow, tpos)
            ti = jnp.where(jnp.isfinite(tv), ti, -1).astype(jnp.int32)
            glv = jnp.concatenate([glv, tv], axis=1)
            gli = jnp.concatenate([gli, ti], axis=1)
            if rescore and has_inverted:
                # a tail row can enter the rescored pool through the dense
                # branch AND the tail scan (equal exact scores) — sort by
                # id and drop adjacent duplicates before the final top_k
                big = jnp.iinfo(jnp.int32).max
                key = jnp.where(gli >= 0, gli, big)
                order = jnp.argsort(key, axis=-1)
                gli = jnp.take_along_axis(gli, order, axis=-1)
                glv = jnp.take_along_axis(glv, order, axis=-1)
                dup = jnp.concatenate(
                    [jnp.zeros_like(gli[:, :1], jnp.bool_),
                     (gli[:, 1:] == gli[:, :-1]) & (gli[:, 1:] >= 0)], axis=1
                )
                glv = jnp.where(dup, NEG_INF, glv)
        glv, pos = jax.lax.top_k(glv, kc)
        gli = jnp.take_along_axis(gli, pos, axis=-1)
        res = _rrf_on_device(gdv, gdi, glv, gli, k, 60.0)
        return res.scores, res.indices, res.dense_scores, res.bm25_scores

    fn = shard_map(
        local, mesh=mesh, in_specs=in_specs,
        out_specs=(P(), P(), P(), P()), check_vma=False,
    )
    dummy = jnp.zeros((), jnp.float32)

    def arg_or_dummy(cond, a):
        return a if cond else dummy

    s_, i_, d_, b_ = fn(
        query_emb, query_terms, query_idf, values,
        scales if has_scales else dummy, terms, tfs, doc_len, valid, avgdl,
        arg_or_dummy(has_inverted, inv_ids),
        arg_or_dummy(has_inverted, inv_impact),
        arg_or_dummy(has_ivf, ivf_centroids),
        arg_or_dummy(has_ivf, ivf_values),
        arg_or_dummy(has_ivf and has_ivf_scales, ivf_scales),
        arg_or_dummy(has_ivf, ivf_row_ids),
        arg_or_dummy(has_ivf and has_overflow, ivf_of_values),
        arg_or_dummy(has_ivf and has_overflow, ivf_of_scales),
        arg_or_dummy(has_ivf and has_overflow, ivf_of_rows),
        arg_or_dummy(has_tail, tail_terms),
        arg_or_dummy(has_tail, tail_tfs),
        arg_or_dummy(has_tail, tail_dlen),
        arg_or_dummy(has_tail, tail_rows),
        arg_or_dummy(has_tail, tail_keep),
    )
    return HybridResult(scores=s_, indices=i_, dense_scores=d_, bm25_scores=b_)
