"""Fused hybrid search: dense ⊕ BM25 ⊕ RRF in one XLA program.

This is the north-star query path (BASELINE.json): where the reference
runs embed -> SeekDB hybrid query -> merge -> rerank as network hops, the
whole recall+fusion pipeline here is a single jitted program per corpus
capacity class — one dispatch, no host round-trips between stages:

    dense scores  -> per-tile top-K (Pallas on TPU, blocked XLA elsewhere)
    bm25 scores   -> blocked top-K
    RRF           -> rank-based fusion over the two candidate lists
    final top-k   -> ids + fused scores (+ per-branch scores for display)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from super_rag_tpu.ops.bm25 import LexicalCorpus, _bm25_block, _idf_table
from super_rag_tpu.ops.bm25_inverted import InvertedIndex, inverted_bm25_search
from super_rag_tpu.ops.dense import DenseCorpus, Metric, dense_search
from super_rag_tpu.ops.ivf import IVFIndex, ivf_search
from super_rag_tpu.ops.pallas_topk import pallas_dense_topk

NEG_INF = float("-inf")


class HybridResult(NamedTuple):
    scores: jax.Array  # [B, k] fused RRF scores
    indices: jax.Array  # [B, k] corpus rows (-1 = empty)
    dense_scores: jax.Array  # [B, k] dense score of each winner (0 if none)
    bm25_scores: jax.Array  # [B, k] bm25 score of each winner (0 if none)


def _rrf_on_device(
    dv: jax.Array, di: jax.Array,  # dense top-K (scores may be -inf)
    lv: jax.Array, li: jax.Array,  # bm25 top-K
    k: int, rrf_k: float,
) -> HybridResult:
    b, ka = di.shape
    kb = li.shape[1]
    valid_a = jnp.isfinite(dv)
    valid_b = jnp.isfinite(lv) & (lv > 0)  # bm25 score 0 = no term match
    ia = jnp.where(valid_a, di, -1)
    ib = jnp.where(valid_b, li, -1)

    contrib_a = 1.0 / (rrf_k + jnp.arange(ka, dtype=jnp.float32) + 1.0)
    contrib_b = 1.0 / (rrf_k + jnp.arange(kb, dtype=jnp.float32) + 1.0)
    match = (
        (ia[:, :, None] == ib[:, None, :])
        & valid_a[:, :, None]
        & valid_b[:, None, :]
    )
    score_a = jnp.where(
        valid_a,
        contrib_a[None, :]
        + jnp.einsum("bij,j->bi", match.astype(jnp.float32), contrib_b),
        NEG_INF,
    )
    dup_b = jnp.any(match, axis=1)
    score_b = jnp.where(valid_b & ~dup_b, contrib_b[None, :], NEG_INF)

    scores = jnp.concatenate([score_a, score_b], axis=1)
    ids = jnp.concatenate([ia, ib], axis=1)
    # carry branch scores for result display
    d_branch = jnp.concatenate(
        [jnp.where(valid_a, dv, 0.0),
         jnp.zeros_like(lv)], axis=1,
    )
    # bm25 score for dense winners that also matched lexically
    bm_for_a = jnp.einsum(
        "bij,bj->bi", match.astype(jnp.float32), jnp.where(valid_b, lv, 0.0)
    )
    b_branch = jnp.concatenate(
        [bm_for_a, jnp.where(valid_b, lv, 0.0)], axis=1
    )

    k_eff = min(k, ka + kb)
    fv, pos = jax.lax.top_k(scores, k_eff)
    fi = jnp.take_along_axis(ids, pos, axis=-1)
    fi = jnp.where(fv > NEG_INF, fi, -1)
    fd = jnp.take_along_axis(d_branch, pos, axis=-1)
    fb = jnp.take_along_axis(b_branch, pos, axis=-1)
    return HybridResult(scores=fv, indices=fi, dense_scores=fd, bm25_scores=fb)


def _exact_bm25_rescore(
    pool_ids: jax.Array,  # [B, P] int32 corpus rows (-1 = invalid)
    query_terms: jax.Array,  # [B, Q] int32 (pad = vocab_size, deduped)
    query_idf: jax.Array,  # [B, Q] f32
    lexical: LexicalCorpus,
    avgdl: jax.Array,
    k1: float,
    b: float,
) -> jax.Array:
    """Exact BM25 scores of pooled candidates — the fidelity recovery
    stage (ROADMAP r1 item 2): postings truncation distorts the lexical
    branch's candidate ranks, so the fused pool is re-scored against the
    full doc-term rows before fusion.  Matches _bm25_block slot-level
    semantics exactly (same f32 math on the same gathered rows).

    Cost: one [B, P] row gather + a lax.scan over the L doc slots, each
    step a [B, P, Q] one-hot einsum — 6.2 ms at B=512, P=304, L=64 on
    v5e, 1.27x the scan-over-Q layout (scripts/tune_rescore2.py; both
    bit-exact).  A searchsorted/binary-search variant measured 27x
    SLOWER — per-element dynamic gathers do not vectorize on the VPU;
    broadcast compares do.
    """
    safe = jnp.maximum(pool_ids, 0)
    terms = jnp.take(lexical.terms, safe, axis=0)  # [B, P, L]
    tfs = jnp.take(lexical.tfs, safe, axis=0).astype(jnp.float32)
    dl = jnp.take(lexical.doc_len, safe, axis=0).astype(jnp.float32)
    norm = k1 * (1.0 - b + b * dl
                 / jnp.maximum(avgdl.astype(jnp.float32), 1e-6))  # [B, P]

    def step(acc, inp):
        t_l, f_l = inp  # [B, P] one doc slot across the pool
        sat = f_l * (k1 + 1.0) / (f_l + norm)  # 0 where tf=0
        hit = t_l[:, :, None] == query_terms[:, None, :]  # [B, P, Q]
        w = jnp.einsum("bpq,bq->bp", hit.astype(jnp.float32), query_idf)
        return acc + w * sat, None

    init = jnp.zeros(pool_ids.shape, jnp.float32)
    scores, _ = jax.lax.scan(
        step, init, (jnp.moveaxis(terms, 2, 0), jnp.moveaxis(tfs, 2, 0))
    )
    return jnp.where(pool_ids >= 0, scores, NEG_INF)


def _rescored_lexical_branch(
    dv: jax.Array, di: jax.Array,  # dense candidates (scores may be -inf)
    lv: jax.Array, li: jax.Array,  # truncated lexical candidates
    query_terms: jax.Array, query_idf: jax.Array,
    lexical: LexicalCorpus, avgdl: jax.Array,
    kc: int, k1: float, b: float,
) -> tuple[jax.Array, jax.Array]:
    """Re-rank the fused candidate pool by EXACT BM25 and return the top
    ``kc`` as the lexical branch.  Recovers (a) rank distortion from
    postings truncation and (b) lexically-strong docs that only the dense
    branch surfaced."""
    ia = jnp.where(jnp.isfinite(dv), di, -1).astype(jnp.int32)
    ib = jnp.where(jnp.isfinite(lv) & (lv > 0), li, -1).astype(jnp.int32)
    pool = jnp.concatenate([ia, ib], axis=1)  # [B, P]
    # Sort the pool ascending by doc id (invalids last): adjacent compare
    # dedups, and top_k's first-position tie-break then matches the
    # lowest-id-first order of an exact doc-major scan (the fidelity gold).
    key = jnp.where(pool >= 0, pool, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key, axis=-1)
    pool = jnp.take_along_axis(pool, order, axis=-1)
    valid = pool >= 0
    dup = jnp.concatenate(
        [jnp.zeros_like(valid[:, :1]), pool[:, 1:] == pool[:, :-1]], axis=1
    )
    s = _exact_bm25_rescore(pool, query_terms, query_idf, lexical, avgdl,
                            k1, b)
    s = jnp.where(valid & ~dup & (s > 0), s, NEG_INF)
    lv2, pos = jax.lax.top_k(s, min(kc, pool.shape[1]))
    li2 = jnp.take_along_axis(pool, pos, axis=-1)
    return lv2, jnp.where(jnp.isfinite(lv2), li2, -1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "vocab_size", "k", "candidates", "metric", "k1", "b", "rrf_k",
        "use_pallas", "dense_tile", "block_size", "bm25_block_size",
        "postings_per_query_term", "int8_queries", "per_tile_k", "nprobe",
        "tail_offset", "rescore", "lex_gen", "dense_gen", "num_docs",
        "lex_deep_terms", "lex_deep_postings", "lex_approx_topk",
        "dense_approx_topk", "dense_refine",
    ),
)
def hybrid_search(
    query_emb: jax.Array,  # [B, D] f32
    query_terms: jax.Array,  # [B, Q] int32 (pad = vocab_size)
    query_idf: jax.Array,  # [B, Q] f32
    dense: Optional[DenseCorpus],
    lexical: Optional[LexicalCorpus],
    avgdl: jax.Array,  # scalar f32
    inverted: Optional[InvertedIndex] = None,
    ivf: Optional[IVFIndex] = None,
    tail_lexical: Optional[LexicalCorpus] = None,  # fresh rows not yet
    tail_mask: Optional[jax.Array] = None,  # covered by the inverted snapshot
    tail_offset: int = 0,
    *,
    vocab_size: int,
    k: int,
    candidates: int = 100,
    metric: Metric = Metric.COSINE,
    mask: Optional[jax.Array] = None,
    k1: float = 1.2,
    b: float = 0.75,
    rrf_k: float = 60.0,
    use_pallas: bool = False,
    dense_tile: int = 2048,
    block_size: int = 8192,
    bm25_block_size: int = 4096,
    postings_per_query_term: Optional[int] = None,
    int8_queries: bool = False,
    per_tile_k: Optional[int] = None,
    nprobe: int = 32,
    rescore: bool = True,
    lex_gen: Optional[int] = None,
    dense_gen: Optional[int] = None,
    num_docs: Optional[int] = None,
    lex_deep_terms: int = 0,
    lex_deep_postings: Optional[int] = None,
    lex_approx_topk: bool = False,
    dense_approx_topk: bool = False,
    dense_refine: int = 0,
) -> HybridResult:
    """One-program hybrid top-k. ``candidates`` is the per-branch recall
    depth feeding RRF (reference default 100 -> rerank -> top_k).

    ``dense`` may be None when the dense branch is served entirely by
    ``ivf`` (a 10M-row flat copy would double HBM); pass ``num_docs``
    instead.  ``lexical`` is still required for rescoring.

    Dense branch tiers: IVF (``ivf`` given — bytes/query ~ nprobe/nlist,
    the latency tier) > fused Pallas flat (``use_pallas``) > blocked XLA.

    ``rescore`` (inverted path only) re-scores the fused candidate pool
    with exact BM25 before fusion — recovers the fidelity that postings
    truncation costs at negligible QPS.  ``lex_gen`` deepens the lexical
    candidate GENERATION (default 2*candidates): generation depth only
    costs a wider top_k, while the rescoring stage restores exact ranks.
    """
    n = dense.size if dense is not None else num_docs
    kc = min(candidates, n)
    # dense candidate depth for POOL membership (rescoring): deeper dense
    # lists are nearly free (no sort), and a doc at dense rank 100-300
    # with a strong exact BM25 score still reaches the fused top-k via
    # its recovered lexical rank.  RRF's dense branch stays at kc so its
    # rank semantics match the exact gold.
    kd = min(max(kc, dense_gen), n) if dense_gen is not None else kc
    # sign-plane refinement (flat int8 path): phase-1 int8 ranks only
    # have to keep the true winners inside the refine pool
    do_refine = (
        dense_refine > 0 and dense is not None
        and dense.sign_plane is not None
        and metric in (Metric.COSINE, Metric.DOT)
    )
    if do_refine:
        kd = min(max(kd, dense_refine), n)

    if ivf is not None:
        # NOTE: must not be named `b` — that shadows the BM25 length-
        # normalization parameter, which the downstream rescore/tail
        # stages still need (the shadow corrupted every IVF-tier rescore
        # with b=batch_size until the 10M fidelity diag exposed it)
        bsz_ = query_emb.shape[0]
        if bsz_ * nprobe >= ivf.nlist:
            # large-batch tier: the probe union covers the whole index,
            # so probing saves no bytes — one exact MXU scan of every
            # cluster tile beats any probe-driven kernel (measured
            # 54 ms vs 752 ms at b512/10M, scripts/tpu_microbench_flat)
            from super_rag_tpu.ops.ivf import ivf_flat_topk

            dv, di = ivf_flat_topk(query_emb, ivf, k=kd, metric=metric,
                                   mask=mask, approx_topk=dense_approx_topk,
                                   int8_queries=int8_queries)
        elif use_pallas:
            from super_rag_tpu.ops.pallas_ivf import pallas_ivf_topk

            dv, di = pallas_ivf_topk(query_emb, ivf, k=kd, nprobe=nprobe,
                                     mask=mask, metric=metric,
                                     approx_topk=dense_approx_topk)
        else:
            dv, di = ivf_search(query_emb, ivf, k=kd, nprobe=nprobe,
                                mask=mask, metric=metric)
    elif use_pallas:
        dv, di = pallas_dense_topk(
            query_emb, dense, k=kd, metric=metric, mask=mask, tile=dense_tile,
            int8_queries=int8_queries, per_tile_k=per_tile_k,
        )
    else:
        dv, di = dense_search(
            query_emb, dense, k=kd, metric=metric, mask=mask,
            block_size=block_size,
        )
    if do_refine:
        # re-score the pool with codes + 0.25*sign at FULL f32 query
        # precision (ops/ivf.py refine_candidates semantics): halves the
        # int8 quantization noise for 1/8 the memory of the codes, and
        # removes query-quantization error entirely.  Pure XLA gather +
        # einsum on the tiny pool — outside the streaming kernel.
        from super_rag_tpu.ops.ivf import unpack_signs

        qf = query_emb.astype(jnp.float32)
        if metric == Metric.COSINE:
            nrm = jnp.linalg.norm(qf, axis=-1, keepdims=True)
            qf = qf / jnp.where(nrm > 0, nrm, 1.0)
        safe = jnp.maximum(di, 0)
        codes = jnp.take(dense.values, safe, axis=0).astype(jnp.float32)
        sgn = unpack_signs(jnp.take(dense.sign_plane, safe, axis=0))
        scl = jnp.take(dense.scales, safe, axis=0).astype(jnp.float32)
        dots = jnp.einsum("bkd,bd->bk", codes + 0.25 * sgn, qf) * scl
        refined = jnp.where(jnp.isfinite(dv), dots, NEG_INF)
        dv, pos = jax.lax.top_k(refined, refined.shape[1])
        di = jnp.take_along_axis(di, pos, axis=-1)
    dv_pool, di_pool = dv, di
    if kd > kc:
        dv, di = dv[:, :kc], di[:, :kc]

    # BM25 branch.  Preferred path: the inverted index (ops/bm25_inverted
    # — contiguous posting-row gathers + sort-based segment sums; ~1000x
    # less memory traffic than doc-major scanning at 1M docs).  A fresh
    # tail not yet covered by the inverted snapshot scans doc-major over
    # ONLY the tail slice and merges (the NRT-segment pattern).
    if inverted is not None:
        kg = min(lex_gen if lex_gen is not None else 2 * kc, n)
        lv, li = inverted_bm25_search(
            query_terms, query_idf, inverted, k=kg, mask=mask,
            has_mask=mask is not None,
            postings_per_query_term=postings_per_query_term,
            deep_terms=lex_deep_terms, deep_postings=lex_deep_postings,
            approx_topk=lex_approx_topk,
        )
        if tail_lexical is not None:
            table = _idf_table(query_terms, query_idf, vocab_size)
            ts = _bm25_block(
                table, tail_lexical.terms, tail_lexical.tfs,
                tail_lexical.doc_len,
                jnp.maximum(avgdl.astype(jnp.float32), 1e-6), k1, b,
            )
            if tail_mask is not None:
                ts = jnp.where(tail_mask[None, :], ts, NEG_INF)
            kt_tail = min(kg, ts.shape[1])
            tv, ti = jax.lax.top_k(ts, kt_tail)
            ti = (ti + tail_offset).astype(jnp.int32)
            lv = jnp.concatenate([lv, tv], axis=1)
            li = jnp.concatenate([li, ti], axis=1)
            lv, pos = jax.lax.top_k(lv, kg)
            li = jnp.take_along_axis(li, pos, axis=-1)
        if rescore and lexical is not None:
            lv, li = _rescored_lexical_branch(
                dv_pool, di_pool, lv, li.astype(jnp.int32), query_terms,
                query_idf, lexical, avgdl, kc, k1, b,
            )
        elif lv.shape[1] > kc:
            lv, pos = jax.lax.top_k(lv, kc)
            li = jnp.take_along_axis(li, pos, axis=-1)
        return _rrf_on_device(dv, di.astype(jnp.int32), lv,
                              li.astype(jnp.int32), k, rrf_k)

    # Fallback: doc-major blocked scoring (exact, update-free; used for
    # small corpora and the un-compacted fresh tail).
    # NOTE: its block size is intentionally small — the idf gather
    # materializes [B, block, slots] f32 before the reduce, so block
    # bounds peak HBM (4096 * 256 * 64 * 4 = 268 MB; 262144 would be 17 GB).
    block_size = bm25_block_size
    table = _idf_table(query_terms, query_idf, vocab_size)
    avgdl_ = jnp.maximum(avgdl.astype(jnp.float32), 1e-6)
    if n <= block_size:
        s = _bm25_block(table, lexical.terms, lexical.tfs, lexical.doc_len,
                        avgdl_, k1, b)
        if mask is not None:
            s = jnp.where(mask[None, :], s, NEG_INF)
        lv, li = jax.lax.top_k(s, kc)
    else:
        pad = (-n) % block_size
        terms = jnp.pad(lexical.terms, ((0, pad), (0, 0)),
                        constant_values=vocab_size)
        tfs = jnp.pad(lexical.tfs, ((0, pad), (0, 0)))
        dl = jnp.pad(lexical.doc_len, (0, pad), constant_values=1.0)
        keep = jnp.ones((n,), jnp.bool_) if mask is None else mask
        keep = jnp.pad(keep, (0, pad), constant_values=False)
        nb = terms.shape[0] // block_size
        slots = terms.shape[1]

        def body(carry, inp):
            t, f, d, m_, base = inp
            s = _bm25_block(table, t, f, d, avgdl_, k1, b)
            s = jnp.where(m_[None, :], s, NEG_INF)
            v, i = jax.lax.top_k(s, min(kc, block_size))
            return carry, (v, i.astype(jnp.int32) + base)

        _, (vals, idxs) = jax.lax.scan(
            body, None,
            (terms.reshape(nb, block_size, slots),
             tfs.reshape(nb, block_size, slots),
             dl.reshape(nb, block_size),
             keep.reshape(nb, block_size),
             jnp.arange(nb, dtype=jnp.int32) * block_size),
        )
        kb_ = vals.shape[-1]
        bsz = query_emb.shape[0]
        vals = jnp.moveaxis(vals, 0, 1).reshape(bsz, nb * kb_)
        idxs = jnp.moveaxis(idxs, 0, 1).reshape(bsz, nb * kb_)
        lv, pos = jax.lax.top_k(vals, kc)
        li = jnp.take_along_axis(idxs, pos, axis=-1)

    return _rrf_on_device(dv, di.astype(jnp.int32), lv,
                          li.astype(jnp.int32), k, rrf_k)
