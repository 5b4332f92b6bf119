"""Inverted BM25: impact-ordered postings + sort-based aggregation.

The doc-major scorer (ops/bm25.py) reads every document's term slots per
query — an O(B * N * L) random gather that measured ~1 s/batch at 1M docs
on v5e.  This module is the device-resident *inverted index* the north
star names (SURVEY.md 2.9: 'term-at-a-time scoring as masked segment
sums'), shaped for the TPU:

  postings_ids     [V+1, P] int32   doc rows per term bucket, sorted by
  postings_impact  [V+1, P] bf16    descending impact sat(tf, dl); -1 pad

Query (all inside one jit):
  1. gather the Q posting rows per query — contiguous, tiny (B*Q*P);
  2. weight impacts by per-term idf;
  3. per query, sort the (doc_id, weight) pairs by doc_id and reduce
     equal-id runs with a cumsum/cummax segment-sum — no scatter;
  4. run totals at run ends -> top-k.

Per-term postings are truncated to the top-P impacts (impact-ordered
pruning): rare, discriminative terms keep everything; only the low-impact
tail of very frequent terms is dropped, which top-k scoring almost never
needs.  P is the recall/memory knob.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float("-inf")


class InvertedIndex(NamedTuple):
    postings_ids: jax.Array  # [V+1, P] int32 (-1 = empty)
    postings_impact: jax.Array  # [V+1, P] bf16 (idf NOT included)
    num_docs: int

    @property
    def vocab_size(self) -> int:
        return self.postings_ids.shape[0] - 1

    @property
    def postings_per_term(self) -> int:
        return self.postings_ids.shape[1]


def build_inverted(
    terms: np.ndarray,  # [N, L] int32, pad = vocab_size
    tfs: np.ndarray,  # [N, L] float
    doc_len: np.ndarray,  # [N] float
    vocab_size: int,
    postings_per_term: int = 256,
    k1: float = 1.2,
    b: float = 0.75,
    avgdl: Optional[float] = None,
) -> InvertedIndex:
    """Host-side build: flatten (term, impact, doc) triples, sort by
    (term asc, impact desc), keep the top-P run prefix per term.  The
    group-by-and-select runs in C++ when a compiler is available
    (native/postings.cpp — O(E + E log P) vs the numpy lexsort's
    O(E log E) over E = N*L entries); the numpy path is the verified
    fallback and the two are bit-identical."""
    terms = np.asarray(terms, np.int64)
    tfs = np.asarray(tfs, np.float32)
    doc_len = np.asarray(doc_len, np.float32)
    n, slots = terms.shape
    if avgdl is None:
        avgdl = float(doc_len.mean()) if n else 1.0

    norm = k1 * (1.0 - b + b * doc_len[:, None] / max(avgdl, 1e-6))
    impact = tfs * (k1 + 1.0) / (tfs + norm)  # [N, L]; 0 where tf=0

    if n * slots >= (1 << 18):  # native wins past ~256k entries
        from super_rag_tpu.ops import postings_native

        native = postings_native.build_postings(
            np.minimum(terms, vocab_size).astype(np.int32), impact,
            vocab_size, postings_per_term,
        ) if postings_native.available() else None
        if native is not None:
            ids_n, imp_n = native
            return InvertedIndex(
                postings_ids=jnp.asarray(ids_n),
                postings_impact=jnp.asarray(imp_n, jnp.bfloat16),
                num_docs=n,
            )

    flat_terms = terms.reshape(-1)
    flat_impact = impact.reshape(-1).astype(np.float32)
    flat_docs = np.repeat(np.arange(n, dtype=np.int64), slots)
    keep = flat_terms < vocab_size
    flat_terms, flat_impact, flat_docs = (
        flat_terms[keep], flat_impact[keep], flat_docs[keep]
    )

    # sort by (term, -impact); lexsort's last key is primary
    order = np.lexsort((-flat_impact, flat_terms))
    flat_terms = flat_terms[order]
    flat_impact = flat_impact[order]
    flat_docs = flat_docs[order]

    # rank within each term run; keep rank < P
    is_start = np.empty(len(flat_terms), bool)
    if len(flat_terms):
        is_start[0] = True
        is_start[1:] = flat_terms[1:] != flat_terms[:-1]
    idx = np.arange(len(flat_terms), dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(is_start, idx, 0))
    rank = idx - run_start
    keep = rank < postings_per_term
    t_k, i_k, d_k, r_k = (
        flat_terms[keep], flat_impact[keep], flat_docs[keep], rank[keep]
    )

    ids = np.full((vocab_size + 1, postings_per_term), -1, np.int32)
    imp = np.zeros((vocab_size + 1, postings_per_term), np.float32)
    ids[t_k, r_k] = d_k.astype(np.int32)
    imp[t_k, r_k] = i_k
    return InvertedIndex(
        postings_ids=jnp.asarray(ids),
        postings_impact=jnp.asarray(imp, jnp.bfloat16),
        num_docs=n,
    )


def _segment_sum_runs(ids: jax.Array, w: jax.Array):
    """Per-row: sort (id, w) by id, sum equal-id runs, return run totals at
    run ends (other positions -inf) plus the sorted ids.

    PRECONDITION: ``w >= 0``.  The run base is recovered with a cummax
    over per-run cumsum snapshots, which requires a nondecreasing cumsum;
    BM25 weights (idf * impact, both nonnegative) satisfy this, arbitrary
    signed weights do not."""
    # sort by id; jax.lax.sort applied to (keys, payload) per trailing dim
    sorted_ids, sorted_w = jax.lax.sort((ids, w), dimension=-1, num_keys=1)
    csum = jnp.cumsum(sorted_w, axis=-1)
    lead = [(0, 0)] * (ids.ndim - 1)
    prev = jnp.pad(sorted_ids[..., :-1], lead + [(1, 0)], constant_values=-2)
    is_start = sorted_ids != prev
    # cumsum value just before each run start, propagated across the run
    base_at_start = jnp.where(is_start, csum - sorted_w, NEG_INF)
    run_base = jax.lax.cummax(base_at_start, axis=ids.ndim - 1)
    run_total = csum - run_base
    nxt = jnp.pad(sorted_ids[..., 1:], lead + [(0, 1)], constant_values=-3)
    is_end = sorted_ids != nxt
    totals = jnp.where(is_end & (sorted_ids >= 0), run_total, NEG_INF)
    return sorted_ids, totals


@functools.partial(
    jax.jit, static_argnames=("k", "has_mask", "postings_per_query_term",
                              "deep_terms", "deep_postings", "approx_topk")
)
def inverted_bm25_search(
    query_terms: jax.Array,  # [B, Q] int32, pad = vocab_size
    query_idf: jax.Array,  # [B, Q] f32
    index: InvertedIndex,
    k: int,
    mask: Optional[jax.Array] = None,  # [N] bool keep-mask
    has_mask: Optional[bool] = None,
    postings_per_query_term: Optional[int] = None,
    deep_terms: int = 0,
    deep_postings: Optional[int] = None,
    approx_topk: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Top-k BM25 via the inverted index; same contract as bm25_search.

    ``postings_per_query_term`` optionally caps how many postings each
    query term contributes at QUERY time (rows are impact-sorted, so the
    cap keeps the highest-impact prefix) — it bounds the aggregation sort
    width to B x (Q * cap) independent of the index's build-time P.

    DF-ADAPTIVE BUDGETS (``deep_terms`` > 0): per query row, the
    ``deep_terms`` LOWEST-idf terms — highest df, i.e. exactly the terms
    whose postings the cap truncates — read ``deep_postings`` rows while
    the rest keep the base cap.  Rare terms' lists are complete well
    under the cap, so spending the budget where truncation actually
    happens recovers candidates the uniform cap drops, at a fraction of
    the sort-width cost of deepening every term (ROADMAP r3 item 3).
    Static shapes throughout: the split is a per-row idf argsort + two
    fixed-depth gathers.

    ``approx_topk`` uses lax.approx_max_k for the generation top-k (the
    candidates feed RRF + exact rescoring downstream, so approximate
    extraction is fidelity-safe; measured 16.8 -> 14.0 ms at full depth).
    """
    if has_mask is None:
        has_mask = mask is not None
    if isinstance(index, CSRInvertedIndex):
        # full-index CSR tier (same contract; the pytree type is part of
        # the jit cache key so this branch is static)
        return _csr_bm25_search(
            query_terms, query_idf, index, k, mask, has_mask,
            postings_per_query_term, deep_terms, deep_postings, approx_topk,
        )
    bsz, q = query_terms.shape
    p = index.postings_per_term
    if postings_per_query_term is not None:
        p = min(p, postings_per_query_term)

    def weighted_gather(qt, qidf, depth):
        # gather the posting rows FIRST, then slice to the query-time cap
        # (slicing the whole [V, P] table first would copy it per call)
        ids_ = jnp.take(index.postings_ids, qt, axis=0)[..., :depth]
        imp_ = jnp.take(index.postings_impact, qt,
                        axis=0)[..., :depth].astype(jnp.float32)
        w_ = imp_ * qidf[..., None]
        if has_mask:
            valid = jnp.take(mask, jnp.maximum(ids_, 0)) & (ids_ >= 0)
            ids_ = jnp.where(valid, ids_, -1)
            w_ = jnp.where(valid, w_, 0.0)
        return ids_.reshape(bsz, -1), w_.reshape(bsz, -1)

    s = min(deep_terms, q)
    if s > 0:
        pd = min(deep_postings or index.postings_per_term,
                 index.postings_per_term)
        # per-row split by df: pads (idf<=0) sort LAST, high-df (small
        # positive idf) terms first — those get the deep budget
        key = jnp.where(query_idf > 0, query_idf, jnp.inf)
        order = jnp.argsort(key, axis=1)
        qt_s = jnp.take_along_axis(query_terms, order, axis=1)
        qi_s = jnp.take_along_axis(query_idf, order, axis=1)
        ids_d, w_d = weighted_gather(qt_s[:, :s], qi_s[:, :s], pd)
        ids_r, w_r = weighted_gather(qt_s[:, s:], qi_s[:, s:], p)
        ids = jnp.concatenate([ids_d, ids_r], axis=1)
        w = jnp.concatenate([w_d, w_r], axis=1)
    else:
        ids, w = weighted_gather(query_terms, query_idf, p)

    sorted_ids, totals = _segment_sum_runs(ids, w)
    k_eff = min(k, ids.shape[1])
    if approx_topk:
        v, pos = jax.lax.approx_max_k(totals, k_eff)
    else:
        v, pos = jax.lax.top_k(totals, k_eff)
    i = jnp.take_along_axis(sorted_ids, pos, axis=-1)
    i = jnp.where(jnp.isfinite(v) & (v > 0), i, -1)
    v = jnp.where(i >= 0, v, NEG_INF)
    return v, i


class CSRInvertedIndex(NamedTuple):
    """Full (untruncated) inverted index in CSR layout.

    The fixed-shape ``[V+1, P]`` table above pads every term to P rows,
    which forces a BUILD-time truncation cap: at 10M docs the affordable
    P (1024) stores 0.5% of a df-200k term's postings and lexical
    candidate generation tops out at ~0.45 overlap with the exact gold
    (DIAG_10M_FIDELITY.json).  CSR stores every posting exactly once —
    flat impact-ordered arrays + per-term offsets — so the COMPLETE 10M
    index is ~2.3 GB (384M postings x 6 B) vs the table's 0.75 GB
    truncated / 15.7 GB untruncated.  Query-time prefixes stay
    static-shaped: term t contributes its top-``depth`` impacts via a
    ``offsets[t] + arange(depth)`` gather masked by the run length, so
    the ONLY truncation left is the query-time budget knob (and the
    df-adaptive deep budgets can afford 8k+ on the few terms that need
    it).

    postings_docs    [E] int32   doc rows, term-major, impact-desc in-term
    postings_impact  [E] bf16    sat(tf, dl) impact (idf NOT included)
    offsets          [V+2] int32 run start per term; the pad bucket
                                 (term id == vocab_size) is the empty run
                                 [offsets[V], offsets[V+1])

    DOC-SHARDED LAYOUT (``offsets`` of shape [C, V+2]): postings are
    partitioned by ``doc_id % C`` into C id-disjoint shards, each laid
    out exactly as above (shard-major, term-major, impact-desc in-run).
    Because a document's postings all live in ONE shard, per-shard
    segment-sums are exact and the global top-k equals the top-k of the
    per-shard top-ks — so aggregation runs as C parallel sorts of width
    W/C instead of one sort of width W.  TPU's lax.sort is a bitonic
    network with O(log^2 n) passes, so the same total elements cost
    log^2(W/C)/log^2(W) of the passes (~1.6-2.2x fewer at W=287k,
    C=16-64) and tile far better in VMEM.  Query budgets stay TOTAL
    per-term budgets; each shard reads ceil(budget/C) plus a Poisson
    slack so full-coverage terms stay fully covered (see _shard_depth).
    """

    postings_docs: jax.Array
    postings_impact: jax.Array
    offsets: jax.Array
    num_docs: int

    @property
    def vocab_size(self) -> int:
        return self.offsets.shape[-1] - 2

    @property
    def shards(self) -> int:
        return self.offsets.shape[0] if self.offsets.ndim == 2 else 1

    @property
    def postings_per_term(self) -> int:
        # no build-time cap: the effective per-term depth is query-time
        return self.postings_docs.shape[0]


def build_inverted_csr(
    terms: np.ndarray,  # [N, L] int32, pad = vocab_size
    tfs: np.ndarray,  # [N, L] float
    doc_len: np.ndarray,  # [N] float
    vocab_size: int,
    k1: float = 1.2,
    b: float = 0.75,
    avgdl: Optional[float] = None,
    shards: int = 1,
) -> CSRInvertedIndex:
    """Host-side CSR build: every (term, impact, doc) triple, sorted by
    (term asc, impact desc), with per-term offsets.  Same impact math and
    tie order (stable lowest-doc-first) as build_inverted, minus the cap.
    ``shards`` > 1 partitions postings by doc_id %% shards (id-disjoint,
    exact aggregation per shard — see CSRInvertedIndex docstring)."""
    terms = np.asarray(terms, np.int64)
    tfs = np.asarray(tfs, np.float32)
    doc_len = np.asarray(doc_len, np.float32)
    n, slots = terms.shape
    if avgdl is None:
        avgdl = float(doc_len.mean()) if n else 1.0
    norm = k1 * (1.0 - b + b * doc_len[:, None] / max(avgdl, 1e-6))
    impact = (tfs * (k1 + 1.0) / (tfs + norm)).astype(np.float32)

    flat_terms = terms.reshape(-1)
    keep = flat_terms < vocab_size
    flat_terms = flat_terms[keep]
    flat_impact = impact.reshape(-1)[keep]
    flat_docs = np.repeat(np.arange(n, dtype=np.int64), slots)[keep]
    if shards > 1:
        shard_of = flat_docs % shards
        order = np.lexsort((-flat_impact, flat_terms, shard_of))
    else:
        order = np.lexsort((-flat_impact, flat_terms))
    flat_terms = flat_terms[order]
    flat_impact = flat_impact[order]
    flat_docs = flat_docs[order]

    if shards > 1:
        offsets = _sharded_offsets(
            (flat_docs % shards) * (vocab_size + 1) + flat_terms,
            vocab_size, shards, len(flat_docs))
    else:
        counts = np.bincount(flat_terms, minlength=vocab_size + 1)
        offsets = np.zeros(vocab_size + 2, np.int64)
        np.cumsum(counts, out=offsets[1:])
        assert offsets[-1] == len(flat_docs)
    return CSRInvertedIndex(
        postings_docs=jnp.asarray(flat_docs.astype(np.int32)),
        postings_impact=jnp.asarray(flat_impact, jnp.bfloat16),
        offsets=jnp.asarray(offsets.astype(np.int32)),
        num_docs=n,
    )


def _sharded_offsets(sorted_keys: np.ndarray, vocab_size: int, shards: int,
                     total: int) -> np.ndarray:
    """[C, V+2] run-start table from shard-major (shard*(V+1)+term) keys.
    Row c's trailing entry is the start of shard c+1 (valid because the
    shard sections are contiguous), so every run [off[c,t], off[c,t+1])
    slices without special cases."""
    v1 = vocab_size + 1
    counts = np.bincount(sorted_keys, minlength=shards * v1)
    flat_off = np.zeros(shards * v1 + 1, np.int64)
    np.cumsum(counts, out=flat_off[1:])
    assert flat_off[-1] == total
    offsets = np.empty((shards, v1 + 1), np.int64)
    for c in range(shards):
        offsets[c] = flat_off[c * v1: c * v1 + v1 + 1]
    return offsets


def reshard_csr_host(
    docs: np.ndarray,  # [E] int32, unsharded CSR postings (term-major)
    impact: np.ndarray,  # [E] impact payload (any dtype, carried)
    offsets: np.ndarray,  # [V+2] unsharded run starts
    shards: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Re-partition an existing unsharded CSR into the doc-sharded layout
    WITHOUT rebuilding from the corpus: one stable sort by (shard, term)
    preserves the impact-desc order inside every (shard, term) run.
    Host-side numpy in/out so cached 10M snapshots reshard in-place."""
    v1 = len(offsets) - 1  # term buckets incl. the pad bucket
    counts = np.diff(np.asarray(offsets, np.int64))
    flat_terms = np.repeat(np.arange(v1, dtype=np.int64), counts)
    key = (np.asarray(docs, np.int64) % shards) * v1 + flat_terms
    order = np.argsort(key, kind="stable")
    offsets2d = _sharded_offsets(key[order], v1 - 1, shards, len(docs))
    return docs[order], impact[order], offsets2d


def _shard_depth(depth: int, shards: int) -> int:
    """Per-shard read depth for a TOTAL per-term budget of ``depth``.

    When a term's run is truncated (df >> budget) the per-shard
    impact-prefix is the global prefix split ~evenly, so ceil(depth/C)
    already covers it.  When the budget covers the whole run (df <=
    budget) the per-shard run length is Binomial(df, 1/C) and can exceed
    df/C by a few sigma — the +4*sqrt Poisson slack keeps full-coverage
    terms fully covered so sharded results stay exactly equal to the
    unsharded tier there."""
    base = -(-depth // shards)
    return base + 4 * max(1, int(base ** 0.5)) + 8


def _csr_weighted_gather(index, qt, qidf, depth, mask, has_mask, bsz):
    """Per-term top-``depth`` impact prefix from the CSR flat arrays.

    Unsharded: returns ids/w of [B, W].  Doc-sharded index: returns
    [B, C, Wc] with per-shard budget _shard_depth(depth, C) — id-disjoint
    rows ready for per-shard exact aggregation."""
    sharded = index.offsets.ndim == 2
    if sharded:
        # offsets [C, V+2]; take along the term axis -> [C, B, S]
        start = jnp.take(index.offsets, qt, axis=1)
        length = jnp.take(index.offsets, qt + 1, axis=1) - start
        depth = _shard_depth(depth, index.offsets.shape[0])
    else:
        start = jnp.take(index.offsets, qt)  # [B, S]
        length = jnp.take(index.offsets, qt + 1) - start
    steps = jnp.arange(depth, dtype=jnp.int32)
    pos = start[..., None] + steps  # [(C,) B, S, depth]
    valid = steps < length[..., None]
    pos = jnp.where(valid, pos, 0)
    ids_ = jnp.take(index.postings_docs, pos)
    imp_ = jnp.take(index.postings_impact, pos).astype(jnp.float32)
    w_ = jnp.where(valid, imp_ * qidf[..., None], 0.0)
    ids_ = jnp.where(valid, ids_, -1)
    if has_mask:
        live = jnp.take(mask, jnp.maximum(ids_, 0)) & (ids_ >= 0)
        ids_ = jnp.where(live, ids_, -1)
        w_ = jnp.where(live, w_, 0.0)
    if sharded:
        c = ids_.shape[0]
        return (ids_.transpose(1, 0, 2, 3).reshape(bsz, c, -1),
                w_.transpose(1, 0, 2, 3).reshape(bsz, c, -1))
    return ids_.reshape(bsz, -1), w_.reshape(bsz, -1)


def _csr_bm25_search(
    query_terms, query_idf, index, k, mask, has_mask,
    postings_per_query_term, deep_terms, deep_postings, approx_topk,
):
    """CSR twin of the fixed-table body below; same contract, same
    aggregation (segment-sum over id-sorted runs), only the gather layer
    differs.  Query terms must be < vocab_size or the pad id (== vocab),
    whose CSR run is empty by construction."""
    bsz, q = query_terms.shape
    p = postings_per_query_term or 4096
    s = min(deep_terms, q)
    if s > 0:
        pd = deep_postings or (4 * p)
        key = jnp.where(query_idf > 0, query_idf, jnp.inf)
        order = jnp.argsort(key, axis=1)
        qt_s = jnp.take_along_axis(query_terms, order, axis=1)
        qi_s = jnp.take_along_axis(query_idf, order, axis=1)
        ids_d, w_d = _csr_weighted_gather(index, qt_s[:, :s], qi_s[:, :s],
                                          pd, mask, has_mask, bsz)
        ids_r, w_r = _csr_weighted_gather(index, qt_s[:, s:], qi_s[:, s:],
                                          p, mask, has_mask, bsz)
        ids = jnp.concatenate([ids_d, ids_r], axis=-1)
        w = jnp.concatenate([w_d, w_r], axis=-1)
    else:
        ids, w = _csr_weighted_gather(index, query_terms, query_idf, p,
                                      mask, has_mask, bsz)
    sorted_ids, totals = _segment_sum_runs(ids, w)
    k_eff = min(k, ids.shape[-1])
    if approx_topk:
        v, pos = jax.lax.approx_max_k(totals, k_eff)
    else:
        v, pos = jax.lax.top_k(totals, k_eff)
    i = jnp.take_along_axis(sorted_ids, pos, axis=-1)
    if ids.ndim == 3:
        # doc-sharded tier: shards are id-disjoint, so each shard's exact
        # top-k contains all of its members of the global top-k — merging
        # the C small lists with one cheap exact top-k over C*k_eff
        # candidates reproduces the global result without ever sorting
        # the full width
        c = ids.shape[1]
        v2, sel = jax.lax.top_k(v.reshape(bsz, c * k_eff), min(k, c * k_eff))
        i2 = jnp.take_along_axis(i.reshape(bsz, c * k_eff), sel, axis=-1)
        v, i = v2, i2
    i = jnp.where(jnp.isfinite(v) & (v > 0), i, -1)
    v = jnp.where(i >= 0, v, NEG_INF)
    return v, i
