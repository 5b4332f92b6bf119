"""Mutable device-resident hybrid index (dense + BM25 + filters).

The TPU-native replacement for a SeekDB collection (reference:
super_rag/vectorstore/seekdb_connector.py — create_collection/add/delete/
search).  XLA buffers are immutable, so mutability is layered on top
(SURVEY.md section 7.4 'Mutable index vs. immutable XLA buffers'):

  * capacity-class arrays — embeddings, BM25 doc-term tables, and filter
    columns are allocated in power-of-two capacities and grown by copy,
    so jitted programs recompile only per capacity class, never per
    insert;
  * a write cursor + validity bitmap — inserts write at the cursor via
    donated dynamic_update_slice (in-place on TPU), deletes just clear
    validity bits; queries always mask by validity, so a consistent
    snapshot is whatever the current buffers say;
  * filter columns as masked scoring — indexer-type codes and a chat hash
    live as small device columns; a query filter compiles to one boolean
    mask fed to the same fused kernels.

Row metadata (chunk text, ids) stays host-side, keyed by row number.
"""

from __future__ import annotations

import functools
import logging
import threading
from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from super_rag_tpu.ops.bm25 import LexicalCorpus, bm25_search
from super_rag_tpu.ops.dense import DenseCorpus, Metric, dense_search
from super_rag_tpu.ops.pallas_topk import pallas_dense_topk
from super_rag_tpu.ops.quant import quantize_int8
from super_rag_tpu.tokenize.analyzer import Analyzer, DocFrequency

logger = logging.getLogger(__name__)

# Indexer-type codes (reference index/base.py IndexType; filterable via
# context/context.py metadata filters).
INDEXER_CODES = {"vector": 0, "summary": 1, "vision": 2, "graph": 3}

WRITE_BLOCK = 256  # inserts are padded to this many rows per device write

# above this f32-corpus size, compact_dense streams the IVF build through
# host chunks instead of materializing the f32 matrix on device
IVF_STREAM_BUILD_BYTES = 2 << 30


@dataclass(frozen=True)
class IndexSpec:
    dim: int
    metric: Metric = Metric.COSINE
    dtype: Any = jnp.bfloat16  # storage dtype: bfloat16 | float32 | int8
    bm25_slots: int = 64
    vocab_size: int = 1 << 17
    min_capacity: int = 4096
    # lexical snapshot layout: "table" = fixed [V, P] impact-truncated
    # postings (cheap, exact for small corpora where P covers the runs);
    # "csr" = full untruncated CSR (every posting stored; query budget is
    # the only truncation — the 10M fidelity fix, DIAG_10M_FIDELITY.json);
    # "auto" = csr once the corpus outgrows what the table cap covers
    lex_tier: str = "auto"
    # auto threshold: with the default P=256 cap a df-heavy term stays
    # exactly covered up to ~P*500 docs (build cap n//500 heuristics);
    # past 2M rows the truncation loss dominates and CSR's extra bytes
    # (~6 B/posting vs the padded table) are the better trade
    csr_auto_rows: int = 2_000_000
    # doc-sharded CSR (ops/bm25_inverted.py CSRInvertedIndex docstring):
    # id-disjoint shards turn the one wide aggregation sort into C
    # parallel narrow ones (~1.6-2.2x fewer bitonic passes at 10M-scale
    # budgets) with exact results; 1 = unsharded
    csr_shards: int = 1


@dataclass(frozen=True)
class FilterSpec:
    """Query-time filter, mirroring the reference's metadata filter DSL
    (context/context.py:50-111: indexer IN index_types OR missing,
    chat_id equality)."""

    indexers: Optional[frozenset[int]] = None  # allowed indexer codes
    chat_hash: Optional[int] = None  # exact chat scope, None = no filter
    doc_rows: Optional[tuple[int, ...]] = None  # restrict to documents


def _chat_hash(chat_id: Optional[str]) -> int:
    if not chat_id:
        return 0
    from super_rag_tpu.tokenize.analyzer import fnv1a32

    h = fnv1a32(chat_id)
    return int(h & 0x7FFFFFFF) or 1


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_block(dst: jax.Array, src: jax.Array, start: jax.Array) -> jax.Array:
    idx = (start,) + (jnp.int32(0),) * (dst.ndim - 1)
    return jax.lax.dynamic_update_slice(dst, src.astype(dst.dtype), idx)


@functools.partial(jax.jit, donate_argnums=(0,))
def _clear_rows(valid: jax.Array, rows: jax.Array) -> jax.Array:
    # rows padded with values >= capacity, which mode='drop' discards.
    # (Padding with -1 would WRAP to the last row — jax negative indexing
    # is in-bounds — silently deleting a live row when size == capacity.)
    return valid.at[rows].set(False, mode="drop")


@functools.partial(jax.jit, static_argnames=("has_chat", "has_indexers"))
def _filter_mask(
    valid: jax.Array,
    indexer_code: jax.Array,
    chat_code: jax.Array,
    allowed_bits: jax.Array,  # uint32 bitmask of allowed indexer codes
    chat_value: jax.Array,
    has_chat: bool,
    has_indexers: bool,
) -> jax.Array:
    m = valid
    if has_indexers:
        bit = (allowed_bits >> indexer_code.astype(jnp.uint32)) & 1
        m = m & (bit == 1)
    if has_chat:
        # chat-scoped rows match their chat; unscoped rows (0) stay
        # visible, mirroring the reference's `OR missing` semantics.
        m = m & ((chat_code == chat_value) | (chat_code == 0))
    return m




@functools.partial(jax.jit, static_argnames=("cosine", "to_int8"))
def _prep_dense(x: jax.Array, cosine: bool, to_int8: bool):
    """Device-side insert prep: normalize (+ squared norms) and optional
    int8 quantization in one program, so encoder output feeds the write
    without a host round-trip."""
    x = x.astype(jnp.float32)
    if cosine:
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = x / jnp.where(n > 0, n, 1.0)
    norms = jnp.sum(x * x, axis=-1)
    if to_int8:
        q, sc = quantize_int8(x)
        return q, sc, norms
    return x, None, norms


def _locked(fn):
    """Serialize index mutations and queries (see _mutex note)."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self._mutex:
            return fn(self, *args, **kwargs)

    return wrapper

class DeviceIndex:
    """One collection's hybrid index on one chip (sharding: parallel/)."""

    def __init__(self, spec: IndexSpec, analyzer: Optional[Analyzer] = None):
        self.spec = spec
        self.analyzer = analyzer or Analyzer(vocab_size=spec.vocab_size)
        assert self.analyzer.vocab_size == spec.vocab_size
        self.df = DocFrequency()
        self.size = 0  # write cursor
        self._capacity = 0
        self.row_meta: list[Optional[dict]] = []
        # inverted lexical snapshot: covers rows [0, _inverted_upto); the
        # fresh tail is scored doc-major until the next compaction
        self._inverted = None
        self._inverted_upto = 0
        self.auto_compact_rows = 8192
        # IVF dense snapshot (opt-in via compact_dense): bounds bytes
        # touched per query to ~nprobe/nlist of the corpus
        self._ivf = None
        self._ivf_upto = 0
        self._ivf_nprobe = 16
        self._ivf_nlist = None
        self._ivf_recall_target = None
        self._ivf_churn = 0  # inserts+deletes since the IVF snapshot
        # serving-time guard for the Pallas per-tile extraction cap: a
        # clustered corpus can concentrate winners in one tile, where a
        # fixed cap silently loses recall — calibrated at compaction.
        # Starts at the measured-lossless 2 (kernels.md stage breakdown:
        # extraction is the dense branch's dominant cost; 2 vs 8 saves
        # ~40% of the k=100 branch with no fidelity change on the bench
        # corpora); calibrate_per_tile_k widens it where the corpus
        # concentrates winners.
        self._per_tile_k = 2
        # guards mutations vs queries: inserts DONATE device buffers
        # (in-place dynamic_update_slice), which invalidates any array
        # reference a concurrently-dispatching query captured — a real
        # race with the background ThreadScheduler (RuntimeError 'Array
        # has been deleted'). Queries and mutations serialize here; the
        # device executes one program at a time anyway.
        self._mutex = threading.RLock()
        self._alloc(spec.min_capacity)

    # -- storage management ------------------------------------------------

    def _alloc(self, capacity: int) -> None:
        spec = self.spec
        old = self._capacity
        grow = lambda a, shape, dtype, fill=0: (
            jnp.full(shape, fill, dtype)
            if old == 0
            else jnp.concatenate(
                [a, jnp.full((shape[0] - old, *shape[1:]), fill, dtype)]
            )
        )
        self.emb = grow(
            getattr(self, "emb", None), (capacity, spec.dim), spec.dtype
        )
        self.scales = (
            grow(getattr(self, "scales", None), (capacity,), jnp.float32)
            if spec.dtype == jnp.int8
            else None
        )
        self.norms_sq = (
            grow(getattr(self, "norms_sq", None), (capacity,), jnp.float32)
            if spec.metric == Metric.L2
            else None
        )
        self.terms = grow(
            getattr(self, "terms", None),
            (capacity, spec.bm25_slots),
            jnp.int32,
            fill=spec.vocab_size,
        )
        self.tfs = grow(
            getattr(self, "tfs", None), (capacity, spec.bm25_slots), jnp.bfloat16
        )
        self.doc_len = grow(getattr(self, "doc_len", None), (capacity,), jnp.float32, 1)
        self.valid = grow(getattr(self, "valid", None), (capacity,), jnp.bool_)
        self.indexer_code = grow(
            getattr(self, "indexer_code", None), (capacity,), jnp.int32
        )
        self.chat_code = grow(getattr(self, "chat_code", None), (capacity,), jnp.int32)
        self._capacity = capacity

    def _ensure_capacity(self, extra: int) -> None:
        need = self.size + extra
        cap = self._capacity
        while cap < need:
            cap *= 2
        if cap != self._capacity:
            self._alloc(cap)

    # -- mutation ------------------------------------------------------------

    @_locked
    def add(
        self,
        embeddings: np.ndarray | jax.Array,  # [M, dim] float
        texts: Sequence[str],
        metadata: Optional[Sequence[dict]] = None,
        indexer: str = "vector",
        chat_id: Optional[str] = None,
    ) -> list[int]:
        """Insert rows; returns their row ids."""
        m = len(texts)
        assert embeddings.shape == (m, self.spec.dim)
        metadata = metadata or [{} for _ in range(m)]
        self._ensure_capacity(m + WRITE_BLOCK)

        device_in = isinstance(embeddings, jax.Array)
        if device_in:
            # embeddings stay on device: normalize/quantize run as one
            # jitted program (per distinct batch size) and never round-
            # trip to host — the encoder's output feeds the write
            # directly while the host analyzes terms below.
            emb_block, scale_block, norms = _prep_dense(
                embeddings,
                cosine=self.spec.metric == Metric.COSINE,
                to_int8=self.spec.dtype == jnp.int8,
            )
        else:
            x = np.asarray(embeddings, np.float32)
            if self.spec.metric == Metric.COSINE:
                n = np.linalg.norm(x, axis=-1, keepdims=True)
                x = x / np.where(n > 0, n, 1.0)
            norms = (x * x).sum(-1).astype(np.float32)
            if self.spec.dtype == jnp.int8:
                qv, qs = quantize_int8(jnp.asarray(x))
                emb_block = np.asarray(qv)
                scale_block = np.asarray(qs)
            else:
                emb_block = x
                scale_block = None

        terms, tfs, lens = self.analyzer.batch_doc_entries(
            list(texts), self.spec.bm25_slots
        )
        # unique terms per row feed the df table
        for r in range(m):
            row_terms = terms[r][terms[r] != self.analyzer.pad_id]
            self.df.add_doc(row_terms.tolist(), int(lens[r]))

        code = INDEXER_CODES.get(indexer, 0)
        chat = _chat_hash(chat_id)

        start = self.size
        # pad to WRITE_BLOCK granularity so insert programs are reused
        pad_m = -(-m // WRITE_BLOCK) * WRITE_BLOCK

        def padded(a, fill=0):
            if isinstance(a, jax.Array):
                return jnp.pad(a, [(0, pad_m - m)] + [(0, 0)] * (a.ndim - 1),
                               constant_values=fill)
            out = np.full((pad_m, *a.shape[1:]), fill, a.dtype)
            out[:m] = a
            return jnp.asarray(out)

        s = jnp.int32(start)
        self.emb = _write_block(self.emb, padded(emb_block), s)
        if self.scales is not None:
            self.scales = _write_block(self.scales, padded(scale_block), s)
        if self.norms_sq is not None:
            self.norms_sq = _write_block(self.norms_sq, padded(norms), s)
        self.terms = _write_block(
            self.terms, padded(terms, fill=self.spec.vocab_size), s
        )
        self.tfs = _write_block(self.tfs, padded(tfs.astype(np.float32)), s)
        self.doc_len = _write_block(
            self.doc_len, padded(np.maximum(lens, 1.0)), s
        )
        vmask = np.zeros(pad_m, bool)
        vmask[:m] = True
        self.valid = _write_block(self.valid, jnp.asarray(vmask), s)
        self.indexer_code = _write_block(
            self.indexer_code, padded(np.full(m, code, np.int32)), s
        )
        self.chat_code = _write_block(
            self.chat_code, padded(np.full(m, chat, np.int32)), s
        )

        rows = list(range(start, start + m))
        self.row_meta.extend(
            {"text": t, **md} for t, md in zip(texts, metadata)
        )
        self.size = start + m
        self._ivf_churn += m
        return rows

    @_locked
    def delete(self, rows: Sequence[int]) -> None:
        if not rows:
            return
        # one batched gather for terms and doc_len: the per-row
        # `self.terms[r]` form costs two device round-trips per row —
        # through the ~30 ms relay a 16k-row delete took 20+ minutes
        # (r5 churn bench); batched it is two round-trips total
        live = [r for r in dict.fromkeys(int(r) for r in rows)
                if r < len(self.row_meta) and self.row_meta[r] is not None]
        if live:
            ridx = jnp.asarray(np.asarray(live, np.int32))
            terms_host = np.asarray(self.terms[ridx])
            lens_host = np.asarray(self.doc_len[ridx])
            for r, row_terms, dl in zip(live, terms_host, lens_host):
                row_terms = row_terms[row_terms != self.analyzer.pad_id]
                self.df.remove_doc(row_terms.tolist(), int(dl))
                self.row_meta[r] = None
        pad = -(-len(rows) // WRITE_BLOCK) * WRITE_BLOCK
        arr = np.full(pad, int(self.valid.shape[0]), np.int32)
        arr[: len(rows)] = rows
        self.valid = _clear_rows(self.valid, jnp.asarray(arr))
        self._ivf_churn += len(rows)

    @property
    def live_count(self) -> int:
        return sum(1 for m_ in self.row_meta if m_ is not None)

    # -- query ---------------------------------------------------------------

    def _mask(self, flt: Optional[FilterSpec]) -> jax.Array:
        if flt is None or (
            flt.indexers is None and flt.chat_hash is None and flt.doc_rows is None
        ):
            return self.valid
        bits = 0
        if flt.indexers is not None:
            for c in flt.indexers:
                bits |= 1 << c
        m = _filter_mask(
            self.valid,
            self.indexer_code,
            self.chat_code,
            jnp.uint32(bits),
            jnp.int32(flt.chat_hash or 0),
            has_chat=flt.chat_hash is not None,
            has_indexers=flt.indexers is not None,
        )
        if flt.doc_rows is not None:
            dm = np.zeros(self._capacity, bool)
            dm[list(flt.doc_rows)] = True
            m = m & jnp.asarray(dm)
        return m

    def dense_corpus(self) -> DenseCorpus:
        return DenseCorpus(
            values=self.emb, scales=self.scales, norms_sq=self.norms_sq
        )

    @_locked
    def compact_dense(self, nlist: Optional[int] = None, nprobe: int = 16,
                      kmeans_iters: int = 8,
                      recall_target: Optional[float] = None,
                      calib_sample: int = 32, calib_k: int = 10) -> None:
        """Build/refresh the IVF snapshot over the live rows (opt-in; the
        flat Pallas path is exact and already fast at 1M rows — IVF is
        the >=10M-rows-per-chip tier, BASELINE.md config #5).

        ``recall_target`` auto-tunes nprobe: after the build, sampled live
        rows are queried through the IVF at doubling nprobe values until
        recall@``calib_k`` against the exact flat search reaches the
        target (reference quality bar: HNSW ef=128 defaults,
        context/context.py:44).  The chosen nprobe becomes the serving
        default; churn (inserts+deletes) past 20% of the snapshot
        triggers a re-cluster with the same settings.
        """
        from super_rag_tpu.ops.ivf import build_ivf, build_ivf_streaming

        n = self.size
        if n == 0:
            return
        if nlist is None:
            nlist = max(16, int(np.sqrt(n)))
        ivf_dtype = (self.spec.dtype if self.spec.dtype != jnp.bfloat16
                     else jnp.bfloat16)
        # build over LIVE rows only: dead rows are masked at query time,
        # but in the build they waste cluster capacity/overflow and probe
        # bandwidth forever (churn decay, found by bench_churn r4)
        valid_np = np.asarray(self.valid[:n])
        live = np.flatnonzero(valid_np).astype(np.int32)
        if live.size == 0:
            return
        all_live = live.size == n
        if n * self.spec.dim * 4 > IVF_STREAM_BUILD_BYTES:
            # corpus-scale build: the f32 transient would not fit HBM
            # next to the live index — stream host chunks instead
            step = 262_144
            scales_np = (np.asarray(self.scales[:n])
                         if self.scales is not None else None)

            def chunks():
                for lo in range(0, n, step):
                    hi = min(lo + step, n)
                    block = np.asarray(
                        self.emb[lo:hi].astype(jnp.float32)
                    )
                    if scales_np is not None:
                        block = block * scales_np[lo:hi, None]
                    if not all_live:
                        block = block[valid_np[lo:hi]]
                    if len(block):
                        yield block

            self._ivf = build_ivf_streaming(
                chunks, nlist=nlist, dtype=ivf_dtype,
                metric=self.spec.metric, kmeans_iters=kmeans_iters,
                ids=None if all_live else live,
            )
        else:
            rows = slice(0, n) if all_live else jnp.asarray(live)
            emb = self.emb[rows]
            if self.scales is not None:
                emb = emb.astype(jnp.float32) * self.scales[rows][:, None]
            self._ivf = build_ivf(
                emb.astype(jnp.float32), nlist=nlist, dtype=ivf_dtype,
                metric=self.spec.metric, kmeans_iters=kmeans_iters,
                ids=None if all_live else live,
            )
        self._ivf_upto = n
        self._ivf_nprobe = nprobe
        self._ivf_nlist = nlist
        self._ivf_recall_target = recall_target
        self._ivf_churn = 0
        if recall_target is not None:
            self._ivf_nprobe = self._calibrate_nprobe(
                nprobe, recall_target, calib_sample, calib_k
            )

    def _sample_queries(self, sample: int, seed: int = 0) -> jax.Array:
        """Query sample for calibration: live rows, slightly perturbed so
        winners aren't trivially the query row itself."""
        live = [r for r, m in enumerate(self.row_meta) if m is not None]
        rng = np.random.default_rng(seed)
        rows = rng.choice(live, size=min(sample, len(live)), replace=False)
        q = np.asarray(self.emb[jnp.asarray(rows)].astype(jnp.float32))
        if self.scales is not None:
            q = q * np.asarray(self.scales[jnp.asarray(rows)])[:, None]
        q = q + 0.05 * rng.standard_normal(q.shape).astype(np.float32)
        return jnp.asarray(q)

    def _calibrate_nprobe(self, nprobe: int, target: float,
                          sample: int, k: int) -> int:
        from super_rag_tpu.ops.ivf import ivf_search

        if self.size < 2 * k:
            return nprobe
        q = self._sample_queries(sample)
        mask = self._mask(None)
        _, gold = dense_search(q, self.dense_corpus(), k=k,
                               metric=self.spec.metric, mask=mask)
        gold = np.asarray(gold)
        np_ = nprobe
        while True:
            _, got = ivf_search(q, self._ivf, k=k, nprobe=np_, mask=mask,
                                metric=self.spec.metric)
            got = np.asarray(got)
            recall = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / k
                for a, b in zip(got, gold)
            ]))
            if recall >= target or np_ >= self._ivf.nlist:
                return min(np_, self._ivf.nlist)
            np_ *= 2

    @_locked
    def calibrate_per_tile_k(self, sample: int = 32, threshold: float = 0.98,
                             k: int = 10, cand: int = 100) -> int:
        """Serving-time exactness guard for the Pallas per-tile extraction
        cap (ops/pallas_topk.py per_tile_k): compares capped vs uncapped
        candidate extraction on sampled queries and widens the cap until
        overlap >= threshold.  Run at compaction cadence."""
        if self.size < 64:
            return self._per_tile_k
        interpret = jax.default_backend() != "tpu"
        tile = 2048 if self._capacity >= 2048 else max(256, self._capacity)
        q = self._sample_queries(sample, seed=1)
        mask = self._mask(None)
        _, gold = pallas_dense_topk(
            q, self.dense_corpus(), k=min(cand, self.size),
            metric=self.spec.metric, mask=mask, tile=tile,
            per_tile_k=None, interpret=interpret,
        )
        gold_sets = [set(r.tolist()) for r in np.asarray(gold)]
        while self._per_tile_k < min(cand, tile):
            _, got = pallas_dense_topk(
                q, self.dense_corpus(), k=min(cand, self.size),
                metric=self.spec.metric, mask=mask, tile=tile,
                per_tile_k=self._per_tile_k, interpret=interpret,
            )
            overlap = float(np.mean([
                len(set(a.tolist()) & g) / max(len(g), 1)
                for a, g in zip(np.asarray(got), gold_sets)
            ]))
            if overlap >= threshold:
                break
            self._per_tile_k *= 2
        return self._per_tile_k

    @_locked
    def search_dense(
        self,
        query_emb: jax.Array,  # [B, dim]
        k: int,
        flt: Optional[FilterSpec] = None,
        use_pallas: Optional[bool] = None,
        nprobe: Optional[int] = None,
    ) -> tuple[jax.Array, jax.Array]:
        mask = self._mask(flt)
        if self._ivf is not None and self._ivf_upto > 0:
            from super_rag_tpu.ops.ivf import ivf_search
            from super_rag_tpu.ops.topk import merge_topk

            if use_pallas is None:
                use_pallas = jax.default_backend() == "tpu"
            if use_pallas:
                # probe-driven streaming kernel: 3.7 ms batch-32 at
                # 1M x 768 vs 22 ms for the XLA gather path
                from super_rag_tpu.ops.pallas_ivf import pallas_ivf_topk

                iv, ii = pallas_ivf_topk(
                    query_emb, self._ivf, k=k,
                    nprobe=nprobe or self._ivf_nprobe, mask=mask,
                    metric=self.spec.metric,
                )
            else:
                iv, ii = ivf_search(
                    query_emb, self._ivf, k=k,
                    nprobe=nprobe or self._ivf_nprobe, mask=mask,
                    metric=self.spec.metric,
                )
            if self._ivf_upto == self.size:
                return iv, ii
            # fresh tail scored flat, prefix masked out
            row_ids = jnp.arange(self._capacity, dtype=jnp.int32)
            tail_mask = mask & (row_ids >= self._ivf_upto)
            tv, ti = dense_search(
                query_emb, self.dense_corpus(), k=k,
                metric=self.spec.metric, mask=tail_mask,
            )
            return merge_topk(
                jnp.concatenate([iv, tv], axis=1),
                jnp.concatenate([ii, ti], axis=1),
                k,
            )
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu" and self._capacity >= 1024
        if use_pallas:
            return pallas_dense_topk(
                query_emb, self.dense_corpus(), k=k, metric=self.spec.metric,
                mask=mask, tile=2048,
            )
        return dense_search(
            query_emb, self.dense_corpus(), k=k, metric=self.spec.metric,
            mask=mask,
        )

    @_locked
    def compact_lexical(self, postings_per_term: int = 256) -> None:
        """(Re)build the inverted lexical snapshot from the live rows.

        Called automatically once the un-inverted tail exceeds
        ``auto_compact_rows``; callable explicitly after bulk ingest.
        """
        from super_rag_tpu.ops.bm25_inverted import build_inverted

        n = self.size
        if n == 0:
            return
        # dead rows are EXCLUDED from the snapshot (terms padded, tf
        # zeroed): they are masked at query time anyway, but left in the
        # build they occupy impact-ordered posting slots and displace
        # live postings from truncated lists — fidelity decays
        # permanently under churn (found by bench_churn r4)
        terms_np = np.asarray(self.terms[:n])
        tfs_np = np.asarray(self.tfs[:n].astype(jnp.float32))
        dead = ~np.asarray(self.valid[:n])
        if dead.any():
            terms_np = terms_np.copy()
            tfs_np = tfs_np.copy()
            terms_np[dead] = self.spec.vocab_size
            tfs_np[dead] = 0.0
        tier = self.spec.lex_tier
        if tier == "auto":
            tier = "csr" if n >= self.spec.csr_auto_rows else "table"
        if tier == "csr":
            from super_rag_tpu.ops.bm25_inverted import build_inverted_csr

            self._inverted = build_inverted_csr(
                terms_np, tfs_np, np.asarray(self.doc_len[:n]),
                self.spec.vocab_size, avgdl=self.df.avgdl,
                shards=self.spec.csr_shards,
            )
        else:
            self._inverted = build_inverted(
                terms_np,
                tfs_np,
                np.asarray(self.doc_len[:n]),
                self.spec.vocab_size,
                postings_per_term=postings_per_term,
                avgdl=self.df.avgdl,
            )
        self._inverted_upto = n
        # compaction cadence doubles as the per-tile-extraction-cap
        # guard cadence (real kernel only — interpret mode at corpus
        # scale would take minutes on CPU)
        if jax.default_backend() == "tpu" and self._capacity >= 2048:
            try:
                self.calibrate_per_tile_k()
            except Exception:  # noqa: BLE001 — guard is best-effort
                logger.exception("per_tile_k calibration failed")

    def _maybe_autocompact(self) -> None:
        tail = self.size - self._inverted_upto
        if self._inverted is None:
            if self.size >= self.auto_compact_rows:
                self.compact_lexical()
        elif tail >= self.auto_compact_rows:
            self.compact_lexical()
        # deletes-aware IVF recluster: churn past 20% of the snapshot (or
        # the tail budget) degrades both recall (stale centroids) and
        # latency (fresh rows scanned flat) — rebuild with the same knobs
        if (self._ivf is not None
                and self._ivf_churn >= max(self.auto_compact_rows,
                                           self._ivf_upto // 5)):
            self.compact_dense(
                nlist=self._ivf_nlist, nprobe=self._ivf_nprobe,
                recall_target=self._ivf_recall_target,
            )

    def _query_arrays(self, queries: Sequence[str], max_terms: int):
        qt = np.full((len(queries), max_terms), self.analyzer.pad_id, np.int32)
        qi = np.zeros((len(queries), max_terms), np.float32)
        for i, q in enumerate(queries):
            qt[i], qi[i] = self.analyzer.query_entry(q, self.df, max_terms)
        return jnp.asarray(qt), jnp.asarray(qi)

    @_locked
    def search_bm25(
        self,
        queries: Sequence[str],
        k: int,
        flt: Optional[FilterSpec] = None,
        max_terms: int = 16,
    ) -> tuple[jax.Array, jax.Array]:
        self._maybe_autocompact()
        qt, qi = self._query_arrays(queries, max_terms)
        mask = self._mask(flt)
        if self._inverted is not None and self._inverted_upto == self.size:
            from super_rag_tpu.ops.bm25_inverted import inverted_bm25_search

            return inverted_bm25_search(qt, qi, self._inverted, k=k,
                                        mask=mask, has_mask=True)
        corpus = LexicalCorpus(
            terms=self.terms, tfs=self.tfs, doc_len=self.doc_len
        )
        if self._inverted is None or self._inverted_upto == 0:
            return bm25_search(
                qt, qi, corpus, jnp.float32(self.df.avgdl),
                vocab_size=self.spec.vocab_size, k=k, mask=mask,
            )
        # inverted prefix + doc-major fresh tail, merged.  Only the tail
        # SLICE is scanned (static per tail capacity class), not the full
        # table under a mask — an O(N) scan per query would defeat the
        # inverted index the moment one row landed after compaction.
        from super_rag_tpu.ops.bm25_inverted import inverted_bm25_search
        from super_rag_tpu.ops.topk import merge_topk

        iv, ii = inverted_bm25_search(qt, qi, self._inverted, k=k,
                                      mask=mask, has_mask=True)
        start, length, tail_lex, tail_mask = self._tail_slice(mask)
        tv, ti = bm25_search(
            qt, qi, tail_lex, jnp.float32(self.df.avgdl),
            vocab_size=self.spec.vocab_size, k=min(k, length),
            mask=tail_mask,
        )
        ti = ti + start
        return merge_topk(
            jnp.concatenate([iv, tv], axis=1),
            jnp.concatenate([ii, ti], axis=1),
            k,
        )

    def _tail_slice(self, mask: jax.Array):
        """Static slice covering rows [inverted_upto, size): returns
        (start, length, LexicalCorpus, tail mask).  start/length are
        Python ints (one compiled program per tail capacity class)."""
        upto = self._inverted_upto
        tail_len = max(1, self.size - upto)
        length = max(WRITE_BLOCK, 1 << (tail_len - 1).bit_length())
        length = min(length, self._capacity)
        start = max(0, min(upto, self._capacity - length))
        sl = slice(start, start + length)
        rows = jnp.arange(start, start + length, dtype=jnp.int32)
        tail_mask = mask[sl] & (rows >= upto)
        tail_lex = LexicalCorpus(
            terms=self.terms[sl], tfs=self.tfs[sl], doc_len=self.doc_len[sl]
        )
        return start, length, tail_lex, tail_mask

    @_locked
    def search_hybrid(
        self,
        query_emb: jax.Array,  # [B, dim]
        queries: Sequence[str],
        k: int,
        candidates: int = 100,
        flt: Optional[FilterSpec] = None,
        max_terms: int = 16,
        use_pallas: Optional[bool] = None,
        rrf_k: float = 60.0,
        rescore: bool = True,
        postings_per_query_term: int = 768,
        lex_deep_terms: int = 0,
        lex_deep_postings: Optional[int] = None,
        lex_approx_topk: bool = False,
    ):
        """Dense ⊕ BM25 ⊕ RRF as ONE device program (ops/hybrid.py); uses
        the inverted lexical snapshot when it covers every row.

        ``rescore`` / ``postings_per_query_term`` are the per-collection
        fidelity-vs-QPS knobs (kernels.md frontier: defaults give
        fidelity >= 0.9; rescore=False trades ~8% fidelity for ~1.8x
        throughput)."""
        from super_rag_tpu.ops.hybrid import hybrid_search

        self._maybe_autocompact()
        qt, qi = self._query_arrays(queries, max_terms)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu" and self._capacity >= 2048
        mask = self._mask(flt)
        inverted = self._inverted
        tail_lex = tail_mask = None
        tail_offset = 0
        if inverted is not None and self._inverted_upto < self.size:
            # fresh rows since compaction: fused program scans just the
            # tail slice alongside the inverted postings
            tail_offset, _tl, tail_lex, tail_mask = self._tail_slice(mask)
        ivf = (
            self._ivf
            if self._ivf is not None and self._ivf_upto == self.size
            else None
        )
        return hybrid_search(
            query_emb,
            qt,
            qi,
            self.dense_corpus(),
            LexicalCorpus(terms=self.terms, tfs=self.tfs, doc_len=self.doc_len),
            jnp.float32(self.df.avgdl),
            inverted=inverted,
            tail_lexical=tail_lex,
            tail_mask=tail_mask,
            tail_offset=tail_offset,
            vocab_size=self.spec.vocab_size,
            k=k,
            candidates=candidates,
            metric=self.spec.metric,
            mask=mask,
            rrf_k=rrf_k,
            use_pallas=use_pallas,
            ivf=ivf,
            nprobe=self._ivf_nprobe,
            # deep candidate lists: cap the in-kernel extraction (profiled
            # 6x batch-latency win at candidates=100; cap calibrated by
            # calibrate_per_tile_k) and the postings per query term
            per_tile_k=(self._per_tile_k
                        if (use_pallas and candidates >= 32) else None),
            rescore=rescore,
            postings_per_query_term=postings_per_query_term,
            lex_deep_terms=lex_deep_terms,
            lex_deep_postings=lex_deep_postings,
            lex_approx_topk=lex_approx_topk,
            int8_queries=use_pallas and self.spec.dtype == jnp.int8,
            # exact final sorts lower to full bitonic sorts on TPU whose
            # cost rivals the scans at >=1M rows; the refine + rescore
            # stages re-rank the pool exactly anyway (kernels.md r3)
            dense_approx_topk=use_pallas,
        )

    # -- snapshot / restore ----------------------------------------------------

    @_locked
    def snapshot_state(self) -> tuple[dict, dict]:
        """(arrays, host_state) — see engine/snapshot.py for file IO."""
        emb = self.emb[: self.size]
        if emb.dtype == jnp.bfloat16:
            # npz cannot represent ml_dtypes.bfloat16 (round-trips as a
            # raw void dtype); store f32 and re-cast on restore
            emb = emb.astype(jnp.float32)
        arrays = {
            "emb": np.asarray(emb),
            "terms": np.asarray(self.terms[: self.size]),
            "tfs": np.asarray(self.tfs[: self.size].astype(jnp.float32)),
            "doc_len": np.asarray(self.doc_len[: self.size]),
            "valid": np.asarray(self.valid[: self.size]),
            "indexer_code": np.asarray(self.indexer_code[: self.size]),
            "chat_code": np.asarray(self.chat_code[: self.size]),
        }
        if self.scales is not None:
            arrays["scales"] = np.asarray(self.scales[: self.size])
        if self.norms_sq is not None:
            arrays["norms_sq"] = np.asarray(self.norms_sq[: self.size])
        host = {
            "spec": {
                "dim": self.spec.dim,
                "metric": self.spec.metric.value,
                "dtype": jnp.dtype(self.spec.dtype).name,
                "bm25_slots": self.spec.bm25_slots,
                "vocab_size": self.spec.vocab_size,
                "min_capacity": self.spec.min_capacity,
            },
            "size": self.size,
            "row_meta": self.row_meta,
            "df": self.df.state(),
        }
        return arrays, host

    @classmethod
    def from_snapshot(cls, arrays: dict, host: dict) -> "DeviceIndex":
        s = host["spec"]
        spec = IndexSpec(
            dim=s["dim"],
            metric=Metric(s["metric"]),
            dtype=jnp.dtype(s["dtype"]),
            bm25_slots=s["bm25_slots"],
            vocab_size=s["vocab_size"],
            min_capacity=s["min_capacity"],
        )
        idx = cls(spec)
        n = host["size"]
        idx._ensure_capacity(n)
        pad = idx._capacity - n

        def put(name, a, fill=0):
            a = np.asarray(a)
            a = np.pad(
                a,
                [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                constant_values=fill,
            )
            setattr(idx, name, jnp.asarray(a).astype(getattr(idx, name).dtype))

        put("emb", arrays["emb"])
        put("terms", arrays["terms"], fill=spec.vocab_size)
        put("tfs", arrays["tfs"])
        put("doc_len", arrays["doc_len"], fill=1)
        put("valid", arrays["valid"])
        put("indexer_code", arrays["indexer_code"])
        put("chat_code", arrays["chat_code"])
        if "scales" in arrays:
            put("scales", arrays["scales"])
        if "norms_sq" in arrays:
            put("norms_sq", arrays["norms_sq"])
        idx.size = n
        idx.row_meta = list(host["row_meta"])
        idx.df = DocFrequency.from_state(host["df"])
        return idx
