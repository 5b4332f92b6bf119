"""Collection-level query engine: embed ⊕ dense ⊕ BM25 ⊕ RRF ⊕ rerank.

This is the on-device replacement for the reference's query-time pipeline
(call stack SURVEY.md section 3.1): where the reference's nodeflow runs
vector_search (HTTP embed + SeekDB query) -> merge -> rerank (HTTP) as
separate network hops, here the stages are jitted device programs over a
shared DeviceIndex, and the nodeflow nodes (nodeflow/runners/) become thin
wrappers over these methods.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from super_rag_tpu.engine.index import DeviceIndex, FilterSpec, IndexSpec, _chat_hash
from super_rag_tpu.engine.index import INDEXER_CODES
from super_rag_tpu.models.hash_embedder import HashEmbedder


@dataclass
class SearchHit:
    row: int
    score: float
    text: str
    metadata: dict
    recall_type: str  # vector_search | fulltext_search | hybrid | reranked


class CollectionEngine:
    """One collection: a DeviceIndex + an embedder (+ optional reranker).

    ``embedder`` is any object with ``embed(list[str]) -> [B, dim]``;
    the default HashEmbedder keeps the engine fully self-contained
    (reference tests depended on live HTTP embedding APIs; ours don't).
    ``reranker`` is an optional callable ``(query, texts) -> scores``.
    """

    def __init__(
        self,
        spec: IndexSpec,
        embedder: Optional[Any] = None,
        reranker: Optional[Callable[[str, Sequence[str]], np.ndarray]] = None,
        hybrid_opts: Optional[dict] = None,
    ):
        self.index = DeviceIndex(spec)
        self.embedder = embedder or HashEmbedder(dim=spec.dim)
        self.reranker = reranker
        # per-collection fidelity-vs-QPS knobs forwarded to the fused
        # program (collection config {"hybrid": {"rescore": ...,
        # "postings_per_query_term": ...}}; kernels.md frontier)
        self.hybrid_opts = hybrid_opts or {}

    # -- ingest ---------------------------------------------------------------

    def ingest(
        self,
        texts: Sequence[str],
        metadata: Optional[Sequence[dict]] = None,
        indexer: str = "vector",
        chat_id: Optional[str] = None,
        embeddings: Optional[np.ndarray] = None,
    ) -> list[int]:
        # keep the embedding on device when the embedder supports it:
        # normalize/quantize/write run as async device programs while the
        # host analyzes terms for the next batch (ingest pipelining).
        # ``embeddings`` overrides the text embedder (e.g. vision rows
        # store an IMAGE vector while the caption text feeds BM25).
        if embeddings is not None:
            emb = np.asarray(embeddings, np.float32)
        elif hasattr(self.embedder, "embed_device"):
            emb = self.embedder.embed_device(list(texts))
        else:
            emb = self.embedder.embed(list(texts))
            if not isinstance(emb, jax.Array):
                emb = np.asarray(emb)
        return self.index.add(
            emb, texts, metadata, indexer=indexer, chat_id=chat_id
        )

    def delete(self, rows: Sequence[int]) -> None:
        self.index.delete(rows)

    # -- search ---------------------------------------------------------------

    def _filter(
        self,
        index_types: Optional[Sequence[str]],
        chat_id: Optional[str],
        doc_rows: Optional[Sequence[int]],
    ) -> Optional[FilterSpec]:
        if index_types is None and chat_id is None and doc_rows is None:
            return None
        codes = (
            frozenset(INDEXER_CODES[t] for t in index_types)
            if index_types is not None
            else None
        )
        return FilterSpec(
            indexers=codes,
            chat_hash=_chat_hash(chat_id) if chat_id else None,
            doc_rows=tuple(doc_rows) if doc_rows is not None else None,
        )

    def _hits(
        self, scores: np.ndarray, rows: np.ndarray, recall_type: str,
        min_score: Optional[float] = None,
    ) -> list[SearchHit]:
        out = []
        for s, r in zip(scores, rows):
            r = int(r)
            if r < 0 or not np.isfinite(s):
                continue
            if min_score is not None and s < min_score:
                continue
            meta = self.index.row_meta[r]
            if meta is None:
                continue
            md = {k: v for k, v in meta.items() if k != "text"}
            out.append(
                SearchHit(row=r, score=float(s), text=meta["text"],
                          metadata=md, recall_type=recall_type)
            )
        return out

    def search_by_image(self, image: bytes, top_k: int = 5,
                        chat_id: Optional[str] = None) -> list[SearchHit]:
        """Image->image retrieval over vision rows (their dense vectors
        are image embeddings; see tasks/document.py vision branch)."""
        from super_rag_tpu.models.image_embedder import ImageEmbedder

        if self.index.size == 0:
            return []
        q = ImageEmbedder(dim=self.index.spec.dim).embed([image])
        flt = self._filter(["vision"], chat_id, None)
        v, i = self.index.search_dense(
            jnp.asarray(q), min(top_k, self.index.size), flt
        )
        v, i = np.asarray(v), np.asarray(i)
        i = np.where(np.isfinite(v), i, -1)
        return self._hits(v[0], i[0], "vision_search")

    def search(
        self,
        query: str,
        top_k: int = 5,
        mode: str = "hybrid",  # dense | fulltext | hybrid
        similarity_threshold: Optional[float] = None,
        index_types: Optional[Sequence[str]] = None,
        chat_id: Optional[str] = None,
        doc_rows: Optional[Sequence[int]] = None,
        rerank: bool = False,
        candidates: int = 100,
        rrf_k: int = 60,
    ) -> list[SearchHit]:
        """Single-query search (batch variant: search_batch)."""
        hits = self.search_batch(
            [query], top_k=top_k, mode=mode,
            similarity_threshold=similarity_threshold,
            index_types=index_types, chat_id=chat_id, doc_rows=doc_rows,
            rerank=rerank, candidates=candidates, rrf_k=rrf_k,
        )
        return hits[0]

    def search_batch(
        self,
        queries: Sequence[str],
        top_k: int = 5,
        mode: str = "hybrid",
        similarity_threshold: Optional[float] = None,
        index_types: Optional[Sequence[str]] = None,
        chat_id: Optional[str] = None,
        doc_rows: Optional[Sequence[int]] = None,
        rerank: bool = False,
        candidates: int = 100,
        rrf_k: int = 60,
    ) -> list[list[SearchHit]]:
        if self.index.size == 0:
            return [[] for _ in queries]
        flt = self._filter(index_types, chat_id, doc_rows)
        k_recall = max(top_k, candidates if (rerank or mode == "hybrid") else top_k)
        k_recall = min(k_recall, self.index.size)

        # pad the query batch to a power-of-two bucket: concurrent
        # request coalescing (engine/batcher.py) produces arbitrary
        # batch sizes, and every distinct [B, ...] shape would otherwise
        # compile its OWN program — log2(max_batch) programs total
        # instead of one per observed size
        n_q = len(queries)
        bucket = 1 << max(0, n_q - 1).bit_length()
        padded = list(queries) + [""] * (bucket - n_q)

        if mode == "hybrid":
            # one fused device program: dense ⊕ BM25 ⊕ RRF (ops/hybrid.py)
            q_emb = jnp.asarray(np.asarray(self.embedder.embed(padded)))
            res = self.index.search_hybrid(
                q_emb, padded, k=k_recall, candidates=k_recall, flt=flt,
                rrf_k=rrf_k, **self.hybrid_opts,
            )
            v, i = np.asarray(res.scores), np.asarray(res.indices)
            take = k_recall if rerank else top_k
            results = [
                self._hits(v[b][:take], i[b][:take], "hybrid")
                for b in range(n_q)
            ]
            return self._maybe_rerank(queries, results, rerank, top_k)

        if mode == "dense":
            q_emb = jnp.asarray(np.asarray(self.embedder.embed(padded)))
            dense_v, dense_i = self.index.search_dense(q_emb, k_recall, flt)
            v, i = np.asarray(dense_v), np.asarray(dense_i)
            i = np.where(np.isfinite(v), i, -1)
            results = [
                self._hits(v[b][:top_k], i[b][:top_k], "vector_search",
                           similarity_threshold)
                for b in range(n_q)
            ]
        else:
            lex_v, lex_i = self.index.search_bm25(padded, k_recall, flt)
            v, i = np.asarray(lex_v), np.asarray(lex_i)
            i = np.where(np.isfinite(v), i, -1)
            results = [
                self._hits(v[b][:top_k], i[b][:top_k], "fulltext_search")
                for b in range(n_q)
            ]
        return self._maybe_rerank(queries, results, rerank, top_k)

    def _maybe_rerank(self, queries, results, rerank: bool, top_k: int):
        if rerank and self.reranker is not None:
            reranked = []
            for q, hits in zip(queries, results):
                if not hits:
                    reranked.append(hits)
                    continue
                ce = np.asarray(self.reranker(q, [h.text for h in hits]),
                                np.float32)
                # fuse the reranker with the retrieval score it refines:
                # z-scored sum is at worst the retriever's own ranking
                # and strictly better whenever the CE adds signal
                # (remote provider scores also fuse fine — they are
                # z-normalized per query here)
                base = np.asarray([h.score for h in hits], np.float32)

                def z(x):
                    s = float(x.std())
                    return (x - x.mean()) / (s if s > 1e-6 else 1.0)

                scores = z(ce) + z(base)
                order = np.argsort(-scores)[:top_k]
                new = []
                for pos in order:
                    h = hits[int(pos)]
                    new.append(
                        SearchHit(row=h.row, score=float(scores[pos]),
                                  text=h.text, metadata=h.metadata,
                                  recall_type="reranked")
                    )
                reranked.append(new)
            results = reranked
        elif rerank:
            results = [h[:top_k] for h in results]

        return results
