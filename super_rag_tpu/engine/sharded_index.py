"""Mutable row-sharded hybrid index over a device mesh.

The multi-chip tier of the engine (BASELINE.md config #5: 10M chunks over
a v5e-8 mesh with streaming ingestion and ICI top-k merge).  Same
mutability model as the single-chip DeviceIndex — capacity classes, write
cursor, validity bitmap — but every row-aligned array carries a
NamedSharding over the corpus mesh axis, inserts write through a donated
sharded dynamic_update_slice, and queries run the SPMD program in
parallel/sharded_hybrid.py (per-chip kernels + all_gather merge).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from super_rag_tpu.engine.index import (
    INDEXER_CODES,
    FilterSpec,
    IndexSpec,
    WRITE_BLOCK,
    _chat_hash,
    _filter_mask,
)
from super_rag_tpu.ops.dense import Metric
from super_rag_tpu.ops.quant import quantize_int8
from super_rag_tpu.parallel.mesh import CORPUS_AXIS, row_axes, row_sharding
from super_rag_tpu.parallel.sharded_hybrid import sharded_hybrid_search
from super_rag_tpu.tokenize.analyzer import Analyzer, DocFrequency


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_sharded(dst: jax.Array, src: jax.Array, start: jax.Array) -> jax.Array:
    idx = (start,) + (jnp.int32(0),) * (dst.ndim - 1)
    return jax.lax.dynamic_update_slice(dst, src.astype(dst.dtype), idx)


class ShardedDeviceIndex:
    """Row-sharded mutable hybrid index (dense + BM25) over a mesh."""

    def __init__(self, spec: IndexSpec, mesh: Mesh,
                 analyzer: Optional[Analyzer] = None):
        assert spec.metric == Metric.COSINE, "sharded tier: cosine only"
        self.spec = spec
        self.mesh = mesh
        self.n_dev = mesh.devices.size
        self.analyzer = analyzer or Analyzer(vocab_size=spec.vocab_size)
        self.df = DocFrequency()
        self.size = 0
        self._capacity = 0
        self.row_meta: list[Optional[dict]] = []
        self._deleted: set[int] = set()
        self._clear_tail()
        self._ivf = None
        self._ivf_upto = 0
        self._ivf_nprobe = 32
        # Pallas per-tile extraction cap for the sharded flat path.
        # Starts at the conservative 8 (not the single-chip 2): the
        # sharded tier has no serving traffic on this image to observe,
        # so it keeps full recall until calibrate_per_tile_k — run at
        # compaction like DeviceIndex — proves a narrower cap lossless.
        self._per_tile_k = 8
        self._alloc(self._round_cap(spec.min_capacity))

    def _clear_tail(self) -> None:
        self._tail_terms: list[np.ndarray] = []
        self._tail_tfs: list[np.ndarray] = []
        self._tail_dlen: list[np.ndarray] = []
        self._tail_rows: list[np.ndarray] = []
        self._tail_codes: list[np.ndarray] = []

    def _round_cap(self, n: int) -> int:
        unit = self.n_dev * WRITE_BLOCK
        return -(-n // unit) * unit

    def _sharded_zeros(self, shape, dtype, fill=0):
        arr = jnp.full(shape, fill, dtype)
        return jax.device_put(arr, row_sharding(self.mesh, arr.ndim))

    def _grow(self, name: str, shape, dtype, fill=0):
        old = getattr(self, name, None)
        if old is None or self._capacity == 0:
            setattr(self, name, self._sharded_zeros(shape, dtype, fill))
            return
        extra_shape = (shape[0] - old.shape[0], *shape[1:])
        extra = jnp.full(extra_shape, fill, dtype)
        new = jnp.concatenate([old, extra], axis=0)
        setattr(self, name,
                jax.device_put(new, row_sharding(self.mesh, new.ndim)))

    def _alloc(self, capacity: int) -> None:
        spec = self.spec
        self._grow("emb", (capacity, spec.dim), spec.dtype)
        if spec.dtype == jnp.int8:
            self._grow("scales", (capacity,), jnp.float32)
        else:
            self.scales = None
        self._grow("terms", (capacity, spec.bm25_slots), jnp.int32,
                   fill=spec.vocab_size)
        self._grow("tfs", (capacity, spec.bm25_slots), jnp.bfloat16)
        self._grow("doc_len", (capacity,), jnp.float32, 1)
        self._grow("valid", (capacity,), jnp.bool_)
        self._grow("indexer_code", (capacity,), jnp.int32)
        self._grow("chat_code", (capacity,), jnp.int32)
        self._capacity = capacity

    def _ensure_capacity(self, extra: int) -> None:
        need = self.size + extra
        if need > self._capacity:
            cap = self._capacity
            while cap < need:
                cap *= 2
            self._alloc(self._round_cap(cap))

    # -- mutation ----------------------------------------------------------

    def add(self, embeddings, texts: Sequence[str],
            metadata: Optional[Sequence[dict]] = None,
            indexer: str = "vector",
            chat_id: Optional[str] = None) -> list[int]:
        m = len(texts)
        metadata = metadata or [{} for _ in range(m)]
        self._ensure_capacity(m + WRITE_BLOCK)

        x = np.asarray(embeddings, np.float32)
        nrm = np.linalg.norm(x, axis=-1, keepdims=True)
        x = x / np.where(nrm > 0, nrm, 1.0)
        if self.spec.dtype == jnp.int8:
            qv, qs = quantize_int8(jnp.asarray(x))
            emb_block, scale_block = np.asarray(qv), np.asarray(qs)
        else:
            emb_block, scale_block = x, None

        terms, tfs, lens = self.analyzer.batch_doc_entries(
            list(texts), self.spec.bm25_slots
        )
        for r in range(m):
            row_terms = terms[r][terms[r] != self.analyzer.pad_id]
            self.df.add_doc(row_terms.tolist(), int(lens[r]))

        start = self.size
        pad_m = -(-m // WRITE_BLOCK) * WRITE_BLOCK

        def padded(a, fill=0):
            out = np.full((pad_m, *a.shape[1:]), fill, a.dtype)
            out[:m] = a
            return jnp.asarray(out)

        s = jnp.int32(start)
        self.emb = _write_sharded(self.emb, padded(emb_block), s)
        if self.scales is not None:
            self.scales = _write_sharded(self.scales, padded(scale_block), s)
        self.terms = _write_sharded(
            self.terms, padded(terms, fill=self.spec.vocab_size), s
        )
        self.tfs = _write_sharded(self.tfs, padded(tfs.astype(np.float32)), s)
        self.doc_len = _write_sharded(
            self.doc_len, padded(np.maximum(lens, 1.0)), s
        )
        vmask = np.zeros(pad_m, bool)
        vmask[:m] = True
        self.valid = _write_sharded(self.valid, jnp.asarray(vmask), s)
        code = INDEXER_CODES.get(indexer, 0)
        chat = _chat_hash(chat_id)
        self.indexer_code = _write_sharded(
            self.indexer_code, padded(np.full(m, code, np.int32)), s
        )
        self.chat_code = _write_sharded(
            self.chat_code, padded(np.full(m, chat, np.int32)), s
        )

        self.row_meta.extend(
            {"text": t, **md} for t, md in zip(texts, metadata)
        )
        if getattr(self, "_inv_ids", None) is not None:
            # rows added after lexical compaction also land in the host
            # tail mirror so the SPMD query's replicated fresh-tail scan
            # can score them before the next compaction
            self._tail_terms.append(terms.astype(np.int32))
            self._tail_tfs.append(tfs.astype(np.float32))
            self._tail_dlen.append(np.maximum(lens, 1.0).astype(np.float32))
            self._tail_rows.append(
                np.arange(start, start + m, dtype=np.int32)
            )
            self._tail_codes.append(
                np.stack([np.full(m, code, np.int32),
                          np.full(m, chat, np.int32)], axis=1)
            )
        self.size = start + m
        return list(range(start, start + m))

    def delete(self, rows: Sequence[int]) -> None:
        if not rows:
            return
        for r in rows:
            if r < len(self.row_meta) and self.row_meta[r] is not None:
                self.row_meta[r] = None
        mask = np.ones(self._capacity, bool)
        mask[list(rows)] = False
        self.valid = jax.device_put(
            self.valid & jnp.asarray(mask), row_sharding(self.mesh, 1)
        )
        self._deleted.update(int(r) for r in rows)

    # -- lexical compaction (per-shard inverted postings) --------------------

    def compact_lexical(self, postings_per_term: int = 256) -> None:
        """Build per-shard inverted postings [n_dev, V+1, P] (local doc
        ids within each shard), placed sharded over the corpus axis so
        the SPMD query reads only its own shard's tables."""
        from super_rag_tpu.ops.bm25_inverted import build_inverted

        if self.size == 0:
            return
        shard_rows = self._capacity // self.n_dev
        terms_np = np.asarray(self.terms)
        tfs_np = np.asarray(self.tfs.astype(jnp.float32))
        dl_np = np.asarray(self.doc_len)
        # exclude dead rows from posting budgets (mirrors
        # DeviceIndex.compact_lexical — churn fidelity decay otherwise)
        dead = ~np.asarray(self.valid)
        if dead.any():
            terms_np = terms_np.copy()
            tfs_np = tfs_np.copy()
            terms_np[dead] = self.spec.vocab_size
            tfs_np[dead] = 0.0
        avgdl = self.df.avgdl
        ids_blocks, imp_blocks = [], []
        for dev in range(self.n_dev):
            lo = dev * shard_rows
            hi = min((dev + 1) * shard_rows, self._capacity)
            inv = build_inverted(
                terms_np[lo:hi], tfs_np[lo:hi], dl_np[lo:hi],
                self.spec.vocab_size, postings_per_term=postings_per_term,
                avgdl=avgdl,
            )
            ids_blocks.append(np.asarray(inv.postings_ids))
            imp_blocks.append(
                np.asarray(inv.postings_impact.astype(jnp.float32))
            )
        sharding = NamedSharding(self.mesh, P(row_axes(self.mesh), None, None))
        self._inv_ids = jax.device_put(
            jnp.asarray(np.stack(ids_blocks)), sharding
        )
        self._inv_impact = jax.device_put(
            jnp.asarray(np.stack(imp_blocks), jnp.bfloat16), sharding
        )
        self._inverted_upto = self.size
        self._clear_tail()
        # per-tile-cap guard at compaction cadence (mirrors DeviceIndex;
        # real kernel only — interpret mode at corpus scale is minutes)
        if (jax.default_backend() == "tpu"
                and self._capacity // self.n_dev >= 2048):
            try:
                self.calibrate_per_tile_k()
            except Exception:  # noqa: BLE001 — guard is best-effort
                import logging

                logging.getLogger(__name__).exception(
                    "sharded per_tile_k calibration failed"
                )

    def calibrate_per_tile_k(self, sample: int = 32, threshold: float = 0.98,
                             cand: int = 100) -> int:
        """Serving-time exactness guard for the sharded Pallas extraction
        cap: compares capped vs exact (blocked-XLA) dense candidates on
        sampled stored vectors and widens ``_per_tile_k`` until overlap
        >= threshold.  Dense-only probe: empty query strings keep the
        lexical branch silent, so the hybrid result IS the dense order."""
        if self.size < 64:
            return self._per_tile_k
        alive = [r for r, m_ in enumerate(self.row_meta) if m_ is not None]
        if len(alive) < 2:
            return self._per_tile_k
        rng = np.random.default_rng(1)
        pick = rng.choice(len(alive), size=min(sample, len(alive)),
                          replace=False)
        idx = jnp.asarray(np.asarray(alive, np.int32)[pick])
        q = np.asarray(jnp.take(self.emb, idx, axis=0).astype(jnp.float32))
        if self.scales is not None:
            q = q * np.asarray(jnp.take(self.scales, idx))[:, None]
        q = q + 0.05 * rng.standard_normal(q.shape).astype(np.float32)
        queries = [""] * q.shape[0]
        kk = min(cand, self.size)
        gold = self.search_hybrid(q, queries, k=kk, candidates=kk,
                                  use_pallas=False, rescore=False)
        gold_sets = [set(x for x in row.tolist() if x >= 0)
                     for row in np.asarray(gold.indices)]
        tile = min(2048, self._capacity // self.n_dev)
        while self._per_tile_k < min(kk, tile):
            got = self.search_hybrid(q, queries, k=kk, candidates=kk,
                                     use_pallas=True, rescore=False)
            overlap = float(np.mean([
                len(set(x for x in a.tolist() if x >= 0) & g) / max(len(g), 1)
                for a, g in zip(np.asarray(got.indices), gold_sets)
            ]))
            if overlap >= threshold:
                break
            self._per_tile_k *= 2
        return self._per_tile_k

    # -- dense compaction (per-shard IVF tier) --------------------------------

    def compact_dense(self, nlist: int = 64, nprobe: int = 16,
                      kmeans_iters: int = 10,
                      capacity_factor: float = 1.5) -> None:
        """Build a per-shard IVF tier: each shard's rows are k-means
        clustered LOCALLY (local doc ids), arrays stacked [n_dev, ...] and
        placed sharded so the SPMD query probes only its own clusters —
        the same latency tier as DeviceIndex.compact_dense, per chip."""
        from super_rag_tpu.ops.ivf import build_ivf

        if self.size == 0:
            return
        shard_rows = self._capacity // self.n_dev
        emb_np = np.asarray(
            self.emb.astype(jnp.float32)
            if self.emb.dtype == jnp.bfloat16 else self.emb
        ).astype(np.float32)
        if self.scales is not None:
            emb_np = emb_np * np.asarray(self.scales)[:, None]
        valid_np = np.asarray(self.valid)
        per = []
        for dev in range(self.n_dev):
            lo = dev * shard_rows
            shard_emb = emb_np[lo: lo + shard_rows]
            # live rows only (local ids) — dead rows would waste cluster
            # capacity + probe bandwidth (mirrors DeviceIndex, r4)
            loc = np.flatnonzero(valid_np[lo: lo + shard_rows])
            loc = loc.astype(np.int32)
            if loc.size and loc.size < shard_emb.shape[0]:
                shard_emb = shard_emb[loc]
                ids = loc
            else:
                # empty shard: keep the (all-masked) full slice so the
                # stacked arrays stay uniformly shaped
                ids = None
            per.append(build_ivf(
                jnp.asarray(shard_emb), nlist=nlist,
                capacity_factor=capacity_factor,
                dtype=self.spec.dtype if self.spec.dtype == jnp.int8
                else jnp.float32,
                metric=self.spec.metric, kmeans_iters=kmeans_iters,
                seed=dev, ids=ids,
            ))
        cap = max(p.capacity for p in per)
        m_of = max(
            (p.overflow.size if p.overflow is not None else 0) for p in per
        )

        def pad_cluster(a, c, fill=0):
            out = np.full((a.shape[0], c, *a.shape[2:]), fill, np.asarray(a).dtype)
            out[:, : a.shape[1]] = np.asarray(a)
            return out

        sh3 = NamedSharding(self.mesh, P(row_axes(self.mesh), None, None))
        sh4 = NamedSharding(self.mesh, P(row_axes(self.mesh), None, None, None))
        sh2 = NamedSharding(self.mesh, P(row_axes(self.mesh), None))
        ivf = {
            "residual": bool(per[0].residual),
            "centroids": jax.device_put(jnp.asarray(np.stack(
                [np.asarray(p.centroids) for p in per])), sh3),
            "values": jax.device_put(jnp.asarray(np.stack(
                [pad_cluster(p.values, cap) for p in per])), sh4),
            "row_ids": jax.device_put(jnp.asarray(np.stack(
                [pad_cluster(p.row_ids, cap, fill=-1) for p in per])), sh3),
            "scales": None,
            "of_values": None, "of_scales": None, "of_rows": None,
        }
        if per[0].scales is not None:
            ivf["scales"] = jax.device_put(jnp.asarray(np.stack(
                [pad_cluster(np.asarray(p.scales, np.float32), cap)
                 for p in per])), sh3)
        if m_of > 0:
            d = self.spec.dim
            of_v = np.zeros((self.n_dev, m_of, d),
                            np.int8 if per[0].scales is not None
                            else np.float32)
            of_s = np.ones((self.n_dev, m_of), np.float32)
            of_r = np.full((self.n_dev, m_of), -1, np.int32)
            for dev, p in enumerate(per):
                if p.overflow is None:
                    continue
                m = p.overflow.size
                of_v[dev, :m] = np.asarray(p.overflow.values)
                if p.overflow.scales is not None:
                    of_s[dev, :m] = np.asarray(p.overflow.scales)
                of_r[dev, :m] = np.asarray(p.overflow_rows)
            ivf["of_values"] = jax.device_put(jnp.asarray(of_v), sh3)
            ivf["of_scales"] = jax.device_put(jnp.asarray(of_s), sh2)
            ivf["of_rows"] = jax.device_put(jnp.asarray(of_r), sh2)
        self._ivf = ivf
        self._ivf_upto = self.size
        self._ivf_nprobe = nprobe

    # -- query -------------------------------------------------------------

    def _mask(self, flt: Optional[FilterSpec]) -> jax.Array:
        """Validity AND metadata filters as one sharded [N] mask (same
        masked-scoring semantics as DeviceIndex._mask; elementwise ops
        preserve the row sharding, so each chip filters its own rows)."""
        if flt is None or (flt.indexers is None and flt.chat_hash is None
                           and flt.doc_rows is None):
            return self.valid
        bits = 0
        if flt.indexers is not None:
            for c in flt.indexers:
                bits |= 1 << c
        m = _filter_mask(
            self.valid, self.indexer_code, self.chat_code,
            jnp.uint32(bits), jnp.int32(flt.chat_hash or 0),
            has_chat=flt.chat_hash is not None,
            has_indexers=flt.indexers is not None,
        )
        if flt.doc_rows is not None:
            # row allowlist (KG as_of / live-search pools): same semantics
            # as DeviceIndex._mask; the AND preserves the row sharding
            dm = np.zeros(self._capacity, bool)
            rows = np.asarray(list(flt.doc_rows), np.int64)
            dm[rows[rows < self._capacity]] = True
            m = m & jnp.asarray(dm)
        return m

    def _tail_arrays(self, flt: Optional[FilterSpec]):
        """Replicated fresh-tail arrays (rows added since compact_lexical),
        padded to a power-of-two capacity class.  The keep mask bakes in
        validity + metadata filters host-side (the tail is small)."""
        if not self._tail_rows:
            return None
        rows = np.concatenate(self._tail_rows)
        m = len(rows)
        cap = max(WRITE_BLOCK, 1 << (m - 1).bit_length())
        L = self.spec.bm25_slots
        tt = np.full((cap, L), self.spec.vocab_size, np.int32)
        tf_ = np.zeros((cap, L), np.float32)
        tdl = np.ones(cap, np.float32)
        trow = np.full(cap, -1, np.int32)
        tt[:m] = np.concatenate(self._tail_terms)
        tf_[:m] = np.concatenate(self._tail_tfs)
        tdl[:m] = np.concatenate(self._tail_dlen)
        trow[:m] = rows
        codes = np.concatenate(self._tail_codes)  # [m, 2] indexer, chat
        keep = np.zeros(cap, bool)
        keep[:m] = ~np.isin(rows, list(self._deleted)) if self._deleted \
            else True
        if flt is not None:
            if flt.indexers is not None:
                keep[:m] &= np.isin(codes[:, 0], list(flt.indexers))
            if flt.chat_hash is not None:
                keep[:m] &= (codes[:, 1] == flt.chat_hash) | (codes[:, 1] == 0)
            if flt.doc_rows is not None:
                keep[:m] &= np.isin(rows, list(flt.doc_rows))
        return (jnp.asarray(tt), jnp.asarray(tf_), jnp.asarray(tdl),
                jnp.asarray(trow), jnp.asarray(keep))

    def search_hybrid(self, query_emb, queries: Sequence[str], k: int,
                      candidates: int = 100, max_terms: int = 16,
                      flt: Optional[FilterSpec] = None,
                      use_pallas: Optional[bool] = None,
                      rescore: bool = True):
        qt = np.full((len(queries), max_terms), self.analyzer.pad_id, np.int32)
        qi = np.zeros((len(queries), max_terms), np.float32)
        for i, q in enumerate(queries):
            qt[i], qi[i] = self.analyzer.query_entry(q, self.df, max_terms)
        inv_ok = getattr(self, "_inv_ids", None) is not None
        tail = self._tail_arrays(flt) if inv_ok else None
        # IVF is only safe when it covers every row (mirrors DeviceIndex)
        ivf = self._ivf if (self._ivf is not None
                            and self._ivf_upto == self.size) else None
        on_tpu = jax.default_backend() == "tpu"
        if use_pallas is None:
            use_pallas = on_tpu and self._capacity // self.n_dev >= 2048
        shard_rows = self._capacity // self.n_dev
        dummy = jnp.zeros((), jnp.float32)
        t = tail or (dummy,) * 5
        iv = ivf or {}
        return sharded_hybrid_search(
            jnp.asarray(np.asarray(query_emb)),
            jnp.asarray(qt), jnp.asarray(qi),
            self.emb, self.scales, self.terms, self.tfs, self.doc_len,
            self._mask(flt), jnp.float32(self.df.avgdl),
            self._inv_ids if inv_ok else dummy,
            self._inv_impact if inv_ok else dummy,
            iv.get("centroids"), iv.get("values"), iv.get("scales"),
            iv.get("row_ids"), iv.get("of_values"), iv.get("of_scales"),
            iv.get("of_rows"),
            t[0], t[1], t[2], t[3], t[4],
            mesh=self.mesh, vocab_size=self.spec.vocab_size, k=k,
            candidates=candidates, metric=self.spec.metric,
            has_scales=self.scales is not None,
            has_inverted=inv_ok,
            use_pallas=use_pallas and ivf is None,
            interpret=not on_tpu,
            dense_tile=2048 if shard_rows >= 2048 else max(256, shard_rows),
            # extraction cap, widened/narrowed by calibrate_per_tile_k
            # at compaction (ADVICE r2: never hardcode below the
            # calibrated-lossless width on the sharded path)
            per_tile_k=(self._per_tile_k
                        if (use_pallas and candidates >= 32) else None),
            int8_queries=use_pallas and self.spec.dtype == jnp.int8,
            rescore=rescore,
            has_ivf=ivf is not None,
            has_ivf_scales=ivf is not None and ivf.get("scales") is not None,
            has_overflow=ivf is not None and ivf.get("of_values") is not None,
            ivf_residual=bool(ivf.get("residual")) if ivf else False,
            nprobe=self._ivf_nprobe,
            has_tail=tail is not None,
        )

    # -- snapshot / restore --------------------------------------------------

    def snapshot_state(self) -> tuple[dict, dict]:
        """Host-side snapshot (same format as DeviceIndex.snapshot_state;
        np.asarray of a sharded array gathers all shards)."""
        emb = self.emb[: self.size]
        if emb.dtype == jnp.bfloat16:
            emb = emb.astype(jnp.float32)  # npz cannot hold bf16
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
    def from_snapshot(cls, arrays: dict, host: dict,
                      mesh: Mesh) -> "ShardedDeviceIndex":
        from super_rag_tpu.tokenize.analyzer import DocFrequency

        s = host["spec"]
        spec = IndexSpec(
            dim=s["dim"], metric=Metric(s["metric"]),
            dtype=jnp.dtype(s["dtype"]), bm25_slots=s["bm25_slots"],
            vocab_size=s["vocab_size"], min_capacity=s["min_capacity"],
        )
        idx = cls(spec, mesh)
        n = host["size"]
        idx._ensure_capacity(n)
        pad = idx._capacity - n

        def put(name, a, fill=0):
            a = np.asarray(a)
            a = np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)
            tgt = getattr(idx, name)
            setattr(idx, name, jax.device_put(
                jnp.asarray(a).astype(tgt.dtype),
                row_sharding(mesh, a.ndim),
            ))

        put("emb", arrays["emb"])
        put("terms", arrays["terms"], fill=spec.vocab_size)
        put("tfs", arrays["tfs"])
        put("doc_len", arrays["doc_len"], fill=1)
        put("valid", arrays["valid"])
        put("indexer_code", arrays["indexer_code"])
        put("chat_code", arrays["chat_code"])
        if "scales" in arrays:
            put("scales", arrays["scales"])
        idx.size = n
        idx.row_meta = list(host["row_meta"])
        idx.df = DocFrequency.from_state(host["df"])
        return idx
