"""EngineManager: one CollectionEngine per collection, with persistence.

The reference resolves a vector-store connector per collection via
config.get_vector_db_connector (config.py:240-245); here the manager owns
in-process device engines keyed by collection id, builds their IndexSpec
from the collection's JSON config, and snapshots/restores them under the
data directory so restarts don't rebuild HBM state (engine/snapshot.py).
"""

from __future__ import annotations

import os
import threading
from typing import Any, Optional

import jax.numpy as jnp

from super_rag_tpu.config import Settings, settings as default_settings
from super_rag_tpu.engine.collection import CollectionEngine
from super_rag_tpu.engine.index import IndexSpec
from super_rag_tpu.engine.snapshot import load_index, save_index, snapshot_exists
from super_rag_tpu.models.hash_embedder import HashEmbedder
from super_rag_tpu.ops.dense import Metric

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "int8": jnp.int8}


class EngineManager:
    def __init__(self, cfg: Optional[Settings] = None,
                 embedder_factory=None, reranker_factory=None):
        self.cfg = cfg or default_settings
        self._engines: dict[str, CollectionEngine] = {}
        self._lock = threading.RLock()
        self._embedder_factory = embedder_factory or self._default_embedder
        self._reranker_factory = reranker_factory or (lambda config: None)
        # optional durability mirror: snapshots also land in an
        # ObjectStore (set by build_context when
        # cfg.snapshot_to_object_store; engine/snapshot.py store helpers)
        self.snapshot_store = None

    def _default_embedder(self, config: dict) -> Any:
        dim = int(config.get("embedding", {}).get("dim", self.cfg.embedding_dim))
        return HashEmbedder(dim=dim)

    def _spec(self, config: dict) -> IndexSpec:
        emb = config.get("embedding", {})
        return IndexSpec(
            dim=int(emb.get("dim", self.cfg.embedding_dim)),
            metric=Metric(config.get("metric", "cosine")),
            dtype=_DTYPES.get(
                config.get("index_dtype", self.cfg.index_dtype), jnp.bfloat16
            ),
            bm25_slots=int(config.get("bm25_slots", self.cfg.bm25_slots)),
            vocab_size=int(config.get("vocab_size", self.cfg.vocab_size)),
        )

    def _snapshot_path(self, collection_id: str) -> str:
        return os.path.join(self.cfg.snapshots_root(), collection_id)

    def get(self, collection_id: str, config: Optional[dict] = None) -> CollectionEngine:
        with self._lock:
            eng = self._engines.get(collection_id)
            if eng is not None:
                return eng
            config = config or {}
            embedder = self._embedder_factory(config)
            hybrid_opts = {
                key: config["hybrid"][key]
                for key in ("rescore", "postings_per_query_term",
                            "lex_deep_terms", "lex_deep_postings",
                            "lex_approx_topk")
                if key in config.get("hybrid", {})
            }
            path = self._snapshot_path(collection_id)
            if not snapshot_exists(path) and self.snapshot_store is not None:
                # cold machine: restore from the object-store mirror
                from super_rag_tpu.engine.snapshot import (
                    load_index_from_store,
                    store_snapshot_exists,
                )

                key = f"snapshots/{collection_id}"
                if store_snapshot_exists(self.snapshot_store, key):
                    index = load_index_from_store(self.snapshot_store, key)
                    eng = CollectionEngine(
                        index.spec, embedder=embedder,
                        reranker=self._reranker_factory(config),
                        hybrid_opts=hybrid_opts,
                    )
                    eng.index = index
                    self._engines[collection_id] = eng
                    return eng
            if snapshot_exists(path):
                index = load_index(path)
                eng = CollectionEngine(
                    index.spec,
                    embedder=embedder,
                    reranker=self._reranker_factory(config),
                    hybrid_opts=hybrid_opts,
                )
                eng.index = index
            else:
                spec = self._spec(config)
                # the embedder's true output dimension wins over config
                # defaults (remote models are dimension-probed)
                emb_dim = getattr(embedder, "dim", None)
                if emb_dim is not None and emb_dim != spec.dim:
                    spec = IndexSpec(
                        dim=emb_dim, metric=spec.metric, dtype=spec.dtype,
                        bm25_slots=spec.bm25_slots,
                        vocab_size=spec.vocab_size,
                        min_capacity=spec.min_capacity,
                    )
                eng = CollectionEngine(
                    spec,
                    embedder=embedder,
                    reranker=self._reranker_factory(config),
                    hybrid_opts=hybrid_opts,
                )
            self._engines[collection_id] = eng
            return eng

    def snapshot(self, collection_id: str) -> None:
        with self._lock:
            eng = self._engines.get(collection_id)
        if eng is not None:
            save_index(eng.index, self._snapshot_path(collection_id))
            if self.snapshot_store is not None:
                from super_rag_tpu.engine.snapshot import save_index_to_store

                save_index_to_store(eng.index, self.snapshot_store,
                                    f"snapshots/{collection_id}")

    def snapshot_all(self) -> None:
        with self._lock:
            ids = list(self._engines)
        for cid in ids:
            self.snapshot(cid)

    def drop(self, collection_id: str) -> None:
        with self._lock:
            self._engines.pop(collection_id, None)
        path = self._snapshot_path(collection_id)
        for ext in (".npz", ".json"):
            try:
                os.remove(path + ext)
            except FileNotFoundError:
                pass
