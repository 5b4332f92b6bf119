"""AppContext: wires the framework's subsystems together.

The reference wires these through FastAPI lifespans and module singletons
(super_rag/app.py:25-40, config.py engine factories); here one explicit
context object owns the metadata db, object store, engine manager, task
scheduler, reconciler, and auth — constructed once per process (or per
test) and handed to services/routes.
"""

from __future__ import annotations

import os

from dataclasses import dataclass
from typing import Optional

from super_rag_tpu.api.auth import Auth
from super_rag_tpu.config import Settings, settings as default_settings
from super_rag_tpu.engine.manager import EngineManager
from super_rag_tpu.store.db import Database
from super_rag_tpu.store.objectstore import LocalObjectStore, ObjectStore
from super_rag_tpu.tasks.document import DocumentIndexTask
from super_rag_tpu.tasks.reconciler import DocumentIndexReconciler
from super_rag_tpu.tasks.scheduler import InProcessScheduler, TaskScheduler, ThreadScheduler


@dataclass
class AppContext:
    cfg: Settings
    db: Database
    objects: ObjectStore
    engines: EngineManager
    reconciler: DocumentIndexReconciler
    scheduler: TaskScheduler
    auth: Auth
    kg: Optional[object] = None  # knowledge-graph service (kg/)
    completion: Optional[object] = None  # pluggable LLM client
    reranker: Optional[object] = None  # callable (query, texts) -> scores
    batcher: Optional[object] = None  # engine.batcher.QueryBatcher

    def reranker_for(self, config: Optional[dict] = None):
        """Per-collection reranker: the collection config's rerank
        ModelSpec (remote dialect client) wins, then the scenario-tagged
        default, then the on-TPU CE checkpoint.  Resolved at SEARCH time,
        not boot — providers registered after startup must take effect
        without a restart (the drive that caught this: a dialect provider
        added via the API was never consulted because ``reranker`` was a
        boot-time constant)."""
        fac = getattr(self, "reranker_factory_fn", None)
        if fac is None:
            return self.reranker
        try:
            return fac(config or {}) or self.reranker
        except Exception:  # noqa: BLE001 — rerank is optional, never fatal
            return self.reranker

    def services_for_nodeflow(self) -> dict:
        return {
            "engines": self.engines,
            "db": self.db,
            "kg": self.kg,
            "completion": self.completion,
            "reranker": self.reranker_for({}),
            "batcher": self.batcher,
        }


def build_context(
    cfg: Optional[Settings] = None,
    background_tasks: bool = False,
) -> AppContext:
    cfg = cfg or default_settings
    db = Database(cfg.resolved_db_path())
    if cfg.object_store_type == "s3":
        from super_rag_tpu.store.objectstore import get_object_store

        objects = get_object_store(
            "s3", bucket=cfg.s3_bucket,
            endpoint_url=cfg.s3_endpoint or None, region=cfg.s3_region,
        )
    else:
        objects = LocalObjectStore(cfg.objects_root())

    # model resolution: collection config -> provider/model from DB; the
    # on-TPU hash embedder serves when nothing is configured or the
    # provider is unreachable (reference base_embedding.py resolution,
    # with graceful offline degradation)
    from super_rag_tpu.llm.resolver import ModelResolver, RemoteEmbedder
    from super_rag_tpu.models.hash_embedder import HashEmbedder

    resolver = ModelResolver(db)

    def embedder_factory(config: dict):
        spec = config.get("embedding", {}) or {}
        if spec.get("provider") == "onboard":
            # the on-TPU flax encoder (BASELINE north star); model =
            # checkpoint path from scripts/train_encoder.py, or empty for
            # a fresh random-init encoder
            from super_rag_tpu.models.encoder_service import EncoderService

            ckpt = spec.get("model", "")
            try:
                if ckpt and os.path.exists(ckpt + ".npz"):
                    return EncoderService.from_checkpoint(ckpt)
                if ckpt and os.path.isdir(ckpt):
                    return EncoderService.from_hf_checkpoint(ckpt)
                return EncoderService()
            except Exception:  # noqa: BLE001 — fall through to hash
                import logging

                logging.getLogger(__name__).exception(
                    "onboard encoder load failed; using hash embedder"
                )
        client = resolver.embedding_client(config)
        if client is not None:
            try:
                resolver.probe_embedding_dim(client)
                return RemoteEmbedder(client)
            except Exception:  # noqa: BLE001 — provider unreachable
                pass
        dim = int(spec.get("dim", cfg.embedding_dim))
        # a trained on-TPU checkpoint (SUPER_RAG_ENCODER_CKPT) beats the
        # hash embedder as the no-provider default — semantic recall on
        # the held-out ICT eval is ~1.5x the hash baseline (SEMANTIC_EVAL)
        ckpt = cfg.encoder_checkpoint
        if ckpt and os.path.exists(ckpt + ".npz"):
            try:
                from super_rag_tpu.models.encoder_service import (
                    EncoderService,
                )

                svc = EncoderService.from_checkpoint(ckpt)
                if svc.cfg.out_dim == dim:
                    return svc
            except Exception:  # noqa: BLE001 — fall through to hash
                import logging

                logging.getLogger(__name__).exception(
                    "default encoder checkpoint load failed; using hash"
                )
        return HashEmbedder(dim=dim)

    # per-process caches: reranker_for() resolves at SEARCH time, so the
    # expensive artifacts must be reused across queries — the remote
    # client cache lives in the resolver (httpx pool reuse); the local CE
    # cache lives here keyed on (path, mtime) so a retrained checkpoint
    # is picked up without a restart but not reloaded per search
    _ce_cache: dict = {}
    _remote_wrap_cache: dict = {}

    def reranker_factory(config: dict):
        client = resolver.rerank_client(config)
        if client is not None:
            ckey = id(client)  # resolver caches clients, so id is stable
            wrapped = _remote_wrap_cache.get(ckey)
            if wrapped is not None:
                return wrapped

            def rerank(query: str, texts):
                import numpy as np

                results = client.rerank(query, list(texts))
                scores = np.zeros(len(texts), np.float32)
                for r in results:
                    scores[r["index"]] = r["relevance_score"]
                return scores

            _remote_wrap_cache[ckey] = rerank
            return rerank
        # no remote provider: a trained on-TPU cross-encoder checkpoint
        # (SUPER_RAG_RERANKER_CKPT) serves as the default reranker
        ckpt = cfg.reranker_checkpoint
        if ckpt and os.path.exists(ckpt + ".npz"):
            try:
                key = (ckpt, os.path.getmtime(ckpt + ".npz"))
                svc = _ce_cache.get(key)
                if svc is None:
                    from super_rag_tpu.service.rerank_service import (
                        RerankService,
                    )

                    _ce_cache.clear()  # at most one live checkpoint
                    svc = RerankService.from_checkpoint(ckpt)
                    _ce_cache[key] = svc
                return svc
            except Exception:  # noqa: BLE001 — rerank is optional
                import logging

                logging.getLogger(__name__).exception(
                    "reranker checkpoint load failed; rerank disabled"
                )
        return None

    engines = EngineManager(cfg, embedder_factory=embedder_factory,
                            reranker_factory=reranker_factory)
    if cfg.snapshot_to_object_store:
        engines.snapshot_store = objects
    task = DocumentIndexTask(db, objects, engines, cfg)
    reconciler = DocumentIndexReconciler(db)
    if not background_tasks:
        scheduler: TaskScheduler = InProcessScheduler(
            task, reconciler.callbacks
        )
    elif cfg.ingest_backend == "ray":
        try:
            from super_rag_tpu.tasks.scheduler import RayTaskScheduler

            scheduler = RayTaskScheduler(
                task, reconciler.callbacks,
                ray_workers=cfg.ingest_host_workers,
                ray_address=cfg.ray_address or None,
            )
        except ImportError:
            import logging

            logging.getLogger(__name__).warning(
                "INGEST_BACKEND=ray but ray is not installed; falling "
                "back to the process scheduler (same wire contract)")
            from super_rag_tpu.tasks.scheduler import ProcessScheduler

            scheduler = ProcessScheduler(
                task, reconciler.callbacks,
                process_workers=cfg.ingest_host_workers,
            )
    elif cfg.ingest_backend == "process":
        from super_rag_tpu.tasks.scheduler import ProcessScheduler

        scheduler = ProcessScheduler(
            task, reconciler.callbacks,
            process_workers=cfg.ingest_host_workers,
        )
    else:
        scheduler = ThreadScheduler(task, reconciler.callbacks,
                                    host_workers=cfg.ingest_host_workers)
    reconciler.scheduler = scheduler
    auth = Auth(db, cfg.jwt_secret, cfg.jwt_ttl_hours,
                oauth_providers=cfg.oauth_providers())
    from super_rag_tpu.kg.service import KnowledgeGraphService

    completion = None
    completion_client = resolver.completion_client({})
    if completion_client is not None:
        completion = lambda **kw: completion_client.complete(**kw)  # noqa: E731

    kg = KnowledgeGraphService(db, completion=completion,
                               reranker=reranker_factory({}))
    from super_rag_tpu.engine.batcher import QueryBatcher

    batcher = QueryBatcher(max_batch=cfg.batch_max,
                           max_wait_ms=cfg.batch_window_ms)
    ctx = AppContext(
        cfg=cfg, db=db, objects=objects, engines=engines,
        reconciler=reconciler, scheduler=scheduler, auth=auth, kg=kg,
        completion=completion, batcher=batcher,
    )
    ctx.resolver = resolver  # type: ignore[attr-defined]
    # per-search rerank resolution (AppContext.reranker_for): keeps
    # collection-config rerank specs and late-registered providers live
    ctx.reranker_factory_fn = reranker_factory  # type: ignore[attr-defined]
    task.ctx = ctx  # index task reaches kg/completion through the context
    return ctx
