"""Ingest throughput: docs/s through the full engine write path.

Measures CollectionEngine.ingest (tokenize -> encoder forward ->
normalize/quantize -> donated dynamic_update_slice writes + host BM25
analysis) with the flax TextEncoder on device.  The device-resident
embedding path (EncoderService.embed_device + DeviceIndex._prep_dense)
lets the host tokenize/analyze batch i+1 while batch i's forward and
write execute, so the comparison host_sync vs device_path isolates the
pipelining win.

Reference counterpart: the ingestion fan-out measured in SURVEY.md §6
(embedding via remote HTTP APIs, batches of 10 through a thread pool).

Run on TPU: python scripts/bench_ingest.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

RECORDS: list[dict] = []


def emit(rec: dict) -> None:
    """Print the record AND persist incrementally (TPU runs only: a CPU
    sanity run must not clobber the measurement record)."""
    RECORDS.append(rec)
    print(json.dumps(rec))
    import jax

    if jax.default_backend() != "cpu":
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "BENCH_INGEST.json"), "w") as f:
            json.dump(RECORDS, f, indent=1)


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the axon sitecustomize overrides JAX_PLATFORMS — re-force it so
        # `JAX_PLATFORMS=cpu` really runs CPU (without this the CPU
        # sanity run inits the axon backend and queues for the TPU claim)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.engine.collection import CollectionEngine
    from super_rag_tpu.engine.index import IndexSpec
    from super_rag_tpu.models.encoder import EncoderConfig
    from super_rag_tpu.models.encoder_service import EncoderService

    on_tpu = jax.default_backend() != "cpu"
    n_docs = 20_000 if on_tpu else 512
    batch = 256 if on_tpu else 64
    dim = 768 if on_tpu else 64

    cfg = EncoderConfig(
        vocab_size=30522, hidden_dim=384 if on_tpu else 64,
        num_layers=6 if on_tpu else 2, num_heads=6 if on_tpu else 2,
        mlp_dim=1536 if on_tpu else 256, embed_dim=dim, max_len=128,
    )
    svc = EncoderService(cfg, batch_size=batch, max_len=128)

    rng = np.random.default_rng(0)
    words = [f"token{i}" for i in range(5000)]
    docs = [
        " ".join(rng.choice(words, size=rng.integers(20, 60)))
        for _ in range(n_docs)
    ]

    spec = IndexSpec(dim=dim, dtype=jnp.int8, vocab_size=1 << 17,
                     min_capacity=1 << 15)

    def run(device_path: bool) -> float:
        eng = CollectionEngine(spec, embedder=svc)
        if not device_path:
            # force the host-sync path by hiding embed_device
            eng.embedder = _HostOnly(svc)
        # warm up compile on one batch
        eng.ingest(docs[:batch])
        t0 = time.perf_counter()
        for i in range(batch, n_docs, batch):
            eng.ingest(docs[i : i + batch])
        # drain device queue
        np.asarray(eng.index.emb[:1])
        dt = time.perf_counter() - t0
        return (n_docs - batch) / dt

    class _HostOnly:
        def __init__(self, inner):
            self._inner = inner
            self.dim = inner.dim

        def embed(self, texts):
            return self._inner.embed(texts)

    host_dps = run(device_path=False)
    dev_dps = run(device_path=True)
    emit({
        "metric": "ingest_docs_per_s",
        "encoder": f"{cfg.num_layers}L-{cfg.hidden_dim}h->{dim}d int8 index",
        "batch": batch,
        "host_sync_docs_per_s": round(host_dps, 1),
        "device_path_docs_per_s": round(dev_dps, 1),
        "speedup": round(dev_dps / host_dps, 2),
    })


def scheduler_pipeline_bench() -> None:
    """End-to-end document ingest through reconciler + ThreadScheduler:
    host_workers=0 (serial parse->embed per doc) vs the pipelined pool
    (parse/chunk overlap the device worker's embed+insert)."""
    import shutil
    import tempfile

    import jax

    from super_rag_tpu.config import Settings
    from super_rag_tpu.engine.manager import EngineManager
    from super_rag_tpu.store.db import Database
    from super_rag_tpu.store.objectstore import LocalObjectStore
    from super_rag_tpu.tasks.document import DocumentIndexTask
    from super_rag_tpu.tasks.reconciler import DocumentIndexReconciler
    from super_rag_tpu.tasks.scheduler import ThreadScheduler

    on_tpu = jax.default_backend() != "cpu"
    n_docs = 64 if on_tpu else 24
    rng = np.random.default_rng(1)
    words = [f"word{i}" for i in range(4000)]
    # ~40 KB markdown per doc: enough sections that parse+chunk costs
    # real host time relative to the embed+insert stage
    def make_doc():
        secs = []
        for s in range(40):
            body = " ".join(rng.choice(words, size=200))
            secs.append(f"## Section {s}\n\n{body}\n")
        return ("# Doc\n\n" + "\n".join(secs)).encode()

    payloads = [make_doc() for _ in range(n_docs)]

    def run(host_workers: int) -> float:
        tmp = tempfile.mkdtemp(prefix="bench_ingest_")
        try:
            cfg = Settings(data_dir=tmp, embedding_dim=256,
                           index_dtype="int8", vocab_size=1 << 16)
            db = Database(cfg.resolved_db_path())
            objects = LocalObjectStore(cfg.objects_root())
            engines = EngineManager(cfg)
            task = DocumentIndexTask(db, objects, engines, cfg)
            rec = DocumentIndexReconciler(db)
            sched = ThreadScheduler(task, rec.callbacks,
                                    host_workers=host_workers)
            rec.scheduler = sched
            coll = db.create_collection("bench", "bench")
            for i, data in enumerate(payloads):
                path = f"{coll['id']}/d{i}.md"
                objects.put(path, data)
                doc = db.create_document(coll["id"], f"d{i}.md",
                                         size=len(data), object_path=path,
                                         content_hash=f"h{i}")
                db.upsert_document_index(doc["id"], "vector")
            t0 = time.perf_counter()
            rec.reconcile_all()
            sched.wait_idle(timeout=600)
            dt = time.perf_counter() - t0
            sched.shutdown()
            return n_docs / dt
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    serial = run(0)
    piped = run(4)
    emit({
        "metric": "scheduler_ingest_docs_per_s",
        "docs": n_docs,
        "serial_docs_per_s": round(serial, 2),
        "pipelined_docs_per_s": round(piped, 2),
        "speedup": round(piped / serial, 2),
    })


if __name__ == "__main__":
    import os
    import sys

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if ROOT not in sys.path:
        sys.path.insert(0, ROOT)
    main()
    scheduler_pipeline_bench()
