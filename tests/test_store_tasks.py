"""Metadata store + reconciler lifecycle: the ingestion state machine."""

import jax.numpy as jnp
import pytest

from super_rag_tpu.config import Settings
from super_rag_tpu.engine.manager import EngineManager
from super_rag_tpu.store.db import Database
from super_rag_tpu.store.models import DocumentStatus, IndexStatus
from super_rag_tpu.store.objectstore import LocalObjectStore
from super_rag_tpu.tasks.document import DocumentIndexTask
from super_rag_tpu.tasks.reconciler import DocumentIndexReconciler
from super_rag_tpu.tasks.scheduler import InProcessScheduler

MD = b"""# Doc

## One

alpha bravo charlie delta echo foxtrot.

## Two

golf hotel india juliet kilo lima.
"""


@pytest.fixture
def stack(tmp_path):
    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    db = Database(cfg.resolved_db_path())
    objects = LocalObjectStore(cfg.objects_root())
    engines = EngineManager(cfg)
    task = DocumentIndexTask(db, objects, engines, cfg)
    reconciler = DocumentIndexReconciler(db)
    reconciler.scheduler = InProcessScheduler(task, reconciler.callbacks)
    return cfg, db, objects, engines, reconciler


def _create_doc(db, objects, coll, name="guide.md", data=MD):
    path = f"{coll['id']}/{name}"
    objects.put(path, data)
    doc = db.create_document(coll["id"], name, size=len(data),
                             object_path=path, content_hash="h1")
    db.upsert_document_index(doc["id"], "vector")
    return doc


def test_full_ingest_lifecycle(stack):
    cfg, db, objects, engines, rec = stack
    coll = db.create_collection("kb", "alice")
    doc = _create_doc(db, objects, coll)

    assert db.get_document(doc["id"])["status"] == DocumentStatus.PENDING.value
    n = rec.reconcile_all()
    assert n == 1

    idx = db.get_document_indexes(doc["id"])[0]
    assert idx["status"] == IndexStatus.ACTIVE.value
    assert idx["observed_version"] == idx["version"] == 1
    assert db.get_document(doc["id"])["status"] == DocumentStatus.COMPLETE.value

    # engine is searchable
    eng = engines.get(coll["id"], coll["config"])
    hits = eng.search("alpha bravo", top_k=2, mode="hybrid")
    assert hits and "alpha" in hits[0].text


def test_reindex_bumps_version_and_replaces_rows(stack):
    cfg, db, objects, engines, rec = stack
    coll = db.create_collection("kb", "alice")
    doc = _create_doc(db, objects, coll)
    rec.reconcile_all()
    eng = engines.get(coll["id"], coll["config"])
    live_before = eng.index.live_count

    # update content and re-index
    objects.put(doc["object_path"], b"# Doc\n\nnew content only zulu yankee.")
    db.upsert_document_index(doc["id"], "vector")
    idx = db.get_document_indexes(doc["id"])[0]
    assert idx["version"] == 2 and idx["status"] == IndexStatus.PENDING.value

    rec.reconcile_all()
    idx = db.get_document_indexes(doc["id"])[0]
    assert idx["status"] == IndexStatus.ACTIVE.value
    assert idx["observed_version"] == 2
    # old rows were deleted; new content replaces them
    hits = eng.search("zulu yankee", top_k=1, mode="fulltext")
    assert hits
    old = eng.search("alpha bravo charlie", top_k=3, mode="fulltext")
    assert all("alpha" not in h.text for h in old)
    assert eng.index.live_count <= live_before + 1


def test_delete_lifecycle(stack):
    cfg, db, objects, engines, rec = stack
    coll = db.create_collection("kb", "alice")
    doc = _create_doc(db, objects, coll)
    rec.reconcile_all()
    eng = engines.get(coll["id"], coll["config"])
    assert eng.index.live_count > 0

    db.mark_indexes_deleting(doc["id"])
    rec.reconcile_all()
    idx = db.get_document_indexes(doc["id"])[0]
    assert idx["status"] == IndexStatus.DELETED.value
    assert eng.index.live_count == 0


def test_failed_index_records_error_and_rebuild(stack):
    cfg, db, objects, engines, rec = stack
    coll = db.create_collection("kb", "alice")
    # document whose object is missing -> parse fails -> FAILED
    doc = db.create_document(coll["id"], "ghost.md", object_path="missing/x")
    db.upsert_document_index(doc["id"], "vector")
    rec.reconcile_all()
    idx = db.get_document_indexes(doc["id"])[0]
    assert idx["status"] == IndexStatus.FAILED.value
    assert idx["error_message"]
    assert db.get_document(doc["id"])["status"] == DocumentStatus.FAILED.value

    # rebuild re-drives it (still fails, but transitions through PENDING)
    assert db.rebuild_indexes(doc["id"], only_failed=True) == 1
    idx = db.get_document_indexes(doc["id"])[0]
    assert idx["status"] == IndexStatus.PENDING.value and idx["version"] == 2


def test_stale_completion_ignored(stack):
    """A v1 completion arriving after a v2 re-index must not flip status."""
    cfg, db, objects, engines, rec = stack
    coll = db.create_collection("kb", "alice")
    doc = _create_doc(db, objects, coll)
    idx = db.get_document_indexes(doc["id"])[0]

    # claim v1 (simulating an in-flight worker), then bump to v2
    assert db.claim_index(idx["id"], "PENDING", "CREATING", 1)
    db.upsert_document_index(doc["id"], "vector")  # v2, PENDING

    # stale v1 completion
    rec.callbacks.on_index_created(idx["id"], 1, {"rows": [99]})
    cur = db.get_document_indexes(doc["id"])[0]
    assert cur["observed_version"] == 0
    assert cur["status"] == IndexStatus.PENDING.value  # v2 still pending


def test_claim_is_atomic(stack):
    cfg, db, objects, engines, rec = stack
    coll = db.create_collection("kb", "alice")
    doc = _create_doc(db, objects, coll)
    idx = db.get_document_indexes(doc["id"])[0]
    assert db.claim_index(idx["id"], "PENDING", "CREATING", 1)
    # second claim on the same version must fail
    assert not db.claim_index(idx["id"], "PENDING", "CREATING", 1)


def test_requeue_stale(stack):
    cfg, db, objects, engines, rec = stack
    coll = db.create_collection("kb", "alice")
    doc = _create_doc(db, objects, coll)
    idx = db.get_document_indexes(doc["id"])[0]
    db.claim_index(idx["id"], "PENDING", "CREATING", 1)
    assert rec.requeue_stale(max_age_s=0.0) >= 1
    assert db.get_document_indexes(doc["id"])[0]["status"] == "PENDING"


def test_pipelined_ingest_lifecycle(stack):
    """ThreadScheduler with host prepare workers: parse/chunk fans out,
    commits stay FIFO on the device worker, results match in-process."""
    from super_rag_tpu.tasks.scheduler import ThreadScheduler

    cfg, db, objects, engines, rec = stack
    rec.scheduler = ThreadScheduler(rec.scheduler.task, rec.callbacks,
                                    host_workers=3)
    coll = db.create_collection("kb", "alice")
    docs = [
        _create_doc(db, objects, coll, name=f"d{i}.md",
                    data=MD + f"\n\n## Extra\n\nunique{i} token.".encode())
        for i in range(5)
    ]
    rec.reconcile_all()
    assert rec.scheduler.wait_idle(timeout=60)
    for i, doc in enumerate(docs):
        idx = db.get_document_indexes(doc["id"])[0]
        assert idx["status"] == IndexStatus.ACTIVE.value
    eng = engines.get(coll["id"], coll["config"])
    hits = eng.search("unique3", top_k=1, mode="fulltext")
    assert hits and "unique3" in hits[0].text
    rec.scheduler.shutdown()


def test_pipelined_prepare_failure_lands_failed(stack):
    from super_rag_tpu.tasks.scheduler import ThreadScheduler

    cfg, db, objects, engines, rec = stack
    rec.scheduler = ThreadScheduler(rec.scheduler.task, rec.callbacks,
                                    host_workers=2)
    coll = db.create_collection("kb", "alice")
    doc = db.create_document(coll["id"], "ghost.md", object_path="missing/x")
    db.upsert_document_index(doc["id"], "vector")
    rec.reconcile_all()
    assert rec.scheduler.wait_idle(timeout=60)
    idx = db.get_document_indexes(doc["id"])[0]
    assert idx["status"] == IndexStatus.FAILED.value
    assert idx["error_message"]
    rec.scheduler.shutdown()


def test_pipelined_update_commits_in_schedule_order(stack):
    """v1 and v2 of the same document prepare concurrently but commit in
    schedule order: the final index state is v2's content."""
    from super_rag_tpu.tasks.scheduler import ThreadScheduler

    cfg, db, objects, engines, rec = stack
    task = rec.scheduler.task
    sched = ThreadScheduler(task, rec.callbacks, host_workers=2)
    coll = db.create_collection("kb", "alice")
    doc = _create_doc(db, objects, coll)
    idx = db.get_document_indexes(doc["id"])[0]

    assert db.claim_index(idx["id"], "PENDING", "CREATING", 1)
    sched.schedule_create_index(idx["id"], doc["id"], "vector", 1)

    objects.put(doc["object_path"], b"# Doc\n\nzulu yankee replacement.")
    db.upsert_document_index(doc["id"], "vector")  # -> version 2
    assert db.claim_index(idx["id"], "PENDING", "CREATING", 2)
    sched.schedule_create_index(idx["id"], doc["id"], "vector", 2)

    assert sched.wait_idle(timeout=60)
    cur = db.get_document_indexes(doc["id"])[0]
    assert cur["observed_version"] == 2
    eng = engines.get(coll["id"], coll["config"])
    assert eng.search("zulu yankee", top_k=1, mode="fulltext")
    stale = eng.search("alpha bravo charlie", top_k=3, mode="fulltext")
    assert all("alpha" not in h.text for h in stale)
    sched.shutdown()


def test_objectstore_range_and_escape(tmp_path):
    store = LocalObjectStore(str(tmp_path / "obj"))
    store.put("a/b.bin", b"0123456789")
    assert store.get("a/b.bin") == b"0123456789"
    assert b"".join(store.stream_range("a/b.bin", 2, 5)) == b"234"
    assert store.obj_size("a/b.bin") == 10
    with pytest.raises(ValueError):
        store.get("../../etc/passwd")
    store.delete("a/b.bin")
    assert not store.exists("a/b.bin")


def test_marketplace_and_subscriptions(tmp_path):
    db = Database(str(tmp_path / "m.db"))
    coll = db.create_collection("public kb", "alice")
    db.publish_collection(coll["id"])
    assert any(m["collection_id"] == coll["id"] for m in db.list_marketplace())
    db.subscribe("bob", coll["id"])
    assert db.is_subscribed("bob", coll["id"])
    subs = db.list_subscriptions("bob")
    assert subs[0]["title"] == "public kb"
    db.unsubscribe("bob", coll["id"])
    assert not db.is_subscribed("bob", coll["id"])


def test_snapshot_roundtrip_via_manager(stack):
    cfg, db, objects, engines, rec = stack
    coll = db.create_collection("kb", "alice")
    _create_doc(db, objects, coll)
    rec.reconcile_all()
    engines.snapshot_all()

    fresh = EngineManager(cfg)
    eng = fresh.get(coll["id"], coll["config"])
    hits = eng.search("alpha bravo", top_k=1, mode="hybrid")
    assert hits


def test_recovery_after_lost_snapshots(stack):
    """ACTIVE indexes with lost device rows requeue and rebuild."""
    cfg, db, objects, engines, rec = stack
    coll = db.create_collection("kb", "alice")
    doc = _create_doc(db, objects, coll)
    rec.reconcile_all()
    assert db.get_document_indexes(doc["id"])[0]["status"] == "ACTIVE"

    # simulate a restart with no snapshots: fresh engine manager
    from super_rag_tpu.engine.manager import EngineManager
    fresh = EngineManager(cfg)
    assert fresh.get(coll["id"], coll["config"]).index.size == 0

    # in a real restart the whole context is fresh; point the index task
    # at the new manager before verification (it rebuilds inline)
    rec.scheduler.task.engines = fresh
    requeued = rec.verify_engine_state(fresh)
    assert requeued == 1
    idx = db.get_document_indexes(doc["id"])[0]
    assert idx["status"] == "ACTIVE" and idx["observed_version"] == idx["version"]
    eng = fresh.get(coll["id"], coll["config"])
    assert eng.search("alpha bravo", top_k=1, mode="hybrid")
    # verify is idempotent once healthy
    assert rec.verify_engine_state(fresh) == 0
