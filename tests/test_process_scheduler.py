"""ProcessScheduler: the Ray-shaped cross-process ingest contract —
parse/chunk runs in real subprocesses (tasks/worker.py), Parts/Chunks
return over a pipe, commits stay FIFO in the parent (reference
tasks/scheduler.py:91-166 RayTaskScheduler role)."""

import time

import pytest

from super_rag_tpu.chunk.chunking import Chunk
from super_rag_tpu.config import Settings
from super_rag_tpu.engine.manager import EngineManager
from super_rag_tpu.fileparser.base import AssetBinPart, TitlePart
from super_rag_tpu.store.db import Database
from super_rag_tpu.store.models import IndexStatus
from super_rag_tpu.store.objectstore import LocalObjectStore
from super_rag_tpu.tasks.document import DocumentIndexTask
from super_rag_tpu.tasks.reconciler import DocumentIndexReconciler
from super_rag_tpu.tasks.scheduler import ProcessScheduler
from super_rag_tpu.tasks.worker import (
    chunk_from_wire,
    chunk_to_wire,
    part_from_wire,
    part_to_wire,
)

MD = b"""# Doc

## One

alpha bravo charlie delta echo foxtrot.

## Two

golf hotel india juliet kilo lima.
"""


def test_wire_roundtrip_parts_and_chunks():
    t = TitlePart(content="Head", level=2)
    assert part_from_wire(part_to_wire(t)) == t
    a = AssetBinPart(content="img", data=b"\x00\xffPNG", mime_type="image/png",
                     asset_id="a1")
    b = part_from_wire(part_to_wire(a))
    assert isinstance(b, AssetBinPart) and b.data == a.data \
        and b.mime_type == "image/png"
    c = Chunk(text="body", title_path=("Doc", "One"), metadata={"k": 1})
    assert chunk_from_wire(chunk_to_wire(c)) == c


@pytest.fixture
def stack(tmp_path):
    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    db = Database(cfg.resolved_db_path())
    objects = LocalObjectStore(cfg.objects_root())
    engines = EngineManager(cfg)
    task = DocumentIndexTask(db, objects, engines, cfg)
    reconciler = DocumentIndexReconciler(db)
    sched = ProcessScheduler(task, reconciler.callbacks, process_workers=2)
    reconciler.scheduler = sched
    yield cfg, db, objects, engines, reconciler, sched
    sched.shutdown()


def _create_doc(db, objects, coll, name="guide.md", data=MD, chash="h1"):
    path = f"{coll['id']}/{name}"
    objects.put(path, data)
    doc = db.create_document(coll["id"], name, size=len(data),
                             object_path=path, content_hash=chash)
    db.upsert_document_index(doc["id"], "vector")
    return doc


def _wait_active(db, doc_id, timeout=30.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        rows = db.get_document_indexes(doc_id)
        if rows and rows[0]["status"] == IndexStatus.ACTIVE.value:
            return rows[0]
        if rows and rows[0]["status"] == IndexStatus.FAILED.value:
            return rows[0]
        time.sleep(0.1)
    raise AssertionError("index never settled")


def test_ingest_through_subprocess(stack):
    cfg, db, objects, engines, rec, sched = stack
    coll = db.create_collection("kb", "alice")
    doc = _create_doc(db, objects, coll)
    assert rec.reconcile_all() == 1
    assert sched.wait_idle(30)
    idx = _wait_active(db, doc["id"])
    assert idx["status"] == IndexStatus.ACTIVE.value
    eng = engines.get(coll["id"], coll["config"])
    hits = eng.search("alpha bravo", top_k=2, mode="hybrid")
    assert hits and "alpha" in hits[0].text
    # the parse really happened out of process: the worker pool exists
    # and at least one worker served a request
    assert any(w.proc.poll() is None for w in sched._procs)


def test_two_documents_parallel_prepare(stack):
    cfg, db, objects, engines, rec, sched = stack
    coll = db.create_collection("kb", "alice")
    d1 = _create_doc(db, objects, coll, name="a.md",
                     data=b"# A\n\nalpha only text.", chash="ha")
    d2 = _create_doc(db, objects, coll, name="b.md",
                     data=b"# B\n\nbravo only text.", chash="hb")
    assert rec.reconcile_all() == 2
    assert sched.wait_idle(30)
    assert _wait_active(db, d1["id"])["status"] == IndexStatus.ACTIVE.value
    assert _wait_active(db, d2["id"])["status"] == IndexStatus.ACTIVE.value
    eng = engines.get(coll["id"], coll["config"])
    assert eng.search("alpha", top_k=1)[0].text.find("alpha") >= 0
    assert eng.search("bravo", top_k=1)


def test_worker_survives_bad_request(stack):
    cfg, db, objects, engines, rec, sched = stack
    w = sched._procs[0]
    resp = w.call({"op": "nope"})
    assert resp["ok"] is False
    resp = w.call({"op": "ping"})
    assert resp["ok"] and resp["pong"]
    # a prepare for a missing document reports, doesn't kill the worker
    resp = w.call({"op": "prepare", "document_id": "missing",
                   "index_type": "vector",
                   "db_path": db.path,
                   "objects_root": objects.root})
    assert resp["ok"] is False and "not found" in resp["error"]
    assert w.call({"op": "ping"})["ok"]


def test_wire_config_ships_store_type():
    """ProcessScheduler ships the object-store config over the wire; a
    non-reconstructible store (test transport) falls back to in-process
    prepare instead of handing workers root='' (ADVICE r3 #5)."""
    import httpx

    from super_rag_tpu.store.objectstore import S3ObjectStore

    local = LocalObjectStore("/tmp/wirecfg-test")
    assert local.wire_config() == {"store_type": "local",
                                   "root": "/tmp/wirecfg-test"}
    s3 = S3ObjectStore("b", endpoint_url="https://s3.test", access_key="AK",
                       secret_key="SK", region="r1")
    cfg = s3.wire_config()
    assert cfg["store_type"] == "s3" and cfg["bucket"] == "b" \
        and cfg["endpoint_url"] == "https://s3.test" \
        and cfg["secret_key"] == "SK"
    stub = S3ObjectStore(
        "b", endpoint_url="https://s3.test", access_key="AK",
        secret_key="SK",
        transport=httpx.MockTransport(lambda r: httpx.Response(200)),
    )
    assert stub.wire_config() is None


def test_s3_backed_process_scheduler_falls_back_in_process(tmp_path):
    """End-to-end: ingest_backend=process + a stub S3 store still
    indexes (prepare runs in the parent thread, not a broken worker)."""
    import httpx

    from super_rag_tpu.store.objectstore import S3ObjectStore
    from tests.test_s3 import StubS3

    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    db = Database(cfg.resolved_db_path())
    stub = StubS3()
    objects = S3ObjectStore("b", endpoint_url="https://s3.test",
                            access_key="AK", secret_key="SK",
                            transport=httpx.MockTransport(stub.handler))
    engines = EngineManager(cfg)
    task = DocumentIndexTask(db, objects, engines, cfg)
    reconciler = DocumentIndexReconciler(db)
    sched = ProcessScheduler(task, reconciler.callbacks, process_workers=1)
    reconciler.scheduler = sched
    try:
        coll = db.create_collection("kb", "alice")
        doc = _create_doc(db, objects, coll)
        assert reconciler.reconcile_all() == 1
        assert sched.wait_idle(30)
        idx = _wait_active(db, doc["id"])
        assert idx["status"] == IndexStatus.ACTIVE.value
        eng = engines.get(coll["id"], coll["config"])
        assert eng.search("alpha bravo", top_k=2, mode="hybrid")
    finally:
        sched.shutdown()


def test_missing_document_fails_index(stack):
    cfg, db, objects, engines, rec, sched = stack
    coll = db.create_collection("kb", "alice")
    doc = _create_doc(db, objects, coll)
    # delete the object so both worker prepare AND parent fallback fail
    objects.delete(f"{coll['id']}/guide.md")
    rec.reconcile_all()
    sched.wait_idle(30)
    idx = _wait_active(db, doc["id"])
    assert idx["status"] == IndexStatus.FAILED.value
    assert idx["error_message"]


def test_ray_backend_falls_back_without_ray(tmp_path, caplog):
    """INGEST_BACKEND=ray on a ray-less image must degrade to the
    ProcessScheduler (same wire contract), not crash (PARITY provider
    boundary)."""
    import importlib.util

    from super_rag_tpu.service.context import build_context

    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14,
                   ingest_backend="ray")
    ctx = build_context(cfg, background_tasks=True)
    try:
        name = type(ctx.scheduler).__name__
        if importlib.util.find_spec("ray") is None:
            assert name == "ProcessScheduler"
        else:  # pragma: no cover — image has ray
            assert name == "RayTaskScheduler"
    finally:
        ctx.scheduler.shutdown()


def test_prepare_on_host_is_remote_shaped(tmp_path):
    """prepare_on_host (the Ray remote body) returns the pure wire dict
    given only serializable args — no live objects cross the boundary."""
    from super_rag_tpu.tasks.worker import prepare_on_host, prepared_from_wire

    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    db = Database(cfg.resolved_db_path())
    objects = LocalObjectStore(cfg.objects_root())
    coll = db.create_collection("kb", "alice")
    doc = _create_doc(db, objects, coll)
    wire = prepare_on_host(doc["id"], "vector", db.path,
                           object_store=objects.wire_config(),
                           chunk_size=400, chunk_overlap=20)
    import json as _json

    _json.dumps(wire)  # JSON-serializable end to end
    prepared = prepared_from_wire(wire)
    assert prepared["document_id"] == doc["id"]
    assert prepared["chunks"] and prepared["parts"]


class _FakeRay:
    """Minimal in-process stand-in for the ray API surface the adapter
    uses: remote(fn) -> .remote(*a, **kw) handles resolved by get().
    Arguments are round-tripped through JSON to enforce the same
    by-value serialization boundary real Ray imposes."""

    def __init__(self):
        import json

        self._json = json
        self._inited = False
        self.remote_calls = 0

    def is_initialized(self):
        return self._inited

    def init(self, address=None, ignore_reinit_error=False,
             include_dashboard=False):
        self._inited = True

    def remote(self, fn):
        fake = self

        class _Remote:
            def remote(self, *args, **kwargs):
                fake.remote_calls += 1
                # ship args by value, as ray would
                args = fake._json.loads(fake._json.dumps(args))
                kwargs = fake._json.loads(fake._json.dumps(kwargs))
                return ("ref", fn, args, kwargs)

        return _Remote()

    def get(self, ref):
        tag, fn, args, kwargs = ref
        assert tag == "ref"
        out = fn(*args, **kwargs)
        # results come back by value too
        return self._json.loads(self._json.dumps(out))


def test_ray_scheduler_end_to_end_with_fake_ray(tmp_path, monkeypatch):
    """Drive RayTaskScheduler itself (not the fallback): prepare runs
    through the fake ray remote boundary by value, commit stays FIFO in
    the parent, and the index lands ACTIVE + searchable."""
    import sys

    from super_rag_tpu.tasks.scheduler import RayTaskScheduler

    fake = _FakeRay()
    monkeypatch.setitem(sys.modules, "ray", fake)

    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    db = Database(cfg.resolved_db_path())
    objects = LocalObjectStore(cfg.objects_root())
    engines = EngineManager(cfg)
    task = DocumentIndexTask(db, objects, engines, cfg)
    reconciler = DocumentIndexReconciler(db)
    sched = RayTaskScheduler(task, reconciler.callbacks, ray_workers=2)
    reconciler.scheduler = sched
    try:
        assert fake.is_initialized()
        coll = db.create_collection("kb", "alice")
        doc = _create_doc(db, objects, coll)
        assert reconciler.reconcile_all() == 1
        assert sched.wait_idle(30)
        idx = _wait_active(db, doc["id"])
        assert idx["status"] == IndexStatus.ACTIVE.value
        assert fake.remote_calls == 1  # prepare crossed the ray boundary
        eng = engines.get(coll["id"], coll["config"])
        hits = eng.search("alpha bravo", top_k=2, mode="hybrid")
        assert hits and "alpha" in hits[0].text
    finally:
        sched.shutdown()
