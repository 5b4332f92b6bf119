"""DeviceIndex + CollectionEngine lifecycle: insert, search, filter,
delete, snapshot/restore."""

import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.engine.collection import CollectionEngine
from super_rag_tpu.engine.index import DeviceIndex, FilterSpec, IndexSpec
from super_rag_tpu.engine.snapshot import load_index, save_index, snapshot_exists

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped across a sleepy canine",
    "TPU systolic arrays multiply matrices fast",
    "JAX compiles numpy programs to XLA",
    "the dog sleeps while the fox runs",
    "matrix multiplication throughput dominates inference",
]


@pytest.fixture
def engine():
    eng = CollectionEngine(IndexSpec(dim=64, dtype=jnp.float32, vocab_size=1 << 14))
    eng.ingest(DOCS, metadata=[{"doc_id": f"d{i}"} for i in range(len(DOCS))])
    return eng


def test_dense_search_returns_relevant(engine):
    hits = engine.search("fox jumping over dogs", top_k=3, mode="dense")
    assert len(hits) == 3
    texts = [h.text for h in hits]
    assert any("fox" in t for t in texts)
    assert hits[0].score >= hits[-1].score
    assert hits[0].metadata["doc_id"].startswith("d")


def test_fulltext_search(engine):
    hits = engine.search("systolic arrays", top_k=2, mode="fulltext")
    assert hits and hits[0].text == DOCS[2]
    assert hits[0].recall_type == "fulltext_search"


def test_hybrid_beats_padding(engine):
    hits = engine.search("fox", top_k=4, mode="hybrid")
    assert 1 <= len(hits) <= 4
    assert all(h.row >= 0 for h in hits)


def test_delete_removes_from_results(engine):
    hits = engine.search("systolic arrays", top_k=1, mode="fulltext")
    engine.delete([hits[0].row])
    hits2 = engine.search("systolic arrays", top_k=3, mode="fulltext")
    assert all(h.row != hits[0].row for h in hits2)
    assert engine.index.live_count == len(DOCS) - 1


def test_chat_filter():
    eng = CollectionEngine(IndexSpec(dim=32, dtype=jnp.float32, vocab_size=1 << 14))
    eng.ingest(["shared doc about foxes"], indexer="vector")
    eng.ingest(["private chat doc about foxes"], chat_id="chat-1")
    eng.ingest(["other chat doc about foxes"], chat_id="chat-2")
    # unscoped query sees everything unscoped + nothing? reference semantics:
    # chat filter shows unscoped rows OR matching chat rows
    hits = eng.search("foxes", top_k=5, mode="dense", chat_id="chat-1")
    texts = {h.text for h in hits}
    assert "private chat doc about foxes" in texts
    assert "other chat doc about foxes" not in texts
    assert "shared doc about foxes" in texts


def test_indexer_filter():
    eng = CollectionEngine(IndexSpec(dim=32, dtype=jnp.float32, vocab_size=1 << 14))
    eng.ingest(["vector indexed doc"], indexer="vector")
    eng.ingest(["summary of the document"], indexer="summary")
    hits = eng.search("doc", top_k=5, mode="dense", index_types=["summary"])
    assert {h.text for h in hits} == {"summary of the document"}


def test_rerank_with_custom_reranker():
    def reverse_reranker(query, texts):
        # score by index: later texts win — proves reranker is applied
        return np.arange(len(texts), dtype=np.float32)

    eng = CollectionEngine(
        IndexSpec(dim=32, dtype=jnp.float32, vocab_size=1 << 14),
        reranker=reverse_reranker,
    )
    eng.ingest(DOCS)
    base = eng.search("fox", top_k=3, mode="hybrid", rerank=False)
    rr = eng.search("fox", top_k=3, mode="hybrid", rerank=True, candidates=6)
    assert all(h.recall_type == "reranked" for h in rr)
    if len(base) >= 2:
        assert [h.row for h in rr] != [h.row for h in base] or len(rr) == 1


def test_capacity_growth():
    idx = DeviceIndex(IndexSpec(dim=8, dtype=jnp.float32, min_capacity=256,
                                vocab_size=1 << 14))
    rng = np.random.default_rng(0)
    for _ in range(3):
        idx.add(rng.standard_normal((200, 8)), [f"doc {i}" for i in range(200)])
    assert idx.size == 600
    assert idx._capacity >= 600 + 256
    v, i = idx.search_dense(jnp.asarray(rng.standard_normal((1, 8)),
                                        jnp.float32), k=5)
    assert np.all(np.asarray(i) < 600)


def test_int8_index_roundtrip(rng):
    idx = DeviceIndex(IndexSpec(dim=64, dtype=jnp.int8, vocab_size=1 << 14))
    x = rng.standard_normal((100, 64)).astype(np.float32)
    idx.add(x, [f"t{i}" for i in range(100)])
    q = jnp.asarray(x[17:18])
    v, i = idx.search_dense(q, k=1)
    assert int(np.asarray(i)[0, 0]) == 17  # self-match survives int8


def test_delete_at_full_capacity_keeps_last_row(tmp_path):
    # Regression (ADVICE r1, high): delete-row padding of -1 wrapped to the
    # last row via jax negative indexing whenever size == capacity (e.g.
    # after from_snapshot restores exactly capacity rows), silently
    # invalidating the final live row.
    idx = DeviceIndex(IndexSpec(dim=8, dtype=jnp.float32, min_capacity=64,
                                vocab_size=1 << 14))
    rng = np.random.default_rng(3)
    idx.add(rng.standard_normal((64, 8)), [f"doc {i}" for i in range(64)])
    path = str(tmp_path / "full")
    save_index(idx, path)
    restored = load_index(path)
    assert restored.size == restored.valid.shape[0]  # the trap: no slack
    restored.delete([5])
    valid = np.asarray(restored.valid)
    assert not valid[5]
    assert valid[63], "deleting row 5 must not invalidate the last row"
    assert valid.sum() == 63


def test_snapshot_restore(tmp_path, engine):
    path = str(tmp_path / "snap")
    save_index(engine.index, path)
    assert snapshot_exists(path)
    restored = load_index(path)
    assert restored.size == engine.index.size
    assert restored.df.num_docs == engine.index.df.num_docs

    eng2 = CollectionEngine(restored.spec)
    eng2.index = restored
    h1 = engine.search("fox jumps", top_k=3, mode="hybrid")
    h2 = eng2.search("fox jumps", top_k=3, mode="hybrid")
    assert [h.row for h in h1] == [h.row for h in h2]
    np.testing.assert_allclose(
        [h.score for h in h1], [h.score for h in h2], rtol=1e-3
    )


def test_empty_engine_search():
    eng = CollectionEngine(IndexSpec(dim=16, dtype=jnp.float32, vocab_size=1 << 14))
    assert eng.search("anything", top_k=3) == []


def test_concurrent_insert_and_search_race():
    """Background inserts donate device buffers; concurrent searches must
    never observe a deleted array (the index serializes internally)."""
    import threading

    eng = CollectionEngine(IndexSpec(dim=16, dtype=jnp.float32,
                                     min_capacity=512, vocab_size=1 << 14))
    eng.ingest([f"seed doc {i} fox" for i in range(20)])
    errors = []
    stop = threading.Event()

    def inserter():
        i = 0
        while not stop.is_set() and i < 30:
            try:
                eng.ingest([f"new doc {i} badger"])
            except Exception as e:  # noqa: BLE001
                errors.append(e)
            i += 1

    def searcher():
        while not stop.is_set():
            try:
                eng.search("fox badger", top_k=3, mode="hybrid")
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    threads = [threading.Thread(target=inserter)] + [
        threading.Thread(target=searcher) for _ in range(2)
    ]
    for t in threads:
        t.start()
    threads[0].join(30)
    stop.set()
    for t in threads[1:]:
        t.join(10)
    assert not errors, errors[:2]


def test_snapshot_restore_bf16(tmp_path):
    """bf16 storage must survive the npz round trip (ml_dtypes.bfloat16
    saves as a raw void dtype unless converted)."""
    eng = CollectionEngine(IndexSpec(dim=32, dtype=jnp.bfloat16,
                                     vocab_size=1 << 14))
    eng.ingest(["bf16 snapshot doc about pelicans"])
    path = str(tmp_path / "bf16snap")
    save_index(eng.index, path)
    restored = load_index(path)
    assert restored.emb.dtype == jnp.bfloat16
    eng2 = CollectionEngine(restored.spec)
    eng2.index = restored
    hits = eng2.search("pelicans", top_k=1, mode="hybrid")
    assert hits and "pelicans" in hits[0].text


def test_per_collection_hybrid_opts_reach_the_program(monkeypatch):
    """Collection config {"hybrid": {...}} flows manager -> engine ->
    DeviceIndex.search_hybrid (the per-collection fidelity/QPS knobs)."""
    from super_rag_tpu.config import Settings
    from super_rag_tpu.engine.manager import EngineManager

    cfg = Settings(data_dir="/tmp/hybrid_opts_test", embedding_dim=32,
                   index_dtype="float32", vocab_size=1 << 14)
    mgr = EngineManager(cfg)
    eng = mgr.get("c1", {"hybrid": {"rescore": False,
                                    "postings_per_query_term": 128}})
    assert eng.hybrid_opts == {"rescore": False,
                               "postings_per_query_term": 128}
    eng.ingest(["quokka document about marsupials", "other text entirely"])

    seen = {}
    orig = eng.index.search_hybrid

    def spy(*a, **kw):
        seen.update(kw)
        return orig(*a, **kw)

    monkeypatch.setattr(eng.index, "search_hybrid", spy)
    hits = eng.search("quokka marsupials", top_k=1, mode="hybrid")
    assert hits and "quokka" in hits[0].text
    assert seen["rescore"] is False
    assert seen["postings_per_query_term"] == 128


def test_batched_delete_matches_per_row_semantics():
    # Regression (r5 churn bench): delete() used to gather terms and
    # doc_len per row — two device round-trips per deleted row, ~20 min
    # for a 16k-row delete through the ~30 ms relay.  The batched path
    # must leave EXACTLY the per-row df/valid state: duplicates in the
    # rows list decrement df once, dead and out-of-range rows are
    # ignored, and avgdl tracks the surviving docs.
    spec = IndexSpec(dim=16, dtype=jnp.float32, vocab_size=1 << 14)
    texts = [f"alpha beta w{i} w{i} gamma" for i in range(12)]
    a = DeviceIndex(spec)
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((12, 16)).astype(np.float32)
    a.add(emb, texts)

    b = DeviceIndex(spec)
    b.add(emb, texts)

    # batched: dups + a dead row (deleted twice) + out-of-range
    a.delete([1, 3, 3, 5])
    a.delete([5, 9, 10_000])
    # per-row reference: one call per unique live row
    for r in (1, 3, 5, 9):
        b.delete([r])

    assert a.live_count == b.live_count == 8
    assert a.df.num_docs == b.df.num_docs == 8
    assert a.df._df == b.df._df
    assert a.df.avgdl == b.df.avgdl
    assert [m is None for m in a.row_meta] == [m is None for m in b.row_meta]
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
