"""Fused hybrid program vs the separate-dispatch reference composition."""

import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.engine.collection import CollectionEngine
from super_rag_tpu.engine.index import DeviceIndex, FilterSpec, IndexSpec
from super_rag_tpu.ops.fusion import rrf_fuse

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped across a sleepy canine",
    "TPU systolic arrays multiply matrices fast",
    "JAX compiles numpy programs to XLA",
    "the dog sleeps while the fox runs through the woods",
    "matrix multiplication throughput dominates inference",
    "reciprocal rank fusion merges ranked lists",
    "BM25 is a lexical scoring function for search engines",
]


@pytest.fixture(scope="module")
def engine():
    eng = CollectionEngine(IndexSpec(dim=64, dtype=jnp.float32,
                                     vocab_size=1 << 14))
    eng.ingest(DOCS)
    return eng


def reference_hybrid(idx: DeviceIndex, q_emb, queries, k, candidates):
    """Two dispatches + host-visible RRF via ops.fusion (the pre-fusion
    composition) — the gold for the fused program."""
    dv, di = idx.search_dense(q_emb, candidates)
    lv, li = idx.search_bm25(queries, candidates)
    di = jnp.where(jnp.isfinite(dv), di, -1)
    li = jnp.where(jnp.isfinite(lv) & (lv > 0), li, -1)
    return rrf_fuse(di.astype(jnp.int32), li.astype(jnp.int32), k=k)


def test_fused_matches_composed(engine):
    queries = ["fox jumping dog", "matrix multiplication hardware",
               "rank fusion"]
    q_emb = jnp.asarray(np.asarray(engine.embedder.embed(queries)))
    res = engine.index.search_hybrid(q_emb, queries, k=5, candidates=8)
    gv, gi = reference_hybrid(engine.index, q_emb, queries, 5, 8)
    np.testing.assert_array_equal(np.asarray(res.indices), np.asarray(gi))
    np.testing.assert_allclose(np.asarray(res.scores), np.asarray(gv),
                               rtol=1e-5)


def test_fused_respects_filter(engine):
    queries = ["fox"]
    q_emb = jnp.asarray(np.asarray(engine.embedder.embed(queries)))
    keep = np.zeros(engine.index._capacity, bool)
    keep[1] = True
    res = engine.index.search_hybrid(
        q_emb, queries, k=3, candidates=4,
        flt=None,
    )
    # no filter: row 0 or 1 should win for 'fox'
    assert np.asarray(res.indices)[0, 0] in (0, 1, 4)


def test_engine_hybrid_mode_uses_fused(engine):
    hits = engine.search("fox jumping dog", top_k=3, mode="hybrid")
    assert hits and hits[0].recall_type == "hybrid"
    assert any("fox" in h.text for h in hits)


def test_branch_scores_populated(engine):
    queries = ["systolic arrays multiply"]
    q_emb = jnp.asarray(np.asarray(engine.embedder.embed(queries)))
    res = engine.index.search_hybrid(q_emb, queries, k=3, candidates=6)
    top = np.asarray(res.indices)[0, 0]
    assert top == 2  # the TPU doc
    assert np.asarray(res.bm25_scores)[0, 0] > 0  # matched lexically too
    assert np.asarray(res.dense_scores)[0, 0] != 0


def test_autocompacted_inverted_matches_doc_major(rng):
    """After compaction the hybrid path flips to the inverted index and
    must keep returning the same winners."""
    import jax.numpy as jnp_
    eng = CollectionEngine(IndexSpec(dim=32, dtype=jnp_.float32,
                                     vocab_size=1 << 14))
    eng.index.auto_compact_rows = 4  # force compaction quickly
    eng.ingest(DOCS)
    before = eng.search("fox jumping dog", top_k=3, mode="hybrid")
    eng.index.compact_lexical()
    assert eng.index._inverted_upto == eng.index.size
    after = eng.search("fox jumping dog", top_k=3, mode="hybrid")
    assert [h.row for h in before] == [h.row for h in after]
    # fresh-tail path: insert after compaction, result still findable
    eng.index.auto_compact_rows = 10_000
    eng.ingest(["a brand new doc about quokkas"])
    hits = eng.search("quokkas", top_k=2, mode="fulltext")
    assert hits and "quokkas" in hits[0].text


def test_hybrid_with_ivf_tier(rng):
    """IVF-backed hybrid matches flat hybrid at nprobe=nlist."""
    import jax.numpy as jnp_
    eng = CollectionEngine(IndexSpec(dim=32, dtype=jnp_.float32,
                                     vocab_size=1 << 14))
    docs = [f"doc {i} about topic{i % 10}" for i in range(400)]
    eng.ingest(docs)
    flat = eng.search("doc about topic3", top_k=5, mode="hybrid")
    # compact only the dense tier: at nprobe=nlist the IVF branch is
    # exact, so the fused result must be identical (lexical compaction
    # would reorder bm25 ties via bf16 impact rounding — separate test)
    eng.index.compact_dense(nlist=8, nprobe=8, kmeans_iters=3)
    ivf = eng.search("doc about topic3", top_k=5, mode="hybrid")
    assert {h.row for h in flat} == {h.row for h in ivf}


def test_fresh_tail_after_compaction_in_fused_path(rng):
    """Rows inserted after compaction stay lexically findable through the
    fused program's sliced tail scan."""
    import jax.numpy as jnp_
    eng = CollectionEngine(IndexSpec(dim=32, dtype=jnp_.float32,
                                     vocab_size=1 << 14))
    eng.ingest([f"base doc {i} about topic{i % 5}" for i in range(50)])
    eng.index.compact_lexical()
    eng.index.auto_compact_rows = 100_000  # keep the tail fresh
    eng.ingest(["a rare quagga grazes on the plain"])
    assert eng.index._inverted_upto < eng.index.size
    hits = eng.search("quagga grazing", top_k=3, mode="hybrid")
    assert hits and any("quagga" in h.text for h in hits)
    # prefix content still found through the inverted branch
    hits2 = eng.search("topic3 base", top_k=3, mode="hybrid")
    assert hits2
