"""Sharded mutable index over the 8-device CPU mesh: results must match
the single-chip DeviceIndex."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.engine.index import DeviceIndex, IndexSpec
from super_rag_tpu.engine.sharded_index import ShardedDeviceIndex
from super_rag_tpu.models.hash_embedder import HashEmbedder
from super_rag_tpu.parallel.mesh import corpus_mesh

DOCS = [f"document {i} about topic{i % 13} and subject{i % 7}"
        for i in range(200)] + [
    "the quick brown fox jumps over the lazy dog",
    "TPU systolic arrays multiply matrices fast",
]


@pytest.fixture(scope="module")
def pair(eight_devices):
    mesh = corpus_mesh(eight_devices)
    spec = IndexSpec(dim=64, dtype=jnp.float32, vocab_size=1 << 14,
                     min_capacity=2048)
    emb = HashEmbedder(dim=64)
    vectors = np.asarray(emb.embed(DOCS))

    sharded = ShardedDeviceIndex(spec, mesh)
    sharded.add(vectors, DOCS)

    local = DeviceIndex(spec)
    local.add(vectors, DOCS)
    return sharded, local, emb


def test_sharded_matches_local(pair):
    sharded, local, emb = pair
    queries = ["fox jumping", "systolic matrices", "topic7 subject3"]
    q = np.asarray(emb.embed(queries))
    sres = sharded.search_hybrid(q, queries, k=5, candidates=20)
    lres = local.search_hybrid(jnp.asarray(q), queries, k=5, candidates=20)
    np.testing.assert_array_equal(np.asarray(sres.indices),
                                  np.asarray(lres.indices))
    np.testing.assert_allclose(np.asarray(sres.scores),
                               np.asarray(lres.scores), rtol=1e-4)


def test_sharded_placement(pair):
    sharded, _, _ = pair
    # arrays really live sharded over the mesh
    assert len(sharded.emb.sharding.device_set) == 8
    assert sharded.emb.shape[0] % 8 == 0


def test_sharded_delete(pair):
    sharded, _, emb = pair
    queries = ["fox jumping"]
    q = np.asarray(emb.embed(queries))
    res = sharded.search_hybrid(q, queries, k=3)
    top = int(np.asarray(res.indices)[0, 0])
    sharded.delete([top])
    res2 = sharded.search_hybrid(q, queries, k=3)
    assert top not in np.asarray(res2.indices)[0].tolist()


def test_sharded_growth(eight_devices):
    mesh = corpus_mesh(eight_devices)
    spec = IndexSpec(dim=32, dtype=jnp.float32, vocab_size=1 << 14,
                     min_capacity=2048)
    idx = ShardedDeviceIndex(spec, mesh)
    emb = HashEmbedder(dim=32)
    for batch in range(3):
        docs = [f"growth batch {batch} doc {i}" for i in range(1200)]
        idx.add(np.asarray(emb.embed(docs)), docs)
    assert idx.size == 3600
    assert idx._capacity % (8 * 256) == 0
    q = np.asarray(emb.embed(["growth batch 2"]))
    res = idx.search_hybrid(q, ["growth batch 2 doc 7"], k=3)
    assert np.asarray(res.indices)[0, 0] >= 0


def test_sharded_int8(eight_devices):
    mesh = corpus_mesh(eight_devices)
    spec = IndexSpec(dim=32, dtype=jnp.int8, vocab_size=1 << 14,
                     min_capacity=2048)
    idx = ShardedDeviceIndex(spec, mesh)
    emb = HashEmbedder(dim=32)
    docs = [f"int8 sharded doc {i}" for i in range(100)]
    idx.add(np.asarray(emb.embed(docs)), docs)
    q = np.asarray(emb.embed(["int8 sharded doc 42"]))
    res = idx.search_hybrid(q, ["int8 sharded doc 42"], k=1)
    assert np.asarray(res.indices)[0, 0] == 42


def test_sharded_inverted_compaction(pair):
    """Per-shard inverted postings must reproduce the doc-major results."""
    sharded, local, emb = pair
    queries = ["fox jumping", "systolic matrices"]
    q = np.asarray(emb.embed(queries))
    before = sharded.search_hybrid(q, queries, k=5, candidates=20)
    sharded.compact_lexical(postings_per_term=64)
    after = sharded.search_hybrid(q, queries, k=5, candidates=20)
    np.testing.assert_array_equal(np.asarray(before.indices),
                                  np.asarray(after.indices))
    np.testing.assert_allclose(np.asarray(before.scores),
                               np.asarray(after.scores), rtol=2e-2, atol=1e-3)
    # postings tables really live sharded
    assert len(sharded._inv_ids.sharding.device_set) == 8


def test_sharded_filters(eight_devices):
    from super_rag_tpu.engine.index import FilterSpec, INDEXER_CODES

    mesh = corpus_mesh(eight_devices)
    spec = IndexSpec(dim=64, dtype=jnp.float32, vocab_size=1 << 14,
                     min_capacity=2048)
    emb = HashEmbedder(dim=64)
    idx = ShardedDeviceIndex(spec, mesh)
    idx.add(np.asarray(emb.embed(DOCS[:50])), DOCS[:50], indexer="vector")
    idx.add(np.asarray(emb.embed(["summary of everything fox"])),
            ["summary of everything fox"], indexer="summary")
    idx.add(np.asarray(emb.embed(["chat scoped fox document"])),
            ["chat scoped fox document"], chat_id="chat-1")

    q = np.asarray(emb.embed(["fox"]))
    # summary-only filter returns only the summary row
    flt = FilterSpec(indexers=frozenset({INDEXER_CODES["summary"]}))
    res = idx.search_hybrid(q, ["fox"], k=3, candidates=10, flt=flt)
    ids = [i for i in np.asarray(res.indices)[0].tolist() if i >= 0]
    assert ids == [50]
    # chat filter: scoped row visible + unscoped rows, not other chats
    from super_rag_tpu.engine.index import _chat_hash

    flt = FilterSpec(chat_hash=_chat_hash("chat-2"))
    res = idx.search_hybrid(q, ["fox"], k=52, candidates=60, flt=flt)
    ids = {i for i in np.asarray(res.indices)[0].tolist() if i >= 0}
    assert 51 not in ids  # chat-1's row is invisible to chat-2


def test_sharded_doc_rows_filter(eight_devices):
    """FilterSpec.doc_rows (KG as_of / live-pool allowlists) must apply
    on the sharded engine — r4 dryrun caught it being silently ignored —
    including on the fresh tail after compaction, and must match the
    single-device engine."""
    from super_rag_tpu.engine.index import FilterSpec

    mesh = corpus_mesh(eight_devices)
    spec = IndexSpec(dim=64, dtype=jnp.float32, vocab_size=1 << 14,
                     min_capacity=2048)
    emb = HashEmbedder(dim=64)
    vectors = np.asarray(emb.embed(DOCS))
    sharded = ShardedDeviceIndex(spec, mesh)
    sharded.add(vectors, DOCS)
    local = DeviceIndex(spec)
    local.add(vectors, DOCS)

    q = np.asarray(emb.embed(["fox jumping"]))
    allow = tuple(range(0, len(DOCS), 3))  # every 3rd row only
    flt = FilterSpec(doc_rows=allow)
    sres = sharded.search_hybrid(q, ["fox jumping"], k=5, flt=flt)
    lres = local.search_hybrid(jnp.asarray(q), ["fox jumping"], k=5, flt=flt)
    s_ids = [i for i in np.asarray(sres.indices)[0].tolist() if i >= 0]
    l_ids = [i for i in np.asarray(lres.indices)[0].tolist() if i >= 0]
    assert s_ids == l_ids
    assert all(i in allow for i in s_ids)

    # fresh tail: compact, then add rows NOT in the allowlist
    sharded.compact_lexical(postings_per_term=64)
    tail_docs = ["fresh fox tail row", "another fresh fox row"]
    sharded.add(np.asarray(emb.embed(tail_docs)), tail_docs)
    res2 = sharded.search_hybrid(q, ["fox jumping"], k=5, flt=flt)
    ids2 = [i for i in np.asarray(res2.indices)[0].tolist() if i >= 0]
    assert all(i in allow for i in ids2), "tail leaked through doc_rows"
    # and with the tail rows allowed, they surface
    flt2 = FilterSpec(doc_rows=allow + (len(DOCS), len(DOCS) + 1))
    res3 = sharded.search_hybrid(q, ["fox jumping"], k=5, flt=flt2)
    ids3 = [i for i in np.asarray(res3.indices)[0].tolist() if i >= 0]
    assert len(DOCS) in ids3 or len(DOCS) + 1 in ids3


def test_sharded_snapshot_roundtrip(pair, eight_devices):
    sharded, _, emb = pair
    mesh = corpus_mesh(eight_devices)
    arrays, host = sharded.snapshot_state()
    restored = ShardedDeviceIndex.from_snapshot(arrays, host, mesh)
    assert restored.size == sharded.size
    queries = ["fox jumping", "systolic matrices"]
    q = np.asarray(emb.embed(queries))
    a = sharded.search_hybrid(q, queries, k=5, candidates=20)
    b = restored.search_hybrid(q, queries, k=5, candidates=20)
    np.testing.assert_array_equal(np.asarray(a.indices),
                                  np.asarray(b.indices))


def test_sharded_pallas_path_matches_xla(pair):
    """The per-shard Pallas flat kernel (interpret mode on CPU) must agree
    with the blocked-XLA dense branch through the full SPMD program."""
    sharded, _, emb = pair
    queries = ["fox jumping", "topic7 subject3"]
    q = np.asarray(emb.embed(queries))
    xla = sharded.search_hybrid(q, queries, k=5, candidates=20,
                                use_pallas=False)
    pal = sharded.search_hybrid(q, queries, k=5, candidates=20,
                                use_pallas=True)
    np.testing.assert_array_equal(np.asarray(xla.indices),
                                  np.asarray(pal.indices))
    np.testing.assert_allclose(np.asarray(xla.scores),
                               np.asarray(pal.scores), rtol=1e-3)


def test_sharded_fresh_tail_after_compaction(eight_devices):
    """Rows added after compact_lexical stay findable through the
    replicated tail scan (no doc-major fallback, no recompaction)."""
    mesh = corpus_mesh(eight_devices)
    spec = IndexSpec(dim=32, dtype=jnp.float32, vocab_size=1 << 14,
                     min_capacity=2048)
    idx = ShardedDeviceIndex(spec, mesh)
    emb = HashEmbedder(dim=32)
    docs = [f"base doc {i} about topic{i % 5}" for i in range(100)]
    idx.add(np.asarray(emb.embed(docs)), docs)
    idx.compact_lexical(postings_per_term=64)
    idx.add(np.asarray(emb.embed(["a rare quokka grazes peacefully"])),
            ["a rare quokka grazes peacefully"])
    assert idx._inverted_upto < idx.size
    q = np.asarray(emb.embed(["quokka grazing"]))
    res = idx.search_hybrid(q, ["quokka grazing"], k=3)
    top = int(np.asarray(res.indices)[0, 0])
    assert idx.row_meta[top]["text"] == "a rare quokka grazes peacefully"
    # prefix rows still found through the inverted branch
    q2 = np.asarray(emb.embed(["topic3 base"]))
    res2 = idx.search_hybrid(q2, ["topic3 base doc"], k=3)
    assert int(np.asarray(res2.indices)[0, 0]) >= 0
    # tail rows respect deletes
    idx.delete([idx.size - 1])
    res3 = idx.search_hybrid(q, ["quokka grazing"], k=3)
    assert top not in np.asarray(res3.indices)[0].tolist()


def test_sharded_ivf_tier(eight_devices):
    """Per-shard IVF at nprobe=nlist is exact: results must match the flat
    path through the same SPMD program."""
    mesh = corpus_mesh(eight_devices)
    spec = IndexSpec(dim=32, dtype=jnp.float32, vocab_size=1 << 14,
                     min_capacity=2048)
    idx = ShardedDeviceIndex(spec, mesh)
    emb = HashEmbedder(dim=32)
    docs = [f"ivf doc {i} about cluster{i % 16}" for i in range(800)]
    idx.add(np.asarray(emb.embed(docs)), docs)
    queries = ["cluster7 document", "ivf doc 400"]
    q = np.asarray(emb.embed(queries))
    flat = idx.search_hybrid(q, queries, k=5, candidates=20)
    idx.compact_dense(nlist=4, nprobe=4, kmeans_iters=3)
    assert idx._ivf is not None
    ivf = idx.search_hybrid(q, queries, k=5, candidates=20)
    assert (set(np.asarray(flat.indices)[0].tolist())
            == set(np.asarray(ivf.indices)[0].tolist()))
    # IVF arrays live sharded over the mesh
    assert len(idx._ivf["values"].sharding.device_set) == 8


def test_sharded_ivf_int8_recall(eight_devices):
    """int8 per-shard IVF at partial nprobe keeps high recall vs flat."""
    mesh = corpus_mesh(eight_devices)
    spec = IndexSpec(dim=32, dtype=jnp.int8, vocab_size=1 << 14,
                     min_capacity=4096)
    idx = ShardedDeviceIndex(spec, mesh)
    rng = np.random.default_rng(5)
    n = 4000
    emb = rng.standard_normal((n, 32)).astype(np.float32)
    idx.add(emb, [f"doc {i}" for i in range(n)])
    q = emb[rng.integers(0, n, 8)] + 0.1 * rng.standard_normal((8, 32))
    flat = idx.search_hybrid(q, ["x"] * 8, k=10, candidates=32)
    idx.compact_dense(nlist=16, nprobe=8, kmeans_iters=4)
    ivf = idx.search_hybrid(q, ["x"] * 8, k=10, candidates=32)
    fi, ii = np.asarray(flat.indices), np.asarray(ivf.indices)
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(ii, fi)
    ])
    assert recall >= 0.8, recall
