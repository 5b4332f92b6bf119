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
