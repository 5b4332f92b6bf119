"""Multi-slice (DCN) scale-out: a 2-D (slice, corpus) mesh must return the
same results as the flat single-slice corpus mesh and the single chip.

The reference delegates all distribution to SeekDB (SURVEY.md 2.10); the
TPU build's cross-slice story is an explicit hierarchical merge — per-chip
top-k, ICI all_gather within the slice, then only the slice winners cross
the DCN axis (SURVEY.md 5.8).  On this image the 8 CPU devices stand in
for 2 slices x 4 chips; the collective structure (axis order, sizes) is
what these tests pin down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.engine.index import DeviceIndex, IndexSpec
from super_rag_tpu.engine.sharded_index import ShardedDeviceIndex
from super_rag_tpu.models.hash_embedder import HashEmbedder
from super_rag_tpu.ops.dense import DenseCorpus, Metric, build_corpus, dense_search
from super_rag_tpu.parallel.mesh import (
    SLICE_AXIS,
    multislice_mesh,
    row_axes,
    shard_corpus,
)
from super_rag_tpu.parallel.sharded import sharded_dense_search


@pytest.fixture(scope="module")
def mesh2x4(eight_devices):
    return multislice_mesh(2, eight_devices)


def test_mesh_shape(mesh2x4):
    assert mesh2x4.shape == {"slice": 2, "corpus": 4}
    assert row_axes(mesh2x4) == (SLICE_AXIS, "corpus")


def test_multislice_dense_matches_single(rng, mesh2x4):
    n, d, b, k = 4096, 64, 4, 10
    c = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    corpus = build_corpus(jnp.asarray(c), dtype=jnp.float32)

    gv, gi = dense_search(jnp.asarray(q), corpus, k=k)

    values, scales, norms = shard_corpus(
        mesh2x4, corpus.values, corpus.scales, corpus.norms_sq
    )
    sv, si = sharded_dense_search(
        jnp.asarray(q),
        DenseCorpus(values=values, scales=scales, norms_sq=norms),
        k=k, mesh=mesh2x4, block_size=256,
    )
    for a, b_ in zip(np.asarray(si), np.asarray(gi)):
        assert set(a.tolist()) == set(b_.tolist())
    np.testing.assert_allclose(
        np.sort(np.asarray(sv)), np.sort(np.asarray(gv)), rtol=1e-4, atol=1e-4
    )


def test_multislice_dense_masked(rng, mesh2x4):
    n, d, b, k = 1000, 32, 2, 7
    c = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    corpus = build_corpus(jnp.asarray(c), dtype=jnp.float32)
    keep = np.zeros(n, bool)
    keep[50:300] = True

    gv, gi = dense_search(jnp.asarray(q), corpus, k=k, mask=jnp.asarray(keep))

    padded_n = -(-n // 8) * 8
    keep_padded = np.zeros(padded_n, bool)
    keep_padded[:n] = keep
    values, mask = shard_corpus(mesh2x4, corpus.values, jnp.asarray(keep_padded))
    sv, si = sharded_dense_search(
        jnp.asarray(q), DenseCorpus(values=values), k=k, mesh=mesh2x4,
        mask=mask, block_size=128,
    )
    for a, b_ in zip(np.asarray(si), np.asarray(gi)):
        assert set(a.tolist()) == set(b_.tolist())


DOCS = [f"document {i} about topic{i % 13} and subject{i % 7}"
        for i in range(300)] + [
    "the quick brown fox jumps over the lazy dog",
    "TPU systolic arrays multiply matrices fast",
]


@pytest.fixture(scope="module")
def hybrid_pair(mesh2x4):
    spec = IndexSpec(dim=64, dtype=jnp.float32, vocab_size=1 << 14,
                     min_capacity=2048)
    emb = HashEmbedder(dim=64)
    vectors = np.asarray(emb.embed(DOCS))

    sharded = ShardedDeviceIndex(spec, mesh2x4)
    sharded.add(vectors, DOCS)

    local = DeviceIndex(spec)
    local.add(vectors, DOCS)
    return sharded, local, emb


def test_multislice_hybrid_matches_local(hybrid_pair):
    sharded, local, emb = hybrid_pair
    queries = ["fox jumping", "systolic matrices", "topic7 subject3"]
    q = np.asarray(emb.embed(queries))
    sres = sharded.search_hybrid(q, queries, k=5, candidates=20)
    lres = local.search_hybrid(jnp.asarray(q), queries, k=5, candidates=20)
    np.testing.assert_array_equal(np.asarray(sres.indices),
                                  np.asarray(lres.indices))
    np.testing.assert_allclose(np.asarray(sres.scores),
                               np.asarray(lres.scores), rtol=1e-4)


def test_multislice_hybrid_compacted(hybrid_pair):
    # inverted postings + per-shard IVF built over the 2-D mesh
    sharded, local, emb = hybrid_pair
    sharded.compact_lexical()
    queries = ["fox jumping", "topic3 subject5"]
    q = np.asarray(emb.embed(queries))
    sres = sharded.search_hybrid(q, queries, k=5, candidates=20)
    lres = local.search_hybrid(jnp.asarray(q), queries, k=5, candidates=20)
    np.testing.assert_array_equal(np.asarray(sres.indices),
                                  np.asarray(lres.indices))


def test_multislice_ivf_exact_at_full_nprobe(mesh2x4):
    spec = IndexSpec(dim=32, dtype=jnp.float32, vocab_size=1 << 14,
                     min_capacity=2048)
    idx = ShardedDeviceIndex(spec, mesh2x4)
    emb = HashEmbedder(dim=32)
    docs = [f"ivf doc {i} about cluster{i % 16}" for i in range(800)]
    idx.add(np.asarray(emb.embed(docs)), docs)
    queries = ["cluster7 document", "ivf doc 400"]
    q = np.asarray(emb.embed(queries))
    flat = idx.search_hybrid(q, queries, k=5, candidates=20)
    idx.compact_dense(nlist=4, nprobe=4, kmeans_iters=3)
    ivf = idx.search_hybrid(q, queries, k=5, candidates=20)
    assert (set(np.asarray(flat.indices)[0].tolist())
            == set(np.asarray(ivf.indices)[0].tolist()))
    assert len(idx._ivf["values"].sharding.device_set) == 8


def test_multislice_delete_and_snapshot(hybrid_pair, tmp_path):
    sharded, _, emb = hybrid_pair
    queries = ["fox jumping"]
    q = np.asarray(emb.embed(queries))
    res = sharded.search_hybrid(q, queries, k=3)
    top = int(np.asarray(res.indices)[0, 0])
    sharded.delete([top])
    res2 = sharded.search_hybrid(q, queries, k=3)
    assert top not in np.asarray(res2.indices)[0].tolist()
