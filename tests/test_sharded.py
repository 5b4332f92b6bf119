"""Sharded search over an 8-device CPU mesh must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.ops.dense import Metric, build_corpus, dense_search, DenseCorpus
from super_rag_tpu.parallel.mesh import corpus_mesh, shard_corpus
from super_rag_tpu.parallel.sharded import sharded_dense_search


@pytest.fixture(scope="module")
def mesh():
    return corpus_mesh(jax.devices()[:8])


@pytest.mark.parametrize("metric", [Metric.COSINE, Metric.DOT, Metric.L2])
def test_sharded_matches_single(rng, mesh, metric):
    n, d, b, k = 4096, 64, 4, 10
    c = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    corpus = build_corpus(jnp.asarray(c), metric=metric, dtype=jnp.float32)

    gv, gi = dense_search(jnp.asarray(q), corpus, k=k, metric=metric)

    values, scales, norms = shard_corpus(
        mesh, corpus.values, corpus.scales, corpus.norms_sq
    )
    sharded = DenseCorpus(values=values, scales=scales, norms_sq=norms)
    sv, si = sharded_dense_search(
        jnp.asarray(q), sharded, k=k, mesh=mesh, metric=metric, block_size=256
    )
    for a, b_ in zip(np.asarray(si), np.asarray(gi)):
        assert set(a.tolist()) == set(b_.tolist())
    np.testing.assert_allclose(
        np.sort(np.asarray(sv)), np.sort(np.asarray(gv)), rtol=1e-4, atol=1e-4
    )


def test_sharded_with_mask_and_padding(rng, mesh):
    # 1000 rows does not divide 8 — padding rows must never win.
    n, d, b, k = 1000, 32, 2, 7
    c = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    corpus = build_corpus(jnp.asarray(c), dtype=jnp.float32)
    keep = np.zeros(n, bool)
    keep[100:200] = True

    gv, gi = dense_search(jnp.asarray(q), corpus, k=k, mask=jnp.asarray(keep))

    padded_n = -(-n // 8) * 8
    keep_padded = np.zeros(padded_n, bool)
    keep_padded[:n] = keep
    values, mask = shard_corpus(mesh, corpus.values, jnp.asarray(keep_padded))
    sharded = DenseCorpus(values=values)
    sv, si = sharded_dense_search(
        jnp.asarray(q), sharded, k=k, mesh=mesh, mask=mask, block_size=128
    )
    si = np.asarray(si)
    assert np.all((si >= 100) & (si < 200))
    for a, b_ in zip(si, np.asarray(gi)):
        assert set(a.tolist()) == set(b_.tolist())


def test_sharded_int8(rng, mesh):
    n, d, b, k = 2048, 64, 3, 10
    c = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    corpus = build_corpus(jnp.asarray(c), dtype=jnp.int8)
    gv, gi = dense_search(jnp.asarray(q), corpus, k=k)
    values, scales = shard_corpus(mesh, corpus.values, corpus.scales)
    sv, si = sharded_dense_search(
        jnp.asarray(q), DenseCorpus(values=values, scales=scales), k=k, mesh=mesh
    )
    for a, b_ in zip(np.asarray(si), np.asarray(gi)):
        assert set(a.tolist()) == set(b_.tolist())
