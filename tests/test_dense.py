"""Dense search: blocked top-k must agree with NumPy brute force."""

import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.ops.dense import (
    Metric,
    build_corpus,
    dense_search,
    exact_scores,
)
from super_rag_tpu.ops.topk import blockwise_topk, merge_topk


def brute_force(q, c, k, metric):
    q = q.astype(np.float32)
    c = c.astype(np.float32)
    if metric == Metric.COSINE:
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        c = c / np.linalg.norm(c, axis=-1, keepdims=True)
        s = q @ c.T
    elif metric == Metric.DOT:
        s = q @ c.T
    else:
        s = -np.sum((q[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    idx = np.argsort(-s, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=-1), idx


@pytest.mark.parametrize("metric", [Metric.COSINE, Metric.DOT, Metric.L2])
def test_small_exact(rng, metric):
    q = rng.standard_normal((4, 64)).astype(np.float32)
    c = rng.standard_normal((500, 64)).astype(np.float32)
    corpus = build_corpus(jnp.asarray(c), metric=metric, dtype=jnp.float32)
    v, i = dense_search(jnp.asarray(q), corpus, k=10, metric=metric)
    gv, gi = brute_force(q, c, 10, metric)
    assert set(map(tuple, np.asarray(i))) == set(map(tuple, gi)) or np.all(
        np.asarray(i) == gi
    )
    if metric == Metric.L2:
        # engine returns 2q.e - ||e||^2; gold returns -||q-e||^2. Both rank
        # identically; compare index sets per query row.
        for row_i, row_g in zip(np.asarray(i), gi):
            assert set(row_i) == set(row_g)
    else:
        np.testing.assert_allclose(np.asarray(v), gv, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", [Metric.COSINE, Metric.DOT, Metric.L2])
def test_blocked_matches_brute_force(rng, metric):
    q = rng.standard_normal((8, 32)).astype(np.float32)
    c = rng.standard_normal((5000, 32)).astype(np.float32)
    corpus = build_corpus(jnp.asarray(c), metric=metric, dtype=jnp.float32)
    v, i = dense_search(
        jnp.asarray(q), corpus, k=16, metric=metric, block_size=512
    )
    _, gi = brute_force(q, c, 16, metric)
    for row_i, row_g in zip(np.asarray(i), gi):
        assert set(row_i.tolist()) == set(row_g.tolist())


def test_mask_excludes_rows(rng):
    q = rng.standard_normal((2, 16)).astype(np.float32)
    c = rng.standard_normal((300, 16)).astype(np.float32)
    corpus = build_corpus(jnp.asarray(c), dtype=jnp.float32)
    mask = np.ones(300, bool)
    mask[::2] = False  # forbid even rows
    v, i = dense_search(jnp.asarray(q), corpus, k=5, mask=jnp.asarray(mask))
    assert np.all(np.asarray(i) % 2 == 1)
    # blocked path too
    v2, i2 = dense_search(
        jnp.asarray(q), corpus, k=5, mask=jnp.asarray(mask), block_size=64
    )
    assert np.all(np.asarray(i2) % 2 == 1)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


def test_int8_recall(rng):
    """int8 quantized search keeps recall@10 >= 0.95 vs exact."""
    q = rng.standard_normal((16, 128)).astype(np.float32)
    c = rng.standard_normal((4000, 128)).astype(np.float32)
    exact = build_corpus(jnp.asarray(c), dtype=jnp.float32)
    quant = build_corpus(jnp.asarray(c), dtype=jnp.int8)
    _, gi = dense_search(jnp.asarray(q), exact, k=10)
    _, qi = dense_search(jnp.asarray(q), quant, k=10)
    gi, qi = np.asarray(gi), np.asarray(qi)
    recall = np.mean(
        [len(set(a) & set(b)) / 10.0 for a, b in zip(gi, qi)]
    )
    assert recall >= 0.95, f"int8 recall@10 = {recall}"


def test_bf16_storage(rng):
    q = rng.standard_normal((4, 64)).astype(np.float32)
    c = rng.standard_normal((1000, 64)).astype(np.float32)
    corpus = build_corpus(jnp.asarray(c), dtype=jnp.bfloat16)
    _, i = dense_search(jnp.asarray(q), corpus, k=10)
    _, gi = brute_force(q, c, 10, Metric.COSINE)
    recall = np.mean(
        [len(set(a) & set(b)) / 10.0 for a, b in zip(np.asarray(i), gi)]
    )
    assert recall >= 0.9


def test_blockwise_topk_matches_lax(rng):
    s = rng.standard_normal((3, 10000)).astype(np.float32)
    v, i = blockwise_topk(jnp.asarray(s), k=25, block_size=512)
    order = np.argsort(-s, axis=-1)[:, :25]
    gold = np.take_along_axis(s, order, axis=-1)
    np.testing.assert_allclose(np.asarray(v), gold, rtol=1e-6)
    for row_i, row_g in zip(np.asarray(i), order):
        assert set(row_i.tolist()) == set(row_g.tolist())


def test_merge_topk(rng):
    v = rng.standard_normal((2, 40)).astype(np.float32)
    idx = rng.integers(0, 10_000, (2, 40)).astype(np.int32)
    mv, mi = merge_topk(jnp.asarray(v), jnp.asarray(idx), k=8)
    gold_pos = np.argsort(-v, axis=-1)[:, :8]
    np.testing.assert_allclose(
        np.asarray(mv), np.take_along_axis(v, gold_pos, -1), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(mi), np.take_along_axis(idx, gold_pos, -1)
    )


def test_exact_scores_shape(rng):
    q = rng.standard_normal((3, 16)).astype(np.float32)
    c = rng.standard_normal((50, 16)).astype(np.float32)
    corpus = build_corpus(jnp.asarray(c), dtype=jnp.float32)
    s = exact_scores(jnp.asarray(q), corpus)
    assert s.shape == (3, 50)
