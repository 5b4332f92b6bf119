"""Two-level IVF build (kmeans_twolevel / _assign_topc_grouped).

The 10M north-star rebuild is CPU-infeasible with flat assignment
(~2.5e17 FLOPs at nlist 16384 — CLAUDE.md round-5 addendum); the
two-level path cuts it ~64x. These tests pin (a) the grouped-assignment
contract vs the exact one, (b) end-to-end recall parity of
build_ivf_streaming(coarse=...) vs the flat build on a clustered
corpus, (c) layout invariants (coarse-major fine blocks).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from super_rag_tpu.ops.ivf import (
    Metric,
    _assign,
    _assign_topc_grouped,
    build_ivf_streaming,
    ivf_search,
    kmeans_twolevel,
)


def _clustered(n, d, n_centers, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 3.0
    a = rng.integers(0, n_centers, n)
    x = centers[a] + rng.standard_normal((n, d)).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def test_twolevel_centroid_layout():
    x = _clustered(4000, 32, 16)
    cen, cen_c = kmeans_twolevel(jnp.asarray(x), nlist=64, coarse=8,
                                 iters=4, seed=0)
    assert cen.shape == (64, 32) and cen_c.shape == (8, 32)
    # spherical k-means: unit-norm centroids
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cen), axis=1), 1.0, atol=1e-4)
    # coarse-major layout: each fine block's centroids sit nearer their
    # own coarse centroid than a strong majority of rows would by chance
    cen_np, cen_c_np = np.asarray(cen), np.asarray(cen_c)
    own = np.argmax(cen_np @ cen_c_np.T, axis=1)
    expect = np.repeat(np.arange(8), 8)
    assert (own == expect).mean() > 0.7


def test_grouped_assignment_matches_exact_topc():
    x = _clustered(2048, 32, 12, seed=1)
    cen, cen_c = kmeans_twolevel(jnp.asarray(x), nlist=48, coarse=6,
                                 iters=5, seed=1)
    cen_np, cen_c_np = np.asarray(cen), np.asarray(cen_c)
    cand, cscore = _assign_topc_grouped(x, cen_np, cen_c_np, c=4, p=2)
    assert cand.shape == (2048, 4) and cscore.shape == (2048, 4)
    # scores are the candidates' true dots, sorted descending
    true = np.take_along_axis(x @ cen_np.T, cand, axis=1)
    np.testing.assert_allclose(cscore, true, atol=1e-5)
    assert (np.diff(cscore, axis=1) <= 1e-6).all()
    # top-1 agrees with the exact argmax for a strong majority (misses
    # only at coarse boundaries beyond the top-p groups)
    exact = np.asarray(_assign(jnp.asarray(x), cen))
    assert (cand[:, 0] == exact).mean() > 0.9
    # every candidate lives in one of the row's top-2 coarse groups
    fpb = 48 // 6
    g = cand // fpb
    topp = np.argsort(-(x @ cen_c_np.T), axis=1)[:, :2]
    assert (g[:, :, None] == topp[:, None, :]).any(-1).all()


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float32])
def test_streaming_build_twolevel_recall_parity(dtype):
    n, d, k = 6000, 64, 10
    x = _clustered(n, d, 24, seed=2)

    def chunks():
        for lo in range(0, n, 2000):
            yield x[lo : lo + 2000]

    kw = dict(nlist=32, dtype=dtype, metric=Metric.COSINE,
              kmeans_iters=5, seed=3, train_sample=3000)
    flat = build_ivf_streaming(chunks, **kw)
    two = build_ivf_streaming(chunks, coarse=8, **kw)
    assert two.values.shape[0] == 32
    q = _clustered(32, d, 24, seed=9)
    gold = np.argsort(-(q @ x.T), axis=1)[:, :k]

    def recall(idx):
        _, ids = ivf_search(jnp.asarray(q), idx, k=k, nprobe=12)
        ids = np.asarray(ids)
        return np.mean([
            len(set(ids[i].tolist()) & set(gold[i].tolist())) / k
            for i in range(q.shape[0])
        ])

    r_flat, r_two = recall(flat), recall(two)
    # two-level only shifts probe-hit probability (residual coding keeps
    # stored scores exact) — recall must track the flat build closely
    assert r_two >= r_flat - 0.03, (r_two, r_flat)
    assert r_two >= 0.85, r_two


def test_streaming_build_twolevel_rejects_bad_coarse():
    x = _clustered(1000, 16, 4)

    def chunks():
        yield x

    with pytest.raises(AssertionError):
        build_ivf_streaming(chunks, nlist=30, coarse=7, train_sample=500)
