"""Pallas IVF kernel (interpret mode) vs the XLA IVF path."""

import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.ops.ivf import build_ivf, ivf_search
from super_rag_tpu.ops.pallas_ivf import pallas_ivf_topk


@pytest.fixture(scope="module")
def setup(rng):
    centers = rng.standard_normal((20, 32)).astype(np.float32) * 4
    emb = (centers[np.arange(4000) % 20]
           + rng.standard_normal((4000, 32)).astype(np.float32) * 0.3)
    index = build_ivf(jnp.asarray(emb), nlist=32, dtype=jnp.float32,
                      kmeans_iters=4, seed=0)
    q = jnp.asarray(emb[rng.choice(4000, 8)]
                    + rng.standard_normal((8, 32)).astype(np.float32) * 0.1)
    return index, q


def test_matches_xla_ivf(setup):
    index, q = setup
    # full-probe: candidate sets coincide -> exact parity required
    gv, gi = ivf_search(q, index, k=10, nprobe=32)
    pv, pi = pallas_ivf_topk(q, index, k=10, nprobe=32, interpret=True)
    for a, b in zip(np.asarray(pi), np.asarray(gi)):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(np.sort(np.asarray(pv)),
                               np.sort(np.asarray(gv)), rtol=1e-4)
    # subset-probe: the tile-parallel union path scans a superset of each
    # query's probes, so results may only improve; require >=9/10 overlap
    gv8, gi8 = ivf_search(q, index, k=10, nprobe=8)
    pv8, pi8 = pallas_ivf_topk(q, index, k=10, nprobe=8, interpret=True)
    for a, b in zip(np.asarray(pi8), np.asarray(gi8)):
        assert len(set(a.tolist()) & set(b.tolist())) >= 9
    assert float(np.asarray(pv8).sum()) >= float(np.asarray(gv8).sum()) - 1e-3


def test_int8_and_mask(rng):
    emb = rng.standard_normal((2000, 32)).astype(np.float32)
    index = build_ivf(jnp.asarray(emb), nlist=16, dtype=jnp.int8,
                      kmeans_iters=3)
    q = jnp.asarray(emb[:4])
    keep = np.zeros(2000, bool)
    keep[:500] = True
    pv, pi = pallas_ivf_topk(q, index, k=5, nprobe=16,
                             mask=jnp.asarray(keep), interpret=True)
    pi = np.asarray(pi)
    assert np.all((pi < 500) | (pi < 0))
    gv, gi = ivf_search(q, index, k=5, nprobe=16, mask=jnp.asarray(keep))
    # both paths are int8-approximate; near-ties may swap the tail item
    for a, b in zip(pi, np.asarray(gi)):
        sa = set(x for x in a.tolist() if x >= 0)
        sb = set(x for x in b.tolist() if x >= 0)
        assert len(sa & sb) >= min(len(sa), len(sb)) - 1


def test_overflow_handling(rng):
    emb = rng.standard_normal((600, 16)).astype(np.float32)
    index = build_ivf(jnp.asarray(emb), nlist=4, capacity_factor=0.5,
                      dtype=jnp.float32, kmeans_iters=2)
    assert index.overflow is not None
    row = int(np.asarray(index.overflow_rows)[0])
    _, pi = pallas_ivf_topk(jnp.asarray(emb[row:row+1]), index, k=3,
                            nprobe=4, interpret=True)
    assert row in np.asarray(pi)[0].tolist()


def test_union_and_perquery_paths_agree(rng, monkeypatch):
    """The tile-parallel (union) form must rank the same rows as the
    per-query probe-streaming form; the union form may only ADD recall
    (it scores a superset of each query's probed tiles), so compare on
    nprobe=nlist where the candidate sets coincide."""
    import super_rag_tpu.ops.pallas_ivf as pv

    x = rng.standard_normal((2000, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    index = build_ivf(jnp.asarray(x), nlist=8, dtype=jnp.int8,
                      kmeans_iters=3, seed=0)
    q = jnp.asarray(x[rng.choice(2000, 16)])
    uv, ui = pallas_ivf_topk(q, index, k=10, nprobe=8, interpret=True)
    monkeypatch.setattr(pv, "UNION_OUT_BYTES_MAX", 0)
    pallas_ivf_topk.clear_cache()
    pv_, pi_ = pallas_ivf_topk(q, index, k=10, nprobe=8, interpret=True)
    pallas_ivf_topk.clear_cache()
    assert np.array_equal(np.asarray(ui), np.asarray(pi_))
    np.testing.assert_allclose(np.asarray(uv), np.asarray(pv_),
                               rtol=1e-5, atol=1e-5)
