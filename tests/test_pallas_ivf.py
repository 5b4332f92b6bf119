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
    gv, gi = ivf_search(q, index, k=10, nprobe=8)
    pv, pi = pallas_ivf_topk(q, index, k=10, nprobe=8, interpret=True)
    for a, b in zip(np.asarray(pi), np.asarray(gi)):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(np.sort(np.asarray(pv)),
                               np.sort(np.asarray(gv)), rtol=1e-4)


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
