"""RRF fusion vs a Python reference."""

import jax.numpy as jnp
import numpy as np

from super_rag_tpu.ops.fusion import rrf_fuse


def python_rrf(ids_a, ids_b, rrf_k=60, wa=1.0, wb=1.0):
    scores = {}
    for r, d in enumerate(ids_a):
        if d >= 0:
            scores[d] = scores.get(d, 0.0) + wa / (rrf_k + r + 1)
    for r, d in enumerate(ids_b):
        if d >= 0:
            scores[d] = scores.get(d, 0.0) + wb / (rrf_k + r + 1)
    return sorted(scores.items(), key=lambda kv: -kv[1])


def test_rrf_matches_python():
    # ids are unique within each list (search results never repeat an id)
    a = np.array([[5, 3, 9, 1], [7, 6, 2, -1]], np.int32)
    b = np.array([[3, 5, 8, 2], [2, 4, -1, -1]], np.int32)
    v, i = rrf_fuse(jnp.asarray(a), jnp.asarray(b), k=5)
    v, i = np.asarray(v), np.asarray(i)
    for row in range(2):
        gold = python_rrf(a[row].tolist(), b[row].tolist())
        got = [(int(d), float(s)) for d, s in zip(i[row], v[row]) if d >= 0]
        assert [d for d, _ in got] == [d for d, _ in gold][: len(got)]
        for (gd, gs), (dd, ds) in zip(gold, got):
            np.testing.assert_allclose(ds, gs, rtol=1e-5)


def test_rrf_dedup_and_padding():
    a = np.array([[1, 2, -1]], np.int32)
    b = np.array([[2, 1, -1]], np.int32)
    v, i = rrf_fuse(jnp.asarray(a), jnp.asarray(b), k=6)
    i = np.asarray(i)[0]
    # ids 1 and 2 appear once each; remaining slots are -1
    winners = [x for x in i if x >= 0]
    assert sorted(winners) == [1, 2]
    assert list(i[2:]) == [-1, -1, -1, -1]


def test_rrf_weights():
    a = np.array([[1, 2]], np.int32)
    b = np.array([[2, 1]], np.int32)
    # heavily weight list b: its rank-0 id (2) must win
    v, i = rrf_fuse(jnp.asarray(a), jnp.asarray(b), k=2, weight_a=0.1, weight_b=10.0)
    assert np.asarray(i)[0, 0] == 2
