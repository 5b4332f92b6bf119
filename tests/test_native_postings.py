"""Native postings builder must be bit-identical to the numpy lexsort
path, including impact ties (where stability defines the winner)."""

import numpy as np
import pytest

from super_rag_tpu.ops import postings_native

pytestmark = pytest.mark.skipif(
    not postings_native.available(), reason="no C++ toolchain"
)


def _numpy_reference(terms, impact, vocab, P):
    n, slots = terms.shape
    flat_terms = terms.reshape(-1).astype(np.int64)
    flat_impact = impact.reshape(-1).astype(np.float32)
    flat_docs = np.repeat(np.arange(n, dtype=np.int64), slots)
    keep = flat_terms < vocab
    flat_terms, flat_impact, flat_docs = (
        flat_terms[keep], flat_impact[keep], flat_docs[keep]
    )
    order = np.lexsort((-flat_impact, flat_terms))
    flat_terms, flat_impact, flat_docs = (
        flat_terms[order], flat_impact[order], flat_docs[order]
    )
    is_start = np.empty(len(flat_terms), bool)
    if len(flat_terms):
        is_start[0] = True
        is_start[1:] = flat_terms[1:] != flat_terms[:-1]
    idx = np.arange(len(flat_terms), dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(is_start, idx, 0))
    rank = idx - run_start
    keep = rank < P
    ids = np.full((vocab + 1, P), -1, np.int32)
    imp = np.zeros((vocab + 1, P), np.float32)
    ids[flat_terms[keep], rank[keep]] = flat_docs[keep].astype(np.int32)
    imp[flat_terms[keep], rank[keep]] = flat_impact[keep]
    return ids, imp


@pytest.mark.parametrize("seed,quantize", [(0, False), (1, True), (2, True)])
def test_native_matches_numpy(seed, quantize):
    rng = np.random.default_rng(seed)
    n, slots, vocab, P = 500, 12, 256, 8
    terms = rng.integers(0, vocab + 1, (n, slots)).astype(np.int32)
    impact = rng.random((n, slots)).astype(np.float32)
    if quantize:  # force MANY impact ties: stability decides the winners
        impact = np.round(impact * 4) / 4
    ids_ref, imp_ref = _numpy_reference(terms, impact, vocab, P)
    ids_nat, imp_nat = postings_native.build_postings(terms, impact, vocab, P)
    np.testing.assert_array_equal(ids_nat, ids_ref)
    np.testing.assert_array_equal(imp_nat, imp_ref)


def test_build_inverted_native_path_matches_search():
    """build_inverted through the native path returns identical search
    results to the numpy path on the same corpus."""
    import jax.numpy as jnp

    from super_rag_tpu.ops.bm25_inverted import (
        build_inverted,
        inverted_bm25_search,
    )

    rng = np.random.default_rng(3)
    n, slots, vocab = 40_000, 8, 1 << 12  # n*slots >= 1<<18 -> native
    terms = rng.integers(0, vocab + 1, (n, slots)).astype(np.int32)
    tfs = rng.integers(1, 6, (n, slots)).astype(np.float32)
    tfs[terms == vocab] = 0.0
    doc_len = tfs.sum(1) + 1.0

    inv_native = build_inverted(terms, tfs, doc_len, vocab,
                                postings_per_term=16)
    # numpy path: force small-corpus branch by monkeypatching availability
    import super_rag_tpu.ops.postings_native as pn

    orig = pn.available
    pn.available = lambda: False
    try:
        inv_numpy = build_inverted(terms, tfs, doc_len, vocab,
                                   postings_per_term=16)
    finally:
        pn.available = orig

    np.testing.assert_array_equal(np.asarray(inv_native.postings_ids),
                                  np.asarray(inv_numpy.postings_ids))
    np.testing.assert_array_equal(
        np.asarray(inv_native.postings_impact.astype(jnp.float32)),
        np.asarray(inv_numpy.postings_impact.astype(jnp.float32)),
    )

    q_terms = jnp.asarray(terms[:4, :4].astype(np.int32))
    q_idf = jnp.ones((4, 4), jnp.float32)
    v1, i1 = inverted_bm25_search(q_terms, q_idf, inv_native, k=5)
    v2, i2 = inverted_bm25_search(q_terms, q_idf, inv_numpy, k=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
