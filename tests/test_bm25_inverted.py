"""Inverted BM25 must match the doc-major scorer when P is not truncating."""

import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.ops.bm25 import build_lexical_corpus, bm25_search
from super_rag_tpu.ops.bm25_inverted import build_inverted, inverted_bm25_search
from super_rag_tpu.tokenize.analyzer import Analyzer, DocFrequency

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped across a sleepy canine",
    "TPU systolic arrays multiply matrices very fast",
    "JAX compiles numpy programs to XLA for TPUs",
    "the dog sleeps while the fox runs through the forest",
    "matrix multiplication throughput dominates transformer inference",
    "fox fox fox fox dog",
    "BM25 ranks documents by term frequency and rarity",
]


@pytest.fixture(scope="module")
def setup():
    analyzer = Analyzer(vocab_size=1 << 14, use_stopwords=False)
    df = DocFrequency()
    for d in DOCS:
        ids = analyzer.term_ids(d)
        df.add_doc(ids, len(ids))
    terms, tfs, lens = analyzer.batch_doc_entries(DOCS, slots=16)
    return analyzer, df, terms, tfs, lens


@pytest.mark.parametrize("query", ["quick fox", "tpu matrix", "dog", "bm25 rarity"])
def test_matches_doc_major(setup, query):
    analyzer, df, terms, tfs, lens = setup
    corpus = build_lexical_corpus(jnp.asarray(terms), jnp.asarray(tfs),
                                  jnp.asarray(lens))
    inv = build_inverted(terms, tfs, lens, analyzer.vocab_size,
                         postings_per_term=32, avgdl=df.avgdl)
    qt, qi = analyzer.query_entry(query, df, max_terms=8)
    gv, gi = bm25_search(
        jnp.asarray(qt[None]), jnp.asarray(qi[None]), corpus,
        jnp.float32(df.avgdl), vocab_size=analyzer.vocab_size, k=len(DOCS),
    )
    iv, ii = inverted_bm25_search(
        jnp.asarray(qt[None]), jnp.asarray(qi[None]), inv, k=len(DOCS),
    )
    gv, gi = np.asarray(gv)[0], np.asarray(gi)[0]
    iv, ii = np.asarray(iv)[0], np.asarray(ii)[0]
    gold = {int(d): float(s) for d, s in zip(gi, gv) if s > 0}
    got = {int(d): float(s) for d, s in zip(ii, iv) if d >= 0}
    assert set(got) == set(gold)
    for d in gold:
        np.testing.assert_allclose(got[d], gold[d], rtol=2e-2)


def test_truncation_keeps_high_impact(setup):
    analyzer, df, terms, tfs, lens = setup
    # P=1: only the single highest-impact doc per term survives
    inv = build_inverted(terms, tfs, lens, analyzer.vocab_size,
                         postings_per_term=1, avgdl=df.avgdl)
    qt, qi = analyzer.query_entry("fox", df, max_terms=4)
    v, i = inverted_bm25_search(jnp.asarray(qt[None]), jnp.asarray(qi[None]),
                                inv, k=3)
    winners = [d for d in np.asarray(i)[0] if d >= 0]
    assert len(winners) == 1
    assert winners[0] == 6  # "fox fox fox fox dog" has max tf for 'fox'


def test_mask(setup):
    analyzer, df, terms, tfs, lens = setup
    inv = build_inverted(terms, tfs, lens, analyzer.vocab_size,
                         postings_per_term=32, avgdl=df.avgdl)
    qt, qi = analyzer.query_entry("fox", df, max_terms=4)
    keep = np.zeros(len(DOCS), bool)
    keep[1] = True
    v, i = inverted_bm25_search(
        jnp.asarray(qt[None]), jnp.asarray(qi[None]), inv, k=3,
        mask=jnp.asarray(keep),
    )
    i = np.asarray(i)[0]
    assert i[0] == 1 and np.all(i[1:] == -1)


def test_batch_queries(setup, rng):
    analyzer, df, terms, tfs, lens = setup
    inv = build_inverted(terms, tfs, lens, analyzer.vocab_size,
                         postings_per_term=32, avgdl=df.avgdl)
    queries = ["fox", "matrix", "dog sleeps"]
    qt = np.stack([analyzer.query_entry(q, df, 8)[0] for q in queries])
    qi = np.stack([analyzer.query_entry(q, df, 8)[1] for q in queries])
    v, i = inverted_bm25_search(jnp.asarray(qt), jnp.asarray(qi), inv, k=4)
    assert v.shape == (3, 4)
    # each query's top doc contains its term
    i = np.asarray(i)
    assert "fox" in DOCS[i[0, 0]]
    assert "matri" in DOCS[i[1, 0]].lower()


def test_no_match_returns_empty():
    analyzer = Analyzer(vocab_size=1 << 14, use_stopwords=False)
    terms, tfs, lens = analyzer.batch_doc_entries(["alpha beta"], slots=8)
    inv = build_inverted(terms, tfs, lens, analyzer.vocab_size,
                         postings_per_term=8)
    df = DocFrequency()
    df.add_doc(analyzer.term_ids("alpha beta"), 2)
    qt, qi = analyzer.query_entry("zzz unknown", df, 4)
    v, i = inverted_bm25_search(jnp.asarray(qt[None]), jnp.asarray(qi[None]),
                                inv, k=3)
    assert np.all(np.asarray(i) == -1)


def test_df_adaptive_budgets_recover_truncation():
    """Two-tier budgets: a high-df term truncated by the uniform cap
    recovers its candidates when it gets the deep budget; rare terms are
    unaffected (they were complete under the cap already)."""
    rng = np.random.default_rng(3)
    vocab = 1 << 10
    n, slots = 400, 8
    # term 5 is in every doc (high df); terms > 100 are rare
    terms = rng.integers(100, vocab, (n, slots)).astype(np.int32)
    terms[:, 0] = 5
    tfs = rng.integers(1, 4, (n, slots)).astype(np.float32)
    lens = tfs.sum(1) * 2
    avgdl = float(lens.mean())
    inv = build_inverted(terms, tfs, lens, vocab, postings_per_term=n,
                         avgdl=avgdl)
    # query: the high-df term + one rare term; idf: low for 5, high rare
    rare = int(terms[0, 1])
    qt = jnp.asarray([[5, rare] + [vocab] * 6], jnp.int32)
    qi = jnp.asarray([[0.05, 3.0] + [0.0] * 6], jnp.float32)

    exact_v, exact_i = inverted_bm25_search(qt, qi, inv, k=50)
    # uniform shallow cap truncates term 5's postings
    cap_v, cap_i = inverted_bm25_search(qt, qi, inv, k=50,
                                        postings_per_query_term=16)
    # same shallow cap + deep budget on the lowest-idf term
    da_v, da_i = inverted_bm25_search(qt, qi, inv, k=50,
                                      postings_per_query_term=16,
                                      deep_terms=1, deep_postings=n)

    def hits(i, v):
        return {int(x) for x, s in zip(np.asarray(i)[0], np.asarray(v)[0])
                if x >= 0 and np.isfinite(s)}

    gold = hits(exact_i, exact_v)
    assert len(hits(da_i, da_v) & gold) > len(hits(cap_i, cap_v) & gold)
    # with deep budget covering full df, the top-k equals the exact run
    top = 10
    assert np.array_equal(np.asarray(da_i)[0][:top],
                          np.asarray(exact_i)[0][:top])


def test_df_adaptive_lossless_when_budgets_cover(setup):
    """deep_terms with budgets >= every df is bit-identical to exact."""
    analyzer, df, terms, tfs, lens = setup
    inv = build_inverted(terms, tfs, lens, analyzer.vocab_size,
                         postings_per_term=32, avgdl=df.avgdl)
    qt, qi = analyzer.query_entry("the quick fox dog", df, 8)
    qt = jnp.asarray([qt]); qi = jnp.asarray([qi])
    base_v, base_i = inverted_bm25_search(qt, qi, inv, k=8)
    da_v, da_i = inverted_bm25_search(qt, qi, inv, k=8, deep_terms=2,
                                      deep_postings=32,
                                      postings_per_query_term=32)
    keep = np.isfinite(np.asarray(base_v)[0])
    assert np.array_equal(np.asarray(base_i)[0][keep],
                          np.asarray(da_i)[0][keep])
    assert np.allclose(np.asarray(base_v)[0][keep],
                       np.asarray(da_v)[0][keep], rtol=1e-5)
