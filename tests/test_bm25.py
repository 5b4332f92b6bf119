"""BM25 device scoring vs a pure-Python reference implementation."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.ops.bm25 import build_lexical_corpus, bm25_search
from super_rag_tpu.tokenize.analyzer import Analyzer, DocFrequency

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped across a sleepy canine",
    "TPU systolic arrays multiply matrices very fast",
    "JAX compiles numpy programs to XLA for TPUs and GPUs",
    "the dog sleeps while the fox runs through the forest",
    "matrix multiplication throughput dominates transformer inference",
    "信息检索 系统 使用 倒排索引",  # CJK doc
    "fox fox fox fox dog",
]

K1, B = 1.2, 0.75


def python_bm25(analyzer, df, docs, query, k1=K1, b=B):
    """Reference implementation: exact BM25 over hashed buckets."""
    doc_ids = [analyzer.term_ids(d) for d in docs]
    avgdl = sum(len(t) for t in doc_ids) / len(docs)
    q_ids = list(dict.fromkeys(analyzer.term_ids(query)))
    scores = []
    for ids in doc_ids:
        tf = {}
        for t in ids:
            tf[t] = tf.get(t, 0) + 1
        s = 0.0
        for t in q_ids:
            if t not in tf:
                continue
            idf = df.idf(t)
            f = tf[t]
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * len(ids) / avgdl))
        scores.append(s)
    return np.array(scores, np.float32)


@pytest.fixture(scope="module")
def setup():
    analyzer = Analyzer(vocab_size=1 << 14, use_stopwords=False)
    df = DocFrequency()
    for d in DOCS:
        ids = analyzer.term_ids(d)
        df.add_doc(ids, len(ids))
    terms, tfs, lens = analyzer.batch_doc_entries(DOCS, slots=16)
    corpus = build_lexical_corpus(
        jnp.asarray(terms), jnp.asarray(tfs), jnp.asarray(lens)
    )
    return analyzer, df, corpus


@pytest.mark.parametrize(
    "query", ["quick fox", "tpu matrix multiplication", "dog", "倒排索引 检索"]
)
def test_matches_python_reference(setup, query):
    analyzer, df, corpus = setup
    qt, qi = analyzer.query_entry(query, df, max_terms=8)
    v, i = bm25_search(
        jnp.asarray(qt[None]),
        jnp.asarray(qi[None]),
        corpus,
        jnp.float32(df.avgdl),
        vocab_size=analyzer.vocab_size,
        k=len(DOCS),
        k1=K1,
        b=B,
    )
    gold = python_bm25(analyzer, df, DOCS, query)
    got = np.zeros(len(DOCS), np.float32)
    got[np.asarray(i[0])] = np.asarray(v[0])
    got = np.maximum(got, 0)  # -inf never appears here; all rows valid
    np.testing.assert_allclose(got, gold, rtol=2e-2, atol=1e-3)


def test_blocked_matches_unblocked(setup, rng):
    analyzer, df, corpus = setup
    # replicate corpus rows to force blocking
    reps = 40
    import jax.numpy as jnp_

    big = build_lexical_corpus(
        jnp_.tile(corpus.terms, (reps, 1)),
        jnp_.tile(corpus.tfs, (reps, 1)),
        jnp_.tile(corpus.doc_len, reps),
    )
    qt, qi = analyzer.query_entry("fox dog", df, max_terms=8)
    v1, i1 = bm25_search(
        jnp.asarray(qt[None]), jnp.asarray(qi[None]), big,
        jnp.float32(df.avgdl), vocab_size=analyzer.vocab_size, k=20,
        block_size=64,
    )
    v2, i2 = bm25_search(
        jnp.asarray(qt[None]), jnp.asarray(qi[None]), big,
        jnp.float32(df.avgdl), vocab_size=analyzer.vocab_size, k=20,
        block_size=100000,
    )
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def test_mask(setup):
    analyzer, df, corpus = setup
    qt, qi = analyzer.query_entry("fox", df, max_terms=8)
    keep = np.zeros(len(DOCS), bool)
    keep[1] = True
    v, i = bm25_search(
        jnp.asarray(qt[None]), jnp.asarray(qi[None]), corpus,
        jnp.float32(df.avgdl), vocab_size=analyzer.vocab_size, k=3,
        mask=jnp.asarray(keep),
    )
    assert np.asarray(i)[0, 0] == 1
    assert np.asarray(v)[0, 1] == float("-inf")


def test_df_remove_doc():
    analyzer = Analyzer(vocab_size=1 << 14)
    df = DocFrequency()
    ids1 = analyzer.term_ids("alpha beta gamma")
    ids2 = analyzer.term_ids("alpha delta")
    df.add_doc(ids1, len(ids1))
    df.add_doc(ids2, len(ids2))
    idf_before = df.idf(ids1[0])  # alpha, df=2
    df.remove_doc(ids2, len(ids2))
    assert df.num_docs == 1
    assert df.idf(ids1[0]) != idf_before
    # round trip state
    df2 = DocFrequency.from_state(df.state())
    assert df2.idf(ids1[0]) == df.idf(ids1[0])
    assert df2.avgdl == df.avgdl
