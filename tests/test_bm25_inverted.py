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


# -- CSR (untruncated) tier ---------------------------------------------------

def _zipf_corpus(n=5000, slots=24, vocab=1 << 12, seed=3):
    rng = np.random.default_rng(seed)
    terms = ((rng.zipf(1.3, size=(n, slots)) - 1) % vocab).astype(np.int32)
    tfs = np.minimum(rng.zipf(2.0, size=(n, slots)), 8).astype(np.float32)
    pad = rng.random((n, slots)) < 0.2
    terms[pad] = vocab
    tfs[pad] = 0.0
    doc_len = tfs.sum(1) * 2.0 + 1.0
    return terms, tfs, doc_len, vocab


def _queries_from(terms, vocab, n_q=12, qn=8, seed=4):
    n = len(terms)
    # df over per-doc UNIQUE terms (a doc counts once): entry-level
    # counts exceed n for common terms and flip idf negative, which BM25
    # never produces and the segment-sum aggregation does not support
    st = np.sort(terms, axis=1)
    first = np.ones_like(st, bool)
    first[:, 1:] = st[:, 1:] != st[:, :-1]
    uniq = st[first]
    df = np.bincount(uniq[uniq < vocab].astype(np.int64),
                     minlength=vocab + 1)
    idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5)).astype(np.float32)
    rows = np.random.default_rng(seed).integers(0, n, n_q)
    qt = np.full((n_q, qn), vocab, np.int32)
    for i, r in enumerate(rows):
        uniq = [t for t in dict.fromkeys(terms[r].tolist()) if t != vocab][:qn]
        qt[i, : len(uniq)] = uniq
    qi = np.where(qt != vocab, idf[np.minimum(qt, vocab)], 0.0
                  ).astype(np.float32)
    return jnp.asarray(qt), jnp.asarray(qi)


def test_csr_full_depth_matches_doc_major_exactly():
    """At a query budget >= the longest posting run, the CSR tier IS the
    exact BM25 scorer: same winners, same scores (bf16 impact rounding),
    for zipf-shaped data where the fixed table must truncate."""
    from super_rag_tpu.ops.bm25_inverted import build_inverted_csr

    terms, tfs, doc_len, vocab = _zipf_corpus()
    csr = build_inverted_csr(terms, tfs, doc_len, vocab)
    corpus = build_lexical_corpus(jnp.asarray(terms),
                                  jnp.asarray(tfs),
                                  jnp.asarray(doc_len))
    qt, qi = _queries_from(terms, vocab)
    avgdl = jnp.float32(float(doc_len.mean()))
    k = 20
    gv, gi = bm25_search(qt, qi, corpus, avgdl, vocab_size=vocab, k=k)
    max_run = int(np.max(np.bincount(terms[terms < vocab].astype(np.int64))))
    cv, ci = inverted_bm25_search(qt, qi, csr, k=k,
                                  postings_per_query_term=max_run)
    for b in range(qt.shape[0]):
        gold = {int(d): float(s)
                for d, s in zip(np.asarray(gi)[b], np.asarray(gv)[b])
                if np.isfinite(s) and s > 0}
        got = {int(d): float(s)
               for d, s in zip(np.asarray(ci)[b], np.asarray(cv)[b])
               if d >= 0}
        # identical winner sets modulo ties at the k boundary: compare
        # score multisets instead of ids
        np.testing.assert_allclose(sorted(got.values(), reverse=True),
                                   sorted(gold.values(), reverse=True),
                                   rtol=2e-2)
        shared = set(got) & set(gold)
        assert len(shared) >= k * 0.9
        for d in shared:
            np.testing.assert_allclose(got[d], gold[d], rtol=2e-2)


def test_csr_budget_matches_fixed_table_at_equal_caps():
    """With the same per-term budget, CSR and the fixed table see the
    same impact-ordered prefixes -> identical candidates and scores."""
    from super_rag_tpu.ops.bm25_inverted import build_inverted_csr

    terms, tfs, doc_len, vocab = _zipf_corpus()
    cap = 64
    fixed = build_inverted(terms, tfs, doc_len, vocab, postings_per_term=cap,
                           avgdl=float(doc_len.mean()))
    csr = build_inverted_csr(terms, tfs, doc_len, vocab)
    qt, qi = _queries_from(terms, vocab)
    fv, fi = inverted_bm25_search(qt, qi, fixed, k=30,
                                  postings_per_query_term=cap)
    cv, ci = inverted_bm25_search(qt, qi, csr, k=30,
                                  postings_per_query_term=cap)
    np.testing.assert_allclose(
        np.where(np.isfinite(np.asarray(fv)), np.asarray(fv), 0.0),
        np.where(np.isfinite(np.asarray(cv)), np.asarray(cv), 0.0),
        rtol=1e-3)
    keep = np.asarray(fi) >= 0
    assert np.array_equal(np.asarray(fi)[keep], np.asarray(ci)[keep])


def test_csr_deep_budgets_and_mask():
    """Deep budgets lift only the low-idf terms' depth; masks drop rows."""
    from super_rag_tpu.ops.bm25_inverted import build_inverted_csr

    terms, tfs, doc_len, vocab = _zipf_corpus()
    csr = build_inverted_csr(terms, tfs, doc_len, vocab)
    qt, qi = _queries_from(terms, vocab)
    corpus = build_lexical_corpus(jnp.asarray(terms), jnp.asarray(tfs),
                                  jnp.asarray(doc_len))
    avgdl = jnp.float32(float(doc_len.mean()))
    gv, gi = bm25_search(qt, qi, corpus, avgdl, vocab_size=vocab, k=10)

    def recall(ci):
        hits = tot = 0
        for b in range(qt.shape[0]):
            gold = {int(d) for d, s in zip(np.asarray(gi)[b],
                                           np.asarray(gv)[b])
                    if np.isfinite(s) and s > 0}
            got = {int(d) for d in np.asarray(ci)[b] if d >= 0}
            hits += len(gold & got)
            tot += len(gold)
        return hits / max(tot, 1)

    _, shallow = inverted_bm25_search(qt, qi, csr, k=10,
                                      postings_per_query_term=16)
    _, deep = inverted_bm25_search(qt, qi, csr, k=10,
                                   postings_per_query_term=16,
                                   deep_terms=4, deep_postings=4096)
    assert recall(deep) > recall(shallow)
    # a query budget covering the longest run makes the CSR tier exact
    max_run = int(np.max(np.bincount(terms[terms < vocab].astype(np.int64))))
    _, full = inverted_bm25_search(qt, qi, csr, k=10,
                                   postings_per_query_term=max_run)
    assert recall(full) == 1.0

    # mask: banned rows never surface
    mask = np.ones(len(terms), bool)
    banned = set(int(x) for x in np.asarray(deep)[0] if x >= 0)
    for r in banned:
        mask[r] = False
    _, masked = inverted_bm25_search(qt, qi, csr, k=10,
                                     mask=jnp.asarray(mask), has_mask=True,
                                     postings_per_query_term=16,
                                     deep_terms=4, deep_postings=4096)
    assert banned.isdisjoint(int(x) for x in np.asarray(masked)[0] if x >= 0)


def test_csr_in_fused_hybrid():
    """hybrid_search dispatches on the index type: a CSR index drops in
    with rescore + RRF unchanged."""
    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.bm25_inverted import build_inverted_csr
    from super_rag_tpu.ops.dense import build_corpus
    from super_rag_tpu.ops.hybrid import hybrid_search

    terms, tfs, doc_len, vocab = _zipf_corpus(n=2000)
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((len(terms), 32)).astype(np.float32)
    dense = build_corpus(jnp.asarray(emb), dtype=jnp.float32)
    lex = LexicalCorpus(terms=jnp.asarray(terms),
                        tfs=jnp.asarray(tfs, jnp.bfloat16),
                        doc_len=jnp.asarray(doc_len))
    csr = build_inverted_csr(terms, tfs, doc_len, vocab)
    qt, qi = _queries_from(terms, vocab, n_q=4)
    q = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    res = hybrid_search(
        q, qt, qi, dense, lex, jnp.float32(float(doc_len.mean())),
        inverted=csr, vocab_size=vocab, k=5, candidates=20,
        use_pallas=False, block_size=1024, postings_per_query_term=64,
        rescore=True, lex_gen=40,
    )
    ids = np.asarray(res.indices)
    assert ids.shape == (4, 5) and (ids >= -1).all()
    assert (ids[:, 0] >= 0).all()


def test_csr_sharded_exact_equals_unsharded_at_full_coverage():
    """Doc-sharded CSR (C parallel narrow aggregations) must reproduce the
    unsharded tier exactly when the per-term budget covers every run:
    shards are id-disjoint so per-shard segment sums are exact and the
    top-k-of-top-ks merge is the global top-k."""
    from super_rag_tpu.ops.bm25_inverted import build_inverted_csr

    terms, tfs, doc_len, vocab = _zipf_corpus()
    flat = build_inverted_csr(terms, tfs, doc_len, vocab)
    qt, qi = _queries_from(terms, vocab)
    max_run = int(np.max(np.bincount(terms[terms < vocab].astype(np.int64))))
    fv, fi = inverted_bm25_search(qt, qi, flat, k=25,
                                  postings_per_query_term=max_run)
    for c in (4, 7):
        sharded = build_inverted_csr(terms, tfs, doc_len, vocab, shards=c)
        assert sharded.shards == c and sharded.vocab_size == vocab
        sv, si = inverted_bm25_search(qt, qi, sharded, k=25,
                                      postings_per_query_term=max_run)
        # identical score multisets; identical ids wherever scores are
        # tie-free (tie order may differ across layouts)
        np.testing.assert_allclose(
            np.where(np.isfinite(np.asarray(fv)), np.asarray(fv), 0.0),
            np.where(np.isfinite(np.asarray(sv)), np.asarray(sv), 0.0),
            rtol=1e-3)
        fvn, svn = np.asarray(fv), np.asarray(sv)
        for b in range(qt.shape[0]):
            gold = {int(d): float(s) for d, s in zip(np.asarray(fi)[b], fvn[b])
                    if d >= 0}
            got = {int(d): float(s) for d, s in zip(np.asarray(si)[b], svn[b])
                   if d >= 0}
            boundary = min(gold.values(), default=0.0)
            for d, s in gold.items():
                if s > boundary + 1e-5:
                    assert d in got, (c, b, d)


def test_csr_sharded_truncating_budget_keeps_recall():
    """At a truncating TOTAL budget, the sharded tier reads ceil(b/C)+slack
    per shard — coverage must not regress vs the unsharded prefix."""
    from super_rag_tpu.ops.bm25_inverted import build_inverted_csr

    terms, tfs, doc_len, vocab = _zipf_corpus()
    flat = build_inverted_csr(terms, tfs, doc_len, vocab)
    sharded = build_inverted_csr(terms, tfs, doc_len, vocab, shards=8)
    qt, qi = _queries_from(terms, vocab, n_q=24)
    corpus = build_lexical_corpus(jnp.asarray(terms), jnp.asarray(tfs),
                                  jnp.asarray(doc_len))
    gv, gi = bm25_search(qt, qi, corpus, jnp.float32(float(doc_len.mean())),
                         vocab_size=vocab, k=10)

    def recall(ci):
        hits = tot = 0
        for b in range(qt.shape[0]):
            gold = {int(d) for d, s in zip(np.asarray(gi)[b],
                                           np.asarray(gv)[b])
                    if np.isfinite(s) and s > 0}
            got = {int(d) for d in np.asarray(ci)[b] if d >= 0}
            hits += len(gold & got)
            tot += len(gold)
        return hits / max(tot, 1)

    _, fi_ = inverted_bm25_search(qt, qi, flat, k=10,
                                  postings_per_query_term=64,
                                  deep_terms=3, deep_postings=512)
    _, si_ = inverted_bm25_search(qt, qi, sharded, k=10,
                                  postings_per_query_term=64,
                                  deep_terms=3, deep_postings=512)
    assert recall(si_) >= recall(fi_) - 0.02, (recall(si_), recall(fi_))
    # mask parity under sharding: dropped rows never surface
    mask = np.ones(len(terms), bool)
    mask[::3] = False
    _, mi = inverted_bm25_search(qt, qi, sharded, k=10,
                                 postings_per_query_term=64,
                                 mask=jnp.asarray(mask))
    got = np.asarray(mi)
    bad = got[got >= 0]
    assert not np.any(bad % 3 == 0)


def test_reshard_csr_host_matches_direct_sharded_build():
    """reshard_csr_host (the cached-snapshot path) must produce the same
    arrays as building the sharded layout from the corpus."""
    from super_rag_tpu.ops.bm25_inverted import (build_inverted_csr,
                                                 reshard_csr_host)

    terms, tfs, doc_len, vocab = _zipf_corpus(n=800)
    flat = build_inverted_csr(terms, tfs, doc_len, vocab)
    for c in (2, 5, 8):
        direct = build_inverted_csr(terms, tfs, doc_len, vocab, shards=c)
        docs, impact, off2d = reshard_csr_host(
            np.asarray(flat.postings_docs),
            np.asarray(flat.postings_impact.astype(jnp.float32)),
            np.asarray(flat.offsets), c)
        np.testing.assert_array_equal(docs, np.asarray(direct.postings_docs))
        np.testing.assert_array_equal(off2d, np.asarray(direct.offsets))
        np.testing.assert_allclose(
            impact,
            np.asarray(direct.postings_impact.astype(jnp.float32)))
