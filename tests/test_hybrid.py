"""Fused hybrid program vs the separate-dispatch reference composition."""

import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.engine.collection import CollectionEngine
from super_rag_tpu.engine.index import DeviceIndex, FilterSpec, IndexSpec
from super_rag_tpu.ops.fusion import rrf_fuse

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped across a sleepy canine",
    "TPU systolic arrays multiply matrices fast",
    "JAX compiles numpy programs to XLA",
    "the dog sleeps while the fox runs through the woods",
    "matrix multiplication throughput dominates inference",
    "reciprocal rank fusion merges ranked lists",
    "BM25 is a lexical scoring function for search engines",
]


@pytest.fixture(scope="module")
def engine():
    eng = CollectionEngine(IndexSpec(dim=64, dtype=jnp.float32,
                                     vocab_size=1 << 14))
    eng.ingest(DOCS)
    return eng


def reference_hybrid(idx: DeviceIndex, q_emb, queries, k, candidates):
    """Two dispatches + host-visible RRF via ops.fusion (the pre-fusion
    composition) — the gold for the fused program."""
    dv, di = idx.search_dense(q_emb, candidates)
    lv, li = idx.search_bm25(queries, candidates)
    di = jnp.where(jnp.isfinite(dv), di, -1)
    li = jnp.where(jnp.isfinite(lv) & (lv > 0), li, -1)
    return rrf_fuse(di.astype(jnp.int32), li.astype(jnp.int32), k=k)


def test_fused_matches_composed(engine):
    queries = ["fox jumping dog", "matrix multiplication hardware",
               "rank fusion"]
    q_emb = jnp.asarray(np.asarray(engine.embedder.embed(queries)))
    res = engine.index.search_hybrid(q_emb, queries, k=5, candidates=8)
    gv, gi = reference_hybrid(engine.index, q_emb, queries, 5, 8)
    np.testing.assert_array_equal(np.asarray(res.indices), np.asarray(gi))
    np.testing.assert_allclose(np.asarray(res.scores), np.asarray(gv),
                               rtol=1e-5)


def test_fused_respects_filter(engine):
    queries = ["fox"]
    q_emb = jnp.asarray(np.asarray(engine.embedder.embed(queries)))
    keep = np.zeros(engine.index._capacity, bool)
    keep[1] = True
    res = engine.index.search_hybrid(
        q_emb, queries, k=3, candidates=4,
        flt=None,
    )
    # no filter: row 0 or 1 should win for 'fox'
    assert np.asarray(res.indices)[0, 0] in (0, 1, 4)


def test_engine_hybrid_mode_uses_fused(engine):
    hits = engine.search("fox jumping dog", top_k=3, mode="hybrid")
    assert hits and hits[0].recall_type == "hybrid"
    assert any("fox" in h.text for h in hits)


def test_branch_scores_populated(engine):
    queries = ["systolic arrays multiply"]
    q_emb = jnp.asarray(np.asarray(engine.embedder.embed(queries)))
    res = engine.index.search_hybrid(q_emb, queries, k=3, candidates=6)
    top = np.asarray(res.indices)[0, 0]
    assert top == 2  # the TPU doc
    assert np.asarray(res.bm25_scores)[0, 0] > 0  # matched lexically too
    assert np.asarray(res.dense_scores)[0, 0] != 0


def test_autocompacted_inverted_matches_doc_major(rng):
    """After compaction the hybrid path flips to the inverted index and
    must keep returning the same winners."""
    import jax.numpy as jnp_
    eng = CollectionEngine(IndexSpec(dim=32, dtype=jnp_.float32,
                                     vocab_size=1 << 14))
    eng.index.auto_compact_rows = 4  # force compaction quickly
    eng.ingest(DOCS)
    before = eng.search("fox jumping dog", top_k=3, mode="hybrid")
    eng.index.compact_lexical()
    assert eng.index._inverted_upto == eng.index.size
    after = eng.search("fox jumping dog", top_k=3, mode="hybrid")
    assert [h.row for h in before] == [h.row for h in after]
    # fresh-tail path: insert after compaction, result still findable
    eng.index.auto_compact_rows = 10_000
    eng.ingest(["a brand new doc about quokkas"])
    hits = eng.search("quokkas", top_k=2, mode="fulltext")
    assert hits and "quokkas" in hits[0].text


def test_hybrid_with_ivf_tier(rng):
    """IVF-backed hybrid matches flat hybrid at nprobe=nlist."""
    import jax.numpy as jnp_
    eng = CollectionEngine(IndexSpec(dim=32, dtype=jnp_.float32,
                                     vocab_size=1 << 14))
    docs = [f"doc {i} about topic{i % 10}" for i in range(400)]
    eng.ingest(docs)
    flat = eng.search("doc about topic3", top_k=5, mode="hybrid")
    # compact only the dense tier: at nprobe=nlist the IVF branch is
    # exact, so the fused result must be identical (lexical compaction
    # would reorder bm25 ties via bf16 impact rounding — separate test)
    eng.index.compact_dense(nlist=8, nprobe=8, kmeans_iters=3)
    ivf = eng.search("doc about topic3", top_k=5, mode="hybrid")
    assert {h.row for h in flat} == {h.row for h in ivf}


def test_fresh_tail_after_compaction_in_fused_path(rng):
    """Rows inserted after compaction stay lexically findable through the
    fused program's sliced tail scan."""
    import jax.numpy as jnp_
    eng = CollectionEngine(IndexSpec(dim=32, dtype=jnp_.float32,
                                     vocab_size=1 << 14))
    eng.ingest([f"base doc {i} about topic{i % 5}" for i in range(50)])
    eng.index.compact_lexical()
    eng.index.auto_compact_rows = 100_000  # keep the tail fresh
    eng.ingest(["a rare quagga grazes on the plain"])
    assert eng.index._inverted_upto < eng.index.size
    hits = eng.search("quagga grazing", top_k=3, mode="hybrid")
    assert hits and any("quagga" in h.text for h in hits)
    # prefix content still found through the inverted branch
    hits2 = eng.search("topic3 base", top_k=3, mode="hybrid")
    assert hits2


def test_exact_rescore_matches_bm25_block(rng):
    """_exact_bm25_rescore must reproduce the doc-major exact scorer for
    any pooled candidate (same slot-level f32 math)."""
    import jax.numpy as jnp_

    from super_rag_tpu.ops.bm25 import (
        LexicalCorpus, _bm25_block, _idf_table,
    )
    from super_rag_tpu.ops.hybrid import _exact_bm25_rescore

    n, slots, vocab, bsz, qn, p = 200, 8, 1 << 10, 4, 5, 16
    terms = rng.integers(0, vocab, (n, slots)).astype(np.int32)
    tfs = rng.integers(1, 6, (n, slots)).astype(np.float32)
    doc_len = tfs.sum(1) + 1.0
    lex = LexicalCorpus(terms=jnp.asarray(terms),
                        tfs=jnp.asarray(tfs, jnp.bfloat16),
                        doc_len=jnp.asarray(doc_len))
    avgdl = jnp_.float32(float(doc_len.mean()))
    q_terms = np.stack([
        rng.choice(vocab, qn, replace=False) for _ in range(bsz)
    ]).astype(np.int32)
    # seed matches so scores are non-trivially nonzero
    q_terms[:, 0] = terms[:bsz, 0]
    q_idf = rng.random((bsz, qn)).astype(np.float32) + 0.5
    pool = rng.integers(0, n, (bsz, p)).astype(np.int32)
    pool[:, -1] = -1  # invalid entry

    got = np.asarray(_exact_bm25_rescore(
        jnp.asarray(pool), jnp.asarray(q_terms), jnp.asarray(q_idf),
        lex, avgdl, 1.2, 0.75,
    ))
    table = _idf_table(jnp.asarray(q_terms), jnp.asarray(q_idf), vocab)
    full = np.asarray(_bm25_block(
        table, lex.terms, lex.tfs, lex.doc_len, avgdl, 1.2, 0.75,
    ))  # [B, N] exact scores for every doc
    for bi in range(bsz):
        for pi in range(p - 1):
            np.testing.assert_allclose(
                got[bi, pi], full[bi, pool[bi, pi]], rtol=1e-5,
                err_msg=f"b={bi} pool_pos={pi} doc={pool[bi, pi]}")
    assert np.all(np.isneginf(got[:, -1]))


def test_rescoring_recovers_truncation_fidelity(rng):
    """With truncated postings, rescoring the fused pool must recover most
    of the exact-hybrid ranking (the r1 fidelity gap).

    Corpus proportions mirror bench.py's 1M config (build cap n/500,
    df-filtered discriminative query terms — the analyzer strips
    stopwords, so real queries never score on near-ubiquitous terms).
    """
    import jax.numpy as jnp_

    from super_rag_tpu.ops.bm25 import LexicalCorpus, bm25_search
    from super_rag_tpu.ops.bm25_inverted import build_inverted
    from super_rag_tpu.ops.dense import build_corpus, dense_search
    from super_rag_tpu.ops.hybrid import hybrid_search

    n, d, bsz, k, cand = 20_000, 32, 24, 10, 100
    slots, qn, vocab = 24, 12, 1 << 13
    emb = rng.standard_normal((n, d)).astype(np.float32)
    dense = build_corpus(jnp.asarray(emb), dtype=jnp.float32)
    zipf = rng.zipf(1.3, size=(n, slots)).astype(np.int64)
    terms = ((zipf - 1) % vocab).astype(np.int32)
    tfs = np.minimum(rng.zipf(2.0, size=(n, slots)), 8).astype(np.float32)
    doc_len = tfs.sum(1) * 2.0 + 1.0
    lex = LexicalCorpus(terms=jnp.asarray(terms),
                        tfs=jnp.asarray(tfs, jnp.bfloat16),
                        doc_len=jnp.asarray(doc_len))
    avgdl = jnp_.float32(float(doc_len.mean()))
    inverted = build_inverted(terms, tfs, doc_len, vocab,
                              postings_per_term=max(64, n // 500),
                              avgdl=float(doc_len.mean()))
    sorted_terms = np.sort(terms, axis=1)
    first = np.ones_like(sorted_terms, bool)
    first[:, 1:] = sorted_terms[:, 1:] != sorted_terms[:, :-1]
    uniq_flat = sorted_terms[first]
    df = np.bincount(uniq_flat[uniq_flat < vocab], minlength=vocab + 1)
    idf_tab = np.log(1.0 + (n - df + 0.5) / (df + 0.5)).astype(np.float32)
    q_rows = rng.integers(0, n, bsz)
    q_terms = np.full((bsz, qn), vocab, np.int32)
    df_cap = max(64, n // 50)
    for bi, row in enumerate(q_rows):
        uniq = [t for t in dict.fromkeys(int(x) for x in terms[row])
                if t < vocab and df[t] <= df_cap][:qn]
        q_terms[bi, : len(uniq)] = uniq
    q_idf = np.where(q_terms < vocab,
                     idf_tab[np.minimum(q_terms, vocab)], 0.0
                     ).astype(np.float32)
    queries = jnp.asarray(rng.standard_normal((bsz, d)).astype(np.float32))
    qt, qi = jnp.asarray(q_terms), jnp.asarray(q_idf)

    dv, di = dense_search(queries, dense, k=cand, block_size=4096)
    lv, li = bm25_search(qt, qi, lex, avgdl, vocab_size=vocab, k=cand,
                         block_size=4096)
    di = jnp.where(jnp.isfinite(dv), di, -1)
    li = jnp.where(jnp.isfinite(lv) & (lv > 0), li, -1)
    _, gold_i = rrf_fuse(di.astype(jnp.int32), li.astype(jnp.int32), k=k)
    gold = np.asarray(gold_i)

    def fid(rescore):
        res = hybrid_search(
            queries, qt, qi, dense, lex, avgdl, inverted=inverted,
            vocab_size=vocab, k=k, candidates=cand, use_pallas=False,
            block_size=4096, postings_per_query_term=64, rescore=rescore,
        )
        got = np.asarray(res.indices)
        return float(np.mean([
            len({x for x in a.tolist() if x >= 0}
                & {x for x in b.tolist() if x >= 0})
            / max(len({x for x in b.tolist() if x >= 0}), 1)
            for a, b in zip(got, gold)
        ]))

    f_off, f_on = fid(False), fid(True)
    assert f_on > f_off, (f_off, f_on)
    assert f_on >= 0.9, (f_off, f_on)


def test_sign_plane_build_matches_host_packer():
    """build_corpus(error_signs=True) packs the same plane as the IVF
    tier's host-side pack_error_signs wherever the error is
    non-negligible.  Exact bit parity is NOT required: elements whose
    error sits at a rounding boundary (e.g. the absmax element of each
    row, where x/scale is exactly ±127) flip sign under XLA's
    reciprocal-vs-divide rounding, and a ±0.25*scale correction on a
    ~zero error is itself ~zero."""
    from super_rag_tpu.ops.dense import build_corpus
    from super_rag_tpu.ops.ivf import pack_error_signs

    rng = np.random.default_rng(42)
    x = rng.standard_normal((64, 32)).astype(np.float32)
    corpus = build_corpus(jnp.asarray(x), dtype=jnp.int8, error_signs=True)
    assert corpus.sign_plane is not None
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    codes = np.asarray(corpus.values, np.float32)
    scales = np.asarray(corpus.scales)
    host = pack_error_signs(xn, codes.astype(np.int8), scales)
    dev_bits = np.unpackbits(np.asarray(corpus.sign_plane), axis=1,
                             bitorder="little")
    host_bits = np.unpackbits(host, axis=1, bitorder="little")
    err = np.abs(xn / np.where(scales > 0, scales, 1.0)[:, None] - codes)
    significant = err > 1e-3
    np.testing.assert_array_equal(dev_bits[significant],
                                  host_bits[significant])
    assert np.mean(dev_bits != host_bits) < 0.02


def test_dense_refine_matches_manual_and_beats_int8():
    """dense_refine re-ranks the int8 phase-1 pool by codes + 0.25*sign
    at f32 query precision: (a) the refined ordering matches a NumPy
    recompute; (b) top-10 overlap with the exact f32 ranking improves
    (the fidelity mechanism the sweep's refined configs rely on)."""
    import jax.numpy as jnp_

    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.bm25_inverted import build_inverted
    from super_rag_tpu.ops.dense import build_corpus
    from super_rag_tpu.ops.hybrid import hybrid_search

    rng = np.random.default_rng(42)
    n, d, bsz, k = 4096, 64, 16, 10
    slots, vocab = 8, 1 << 10
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    corpus = build_corpus(jnp.asarray(emb), dtype=jnp.int8, error_signs=True)
    plain = build_corpus(jnp.asarray(emb), dtype=jnp.int8)

    # lexical side with NO query matches: the fused result is exactly the
    # dense branch, which isolates the refine behavior
    terms = rng.integers(0, vocab, (n, slots)).astype(np.int32)
    tfs = np.ones((n, slots), np.float32)
    doc_len = tfs.sum(1)
    lex = LexicalCorpus(terms=jnp.asarray(terms),
                        tfs=jnp.asarray(tfs, jnp.bfloat16),
                        doc_len=jnp.asarray(doc_len))
    avgdl = jnp_.float32(float(doc_len.mean()))
    inverted = build_inverted(terms, tfs, doc_len, vocab,
                              postings_per_term=32,
                              avgdl=float(doc_len.mean()))
    q_terms = jnp.full((bsz, 4), vocab, jnp.int32)  # all pads
    q_idf = jnp.zeros((bsz, 4), jnp.float32)
    queries = rng.standard_normal((bsz, d)).astype(np.float32)
    qj = jnp.asarray(queries)

    def run(c, refine):
        return np.asarray(hybrid_search(
            qj, q_terms, q_idf, c, lex, avgdl, inverted=inverted,
            vocab_size=vocab, k=k, candidates=64, use_pallas=False,
            block_size=2048, rescore=False, dense_refine=refine,
        ).indices)

    got_plain = run(plain, 0)
    got_ref = run(corpus, 128)

    # (a) manual recompute of the refined ordering over the full corpus
    # (the phase-1 pool is 128 of 4096 — deep enough that the refined
    # top-10 equals the full-corpus refined top-10 for random data)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    codes = np.asarray(corpus.values, np.float32)
    scales = np.asarray(corpus.scales)
    signs = np.where(
        emb_n / np.where(scales > 0, scales, 1.0)[:, None] - codes > 0,
        1.0, -1.0).astype(np.float32)
    refined_scores = ((codes + 0.25 * signs) @ qn.T).T * scales[None, :]
    manual = np.argsort(-refined_scores, axis=1, kind="stable")[:, :k]
    assert float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k
        for a, b in zip(got_ref, manual)
    ])) >= 0.95

    # (b) refined ranks track the exact f32 ranking at least as well
    exact = np.argsort(-(emb_n @ qn.T).T, axis=1, kind="stable")[:, :k]

    def ov(got):
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(got, exact)
        ]))

    assert ov(got_ref) >= ov(got_plain), (ov(got_ref), ov(got_plain))


def test_csr_lex_tier_in_engine():
    """IndexSpec(lex_tier='csr'): compaction builds the untruncated CSR
    snapshot, the hybrid path returns the same winners as the table tier
    on a small corpus (where the table is also exact), dead rows stay
    excluded, and the fresh tail merges."""
    import jax.numpy as jnp_

    from super_rag_tpu.ops.bm25_inverted import CSRInvertedIndex

    def build(tier):
        eng = CollectionEngine(IndexSpec(dim=32, dtype=jnp_.float32,
                                         vocab_size=1 << 14, lex_tier=tier))
        eng.ingest(DOCS)
        eng.index.compact_lexical()
        return eng

    table = build("table")
    csr = build("csr")
    assert isinstance(csr.index._inverted, CSRInvertedIndex)
    assert not isinstance(table.index._inverted, CSRInvertedIndex)
    for q in ("fox jumping dog", "matrix multiplication hardware"):
        got_t = [h.row for h in table.search(q, top_k=4, mode="hybrid")]
        got_c = [h.row for h in csr.search(q, top_k=4, mode="hybrid")]
        assert got_t == got_c, (q, got_t, got_c)

    # delete + recompact: the dead row never resurfaces
    victim = csr.search("fox jumping dog", top_k=1, mode="hybrid")[0].row
    csr.index.delete([victim])
    csr.index.compact_lexical()
    rows = [h.row for h in csr.search("fox jumping dog", top_k=5,
                                      mode="hybrid")]
    assert victim not in rows
    # fresh tail after compaction still findable through the fused path
    csr.index.auto_compact_rows = 10_000
    csr.ingest(["a brand new doc about axolotls"])
    hits = csr.search("axolotls", top_k=2, mode="hybrid")
    assert hits and "axolotls" in hits[0].text


def test_ivf_tier_rescore_matches_flat_rescore():
    """Regression for the `b` shadow: the IVF branch bound the batch size
    to `b`, so every IVF-tier RESCORE ran BM25 length-normalization with
    b=batch_size instead of 0.75 — garbage lexical ranks that only the
    10M diagnostics exposed.  At nprobe=nlist the IVF dense branch is
    exact, so ivf-backed and flat-backed hybrids must return identical
    indices WITH rescoring on."""
    import jax.numpy as jnp_

    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.bm25_inverted import build_inverted
    from super_rag_tpu.ops.dense import build_corpus
    from super_rag_tpu.ops.hybrid import hybrid_search
    from super_rag_tpu.ops.ivf import build_ivf

    rng = np.random.default_rng(11)
    n, d, bsz, k, vocab, slots = 3000, 32, 8, 10, 1 << 11, 12
    emb = rng.standard_normal((n, d)).astype(np.float32)
    dense = build_corpus(jnp.asarray(emb), dtype=jnp.float32)
    ivf = build_ivf(jnp.asarray(emb), nlist=16, dtype=jnp.float32,
                    kmeans_iters=3)
    terms = ((rng.zipf(1.3, size=(n, slots)) - 1) % vocab).astype(np.int32)
    tfs = np.minimum(rng.zipf(2.0, size=(n, slots)), 8).astype(np.float32)
    doc_len = tfs.sum(1) * 2.0 + 1.0
    lex = LexicalCorpus(terms=jnp.asarray(terms),
                        tfs=jnp.asarray(tfs, jnp.bfloat16),
                        doc_len=jnp.asarray(doc_len))
    avgdl = jnp_.float32(float(doc_len.mean()))
    inv = build_inverted(terms, tfs, doc_len, vocab, postings_per_term=64,
                         avgdl=float(doc_len.mean()))
    st = np.sort(terms, axis=1)
    first = np.ones_like(st, bool)
    first[:, 1:] = st[:, 1:] != st[:, :-1]
    uniq_t = st[first]
    dfreq = np.bincount(uniq_t[uniq_t < vocab].astype(np.int64),
                        minlength=vocab + 1)
    idf = np.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5)).astype(np.float32)
    qrows = np.random.default_rng(12).integers(0, n, bsz)
    q_terms = np.full((bsz, 6), vocab, np.int32)
    for i, r in enumerate(qrows):
        uniq = [t for t in dict.fromkeys(terms[r].tolist())
                if t != vocab][:6]
        q_terms[i, : len(uniq)] = uniq
    qt = jnp.asarray(q_terms)
    qi = jnp.asarray(np.where(q_terms != vocab,
                              idf[np.minimum(q_terms, vocab)],
                              0.0).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((bsz, d)).astype(np.float32))

    common = dict(vocab_size=vocab, k=k, candidates=50, use_pallas=False,
                  block_size=1024, postings_per_query_term=32,
                  rescore=True, lex_gen=80)
    flat = hybrid_search(q, qt, qi, dense, lex, avgdl, inverted=inv,
                         **common)
    # nprobe=16=nlist: every cluster probed, IVF dense branch is exact
    via_ivf = hybrid_search(q, qt, qi, None, lex, avgdl, inverted=inv,
                            ivf=ivf, nprobe=16, num_docs=n, **common)
    np.testing.assert_array_equal(np.asarray(flat.indices),
                                  np.asarray(via_ivf.indices))


def test_csr_sharded_tier_in_engine():
    """IndexSpec(csr_shards=4): compaction builds the doc-sharded CSR and
    the serving path returns the same winners as the unsharded CSR tier."""
    import jax.numpy as jnp_

    from super_rag_tpu.ops.bm25_inverted import CSRInvertedIndex

    def build(shards):
        eng = CollectionEngine(IndexSpec(dim=32, dtype=jnp_.float32,
                                         vocab_size=1 << 14, lex_tier="csr",
                                         csr_shards=shards))
        eng.ingest(DOCS)
        eng.index.compact_lexical()
        return eng

    flat = build(1)
    sharded = build(4)
    assert isinstance(sharded.index._inverted, CSRInvertedIndex)
    assert sharded.index._inverted.shards == 4
    for q in ("fox jumping dog", "matrix multiplication hardware"):
        got_f = [h.row for h in flat.search(q, top_k=4, mode="hybrid")]
        got_s = [h.row for h in sharded.search(q, top_k=4, mode="hybrid")]
        assert got_f == got_s, (q, got_f, got_s)
