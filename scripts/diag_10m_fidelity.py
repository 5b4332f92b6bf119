"""Decompose the 10M hybrid-fidelity gap by branch, on the CPU backend.

BENCH_10M_RECALL_CPU.json recorded dense recall@10 0.9703 (gate passes)
but hybrid fidelity 0.4984 at the staged operating point (nprobe=32,
P_q=768 of stored 1024, rescore lg250, 16-term queries).  This script
answers, from the same caches and golds:

  1. dense branch: top-100 overlap vs the exact f32 gold per nprobe —
     the recall@10 gate picks nprobe for rank-10 quality, but RRF + the
     rescore pool consume rank-100 lists;
  2. lexical branch: generation overlap vs the exact BM25 gold under
     uniform caps and df-adaptive deep budgets (the 1M fix, untested at
     10M's much harsher stored-1024 / df-200k truncation);
  3. end-to-end fidelity for the candidate fixed configs.

Run: MALLOC_*=... python -u scripts/diag_10m_fidelity.py
Writes DIAG_10M_FIDELITY.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

CACHE = os.path.join(ROOT, ".bench10m_cache")
N_GOLD = 64
K1, B = 1.2, 0.75
T0 = time.perf_counter()


def log(msg):
    print(f"[diag10m +{time.perf_counter() - T0:6.0f}s] {msg}", flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.bm25_inverted import (InvertedIndex,
                                                 inverted_bm25_search)
    from super_rag_tpu.ops.dense import DenseCorpus
    from super_rag_tpu.ops.fusion import rrf_fuse
    from super_rag_tpu.ops.hybrid import hybrid_search
    from super_rag_tpu.ops.ivf import IVFIndex, ivf_search

    n, d, n_centers = 8192 * 1221, 768, 2048
    nlist = 16384
    slots, vocab = 48, 1 << 17
    batch, k, cand = 512, 10, 100
    tag = f"n{n}_d{d}_v{vocab}_s{slots}"

    # queries + golds (identical recipe to bench_10m.py)
    centers = (np.random.default_rng([7, 0])
               .standard_normal((n_centers, d), dtype=np.float32) * 3.0)
    qrng = np.random.default_rng([7, 1])
    q_assign = qrng.integers(0, n_centers, batch)
    q_all = centers[q_assign] + qrng.standard_normal((batch, d),
                                                     dtype=np.float32)
    qn = q_all / np.linalg.norm(q_all, axis=1, keepdims=True)
    del centers, q_all

    with np.load(os.path.join(CACHE, f"lex_{tag}.npz")) as z:
        terms, tfs_u8 = z["terms"], z["tfs"]
    tfs32 = tfs_u8.astype(np.float32)
    doc_len = tfs32.sum(1) * 2.0 + 1.0
    avgdl = float(doc_len.mean())
    df = np.bincount(terms[terms < vocab].astype(np.int64),
                     minlength=vocab + 1)
    idf_table = np.log(1.0 + (n - df + 0.5) / (df + 0.5)).astype(np.float32)
    qterms_n = 16
    q_rows = np.random.default_rng([7, 5]).integers(0, n, batch)
    q_terms = np.full((batch, qterms_n), vocab, np.int32)
    df_cap = max(64, n // 50)
    for bi, row in enumerate(q_rows):
        uniq = [t for t in dict.fromkeys(terms[row].tolist())
                if t != vocab and df[t] <= df_cap][:qterms_n]
        q_terms[bi, : len(uniq)] = uniq
    q_idf = np.where(q_terms != vocab, idf_table[np.minimum(q_terms, vocab)],
                     0.0).astype(np.float32)
    log("queries ready")

    with np.load(os.path.join(CACHE, f"dense_gold_{tag}.npz")) as z:
        gold_dv, gold_di = z["dv"], z["di"]
    with np.load(os.path.join(CACHE, f"bm25_gold_{tag}.npz")) as z:
        gold_lv, gold_li = z["lv"], z["li"]
    gdi = np.where(np.isfinite(gold_dv), gold_di, -1).astype(np.int32)
    gli = np.where(np.isfinite(gold_lv) & (gold_lv > 0), gold_li,
                   -1).astype(np.int32)
    _, gold_hybrid = rrf_fuse(jnp.asarray(gdi), jnp.asarray(gli), k=k)
    gold_hybrid = np.asarray(gold_hybrid)
    log("golds loaded")

    def overlap(got, gold, kk):
        return float(np.mean([
            len({x for x in a[:kk].tolist() if x >= 0}
                & {x for x in g[:kk].tolist() if x >= 0})
            / max(len({x for x in g[:kk].tolist() if x >= 0}), 1)
            for a, g in zip(np.asarray(got), gold)
        ]))

    out = {"branch_dense": {}, "branch_lex": {}, "hybrid": {}}

    # -- lexical branch first (cheap): generation overlap vs exact gold ----
    with np.load(os.path.join(CACHE, f"inverted_{tag}_p1024.npz")) as z:
        inverted = InvertedIndex(
            postings_ids=jnp.asarray(z["ids"]),
            postings_impact=jnp.asarray(z["impact"]).astype(jnp.bfloat16),
            num_docs=int(z["num_docs"]),
        )
    qt = jnp.asarray(q_terms[:N_GOLD])
    qi = jnp.asarray(q_idf[:N_GOLD])
    for label, ppq, dt, dp in (
        ("pq768", 768, 0, None),
        ("pq1024(full)", 1024, 0, None),
        ("da512+6xfull", 512, 6, 1024),
        ("da256+8xfull", 256, 8, 1024),
    ):
        lv, li = inverted_bm25_search(qt, qi, inverted, k=250,
                                      postings_per_query_term=ppq,
                                      deep_terms=dt, deep_postings=dp)
        out["branch_lex"][label] = {
            "gen250_vs_gold_top100": round(overlap(li, gli, 100), 4),
            "gen250_vs_gold_top10": round(overlap(li, gli, 10), 4),
        }
        log(f"lex {label}: {out['branch_lex'][label]}")

    # -- dense branch: top-100 overlap per nprobe --------------------------
    iv_path = os.path.join(CACHE, f"ivf_{tag}_l{nlist}.npz")
    iv = dict(np.load(iv_path))
    overflow = None
    overflow_rows = None
    if "of_values" in iv:
        overflow = DenseCorpus(values=jnp.asarray(iv["of_values"]),
                               scales=jnp.asarray(iv["of_scales"]))
        overflow_rows = jnp.asarray(iv["of_rows"])
    ivf = IVFIndex(
        centroids=jnp.asarray(iv["centroids"]),
        values=jnp.asarray(iv["values"]),
        scales=jnp.asarray(iv["scales"]),
        row_ids=jnp.asarray(iv["row_ids"]),
        overflow=overflow, overflow_rows=overflow_rows,
        residual=bool(iv["residual"]),
        sign_plane=(jnp.asarray(iv["sign_plane"])
                    if "sign_plane" in iv else None),
        of_sign_plane=(jnp.asarray(iv["of_sign_plane"])
                       if "of_sign_plane" in iv else None),
        of_assign=(jnp.asarray(iv["of_assign"])
                   if "of_assign" in iv else None),
    )
    del iv
    log("ivf loaded")
    queries = jnp.asarray(qn[:N_GOLD])
    for np_ in (32, 64, 128):
        _, di = ivf_search(queries, ivf, k=cand, nprobe=np_)
        out["branch_dense"][np_] = {
            "top100_vs_gold_top100": round(overlap(di, gdi, 100), 4),
            "top10_vs_gold_top10": round(overlap(di, gdi, 10), 4),
        }
        log(f"dense nprobe {np_}: {out['branch_dense'][np_]}")

    # -- end-to-end candidates ---------------------------------------------
    lexical = LexicalCorpus(
        terms=jnp.asarray(terms), tfs=jnp.asarray(tfs32, jnp.bfloat16),
        doc_len=jnp.asarray(doc_len.astype(np.float32)),
    )
    del terms, tfs32, tfs_u8
    avgdl_j = jnp.float32(avgdl)

    def fid(nprobe, ppq, dt, dp, lg, dgen=None):
        res = hybrid_search(
            queries, qt, qi, None, lexical, avgdl_j,
            inverted=inverted, ivf=ivf, vocab_size=vocab, k=k,
            candidates=cand, use_pallas=False, nprobe=nprobe,
            postings_per_query_term=ppq, rescore=True, lex_gen=lg,
            lex_deep_terms=dt, lex_deep_postings=dp, num_docs=n,
            int8_queries=True, dense_approx_topk=False, dense_gen=dgen,
        )
        return round(overlap(res.indices, gold_hybrid, k), 4)

    for label, args in (
        ("staged: np32 pq768 lg250", (32, 768, 0, None, 250)),
        ("np128 pq768 lg250", (128, 768, 0, None, 250)),
        ("np128 da512+6xfull lg300", (128, 512, 6, 1024, 300)),
        ("np128 da512+6xfull lg300 dgen300", (128, 512, 6, 1024, 300, 300)),
    ):
        out["hybrid"][label] = fid(*args)
        log(f"hybrid {label}: {out['hybrid'][label]}")

    with open(os.path.join(ROOT, "DIAG_10M_FIDELITY.json"), "w") as f:
        json.dump(out, f, indent=1)
    log("wrote DIAG_10M_FIDELITY.json")


if __name__ == "__main__" and "--csr-ladder" not in sys.argv:
    main()


def csr_ladder() -> None:
    """Budget -> fidelity ladder on the CSR (untruncated) tier: measures
    how fused fidelity scales with the query-time postings budget now
    that the build cap is gone.  On this synthetic corpus the per-term
    impacts are near-flat (tf capped at 8, quantized doc lengths), so a
    gold doc's position in a df-200k run is ~uniform and prefix coverage
    is ~budget/df — the ladder quantifies exactly that."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.bm25_inverted import (CSRInvertedIndex,
                                                 inverted_bm25_search)
    from super_rag_tpu.ops.dense import DenseCorpus
    from super_rag_tpu.ops.fusion import rrf_fuse
    from super_rag_tpu.ops.hybrid import hybrid_search
    from super_rag_tpu.ops.ivf import IVFIndex

    n, d, n_centers = 8192 * 1221, 768, 2048
    nlist = 16384
    slots, vocab = 48, 1 << 17
    batch, k, cand = 512, 10, 100
    tag = f"n{n}_d{d}_v{vocab}_s{slots}"

    centers = (np.random.default_rng([7, 0])
               .standard_normal((n_centers, d), dtype=np.float32) * 3.0)
    qrng = np.random.default_rng([7, 1])
    q_assign = qrng.integers(0, n_centers, batch)
    q_all = centers[q_assign] + qrng.standard_normal((batch, d),
                                                     dtype=np.float32)
    qn = q_all / np.linalg.norm(q_all, axis=1, keepdims=True)
    del centers, q_all

    with np.load(os.path.join(CACHE, f"lex_{tag}.npz")) as z:
        terms, tfs_u8 = z["terms"], z["tfs"]
    tfs32 = tfs_u8.astype(np.float32)
    doc_len = tfs32.sum(1) * 2.0 + 1.0
    avgdl = float(doc_len.mean())
    df = np.bincount(terms[terms < vocab].astype(np.int64),
                     minlength=vocab + 1)
    idf_table = np.log(1.0 + (n - df + 0.5) / (df + 0.5)).astype(np.float32)
    qterms_n = 16
    q_rows = np.random.default_rng([7, 5]).integers(0, n, batch)
    q_terms = np.full((batch, qterms_n), vocab, np.int32)
    df_cap = max(64, n // 50)
    for bi, row in enumerate(q_rows):
        uniq = [t for t in dict.fromkeys(terms[row].tolist())
                if t != vocab and df[t] <= df_cap][:qterms_n]
        q_terms[bi, : len(uniq)] = uniq
    q_idf = np.where(q_terms != vocab, idf_table[np.minimum(q_terms, vocab)],
                     0.0).astype(np.float32)
    qdfs = np.where(q_terms[:N_GOLD] < vocab,
                    df[np.minimum(q_terms[:N_GOLD], vocab)], 0)
    log(f"query-term df: median {int(np.median(qdfs[qdfs > 0]))} "
        f"p90 {int(np.percentile(qdfs[qdfs > 0], 90))} "
        f"max {int(qdfs.max())}")

    with np.load(os.path.join(CACHE, f"dense_gold_{tag}.npz")) as z:
        gold_dv, gold_di = z["dv"], z["di"]
    with np.load(os.path.join(CACHE, f"bm25_gold_{tag}.npz")) as z:
        gold_lv, gold_li = z["lv"], z["li"]
    gdi = np.where(np.isfinite(gold_dv), gold_di, -1).astype(np.int32)
    gli = np.where(np.isfinite(gold_lv) & (gold_lv > 0), gold_li,
                   -1).astype(np.int32)
    _, gold_hybrid = rrf_fuse(jnp.asarray(gdi), jnp.asarray(gli), k=k)
    gold_hybrid = np.asarray(gold_hybrid)

    def overlap(got, gold, kk):
        return float(np.mean([
            len({x for x in a[:kk].tolist() if x >= 0}
                & {x for x in g[:kk].tolist() if x >= 0})
            / max(len({x for x in g[:kk].tolist() if x >= 0}), 1)
            for a, g in zip(np.asarray(got), gold)
        ]))

    with np.load(os.path.join(CACHE, f"csr_{tag}.npz")) as z:
        csr = CSRInvertedIndex(
            postings_docs=jnp.asarray(z["docs"]),
            postings_impact=jnp.asarray(z["impact"]).astype(jnp.bfloat16),
            offsets=jnp.asarray(z["offsets"]),
            num_docs=int(z["num_docs"]),
        )
    lexical = LexicalCorpus(
        terms=jnp.asarray(terms), tfs=jnp.asarray(tfs32, jnp.bfloat16),
        doc_len=jnp.asarray(doc_len.astype(np.float32)),
    )
    del terms, tfs32, tfs_u8
    qt = jnp.asarray(q_terms[:N_GOLD])
    qi = jnp.asarray(q_idf[:N_GOLD])
    out = {"lex_branch": {}, "hybrid": {}}
    for pq in (2048, 8192, 32768, 131072):
        lg = 250
        lv, li = inverted_bm25_search(qt, qi, csr, k=lg,
                                      postings_per_query_term=pq)
        out["lex_branch"][pq] = {
            "gen250_vs_gold_top100": round(overlap(li, gli, 100), 4),
        }
        log(f"csr lex pq={pq}: {out['lex_branch'][pq]}")

    iv = dict(np.load(os.path.join(CACHE, f"ivf_{tag}_l{nlist}.npz")))
    overflow = None
    overflow_rows = None
    if "of_values" in iv:
        overflow = DenseCorpus(values=jnp.asarray(iv["of_values"]),
                               scales=jnp.asarray(iv["of_scales"]))
        overflow_rows = jnp.asarray(iv["of_rows"])
    ivf = IVFIndex(
        centroids=jnp.asarray(iv["centroids"]),
        values=jnp.asarray(iv["values"]),
        scales=jnp.asarray(iv["scales"]),
        row_ids=jnp.asarray(iv["row_ids"]),
        overflow=overflow, overflow_rows=overflow_rows,
        residual=bool(iv["residual"]),
        sign_plane=(jnp.asarray(iv["sign_plane"])
                    if "sign_plane" in iv else None),
        of_sign_plane=(jnp.asarray(iv["of_sign_plane"])
                       if "of_sign_plane" in iv else None),
        of_assign=(jnp.asarray(iv["of_assign"])
                   if "of_assign" in iv else None),
    )
    del iv
    queries = jnp.asarray(qn[:N_GOLD])
    for pq in (8192, 32768):
        res = hybrid_search(
            queries, qt, qi, None, lexical, jnp.float32(avgdl),
            inverted=csr, ivf=ivf, vocab_size=vocab, k=k, candidates=cand,
            use_pallas=False, nprobe=32, postings_per_query_term=pq,
            rescore=True, lex_gen=250, num_docs=n, int8_queries=True,
        )
        out["hybrid"][pq] = round(overlap(res.indices, gold_hybrid, k), 4)
        log(f"csr hybrid pq={pq}: {out['hybrid'][pq]}")

    path = os.path.join(ROOT, "DIAG_10M_FIDELITY.json")
    try:
        with open(path) as f:
            prior = json.load(f)
    except (OSError, ValueError):
        prior = {}
    prior["csr_ladder"] = out
    with open(path, "w") as f:
        json.dump(prior, f, indent=1)
    log("csr ladder recorded")


if __name__ == "__main__" and "--csr-ladder" in sys.argv:
    csr_ladder()
    sys.exit(0)
