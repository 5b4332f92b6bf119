"""10M-chunk single-chip NORTH-STAR benchmark — the full triple in one run.

BASELINE.md gates: recall@10 >= 0.95 vs exact fp32, >= 10k hybrid QPS/chip,
p50 < 5 ms — simultaneously, at 10M chunks (VERDICT r1 item 3).  Round 1
measured the pieces separately (flat int8 = recall 0.897; bf16 = 0.969 but
20 ms); this run serves ONE configuration for every gate:

    dense   IVF, residual int8 coding (ops/ivf.py build_ivf_streaming:
            balanced placement, x - centroid[stored] rows, score-exact
            regardless of which cluster holds a row), Pallas probe
            streaming (ops/pallas_ivf.py)
    lexical 48-slot zipf doc-term table + inverted postings (P=1024)
            with exact rescoring of the fused pool
    fused   one hybrid_search XLA program (dense=None — the IVF tier IS
            the dense branch; no 7.7 GB flat copy)

Golds are computed exactly: dense fp32 top-k streamed host-side (the f32
corpus never exists in one piece), BM25 by untruncated host postings,
hybrid = RRF of the two — the same definitions bench.py uses at 1M.

Run on TPU: python scripts/bench_10m.py [nprobe ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:  # `python scripts/...` puts scripts/ first
    sys.path.insert(0, ROOT)

CHUNK = 262_144
N_GOLD = 64
K1, B = 1.2, 0.75


def main() -> None:
    import jax

    # the axon sitecustomize overrides JAX_PLATFORMS; re-force it so
    # `JAX_PLATFORMS=cpu python scripts/bench_10m.py` really runs CPU
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.bm25_inverted import build_inverted
    from super_rag_tpu.ops.fusion import rrf_fuse
    from super_rag_tpu.ops.hybrid import hybrid_search
    from super_rag_tpu.ops.ivf import build_ivf_streaming
    from super_rag_tpu.ops.pallas_ivf import pallas_ivf_topk

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        n, d, n_centers, nlist = 8192 * 1221, 768, 2048, 8192
        slots, vocab = 48, 1 << 17
        batch, k, cand = 512, 10, 100
        train_sample = 300_000
        postings_per_term = 1024
        nprobes = [int(a) for a in sys.argv[1:]] or [32, 48, 64]
    else:  # CPU sanity shape
        n, d, n_centers, nlist = 8192 * 4, 128, 64, 64
        slots, vocab = 16, 1 << 14
        batch, k, cand = 64, 10, 50
        train_sample = 8_000
        postings_per_term = 256
        nprobes = [int(a) for a in sys.argv[1:]] or [8, 16]

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 3.0

    n_chunks = -(-n // CHUNK)

    def chunk_emb(ci: int) -> np.ndarray:
        """Deterministic, regeneratable corpus chunk (unit-norm rows)."""
        crng = np.random.default_rng([9, ci])
        m = min(CHUNK, n - ci * CHUNK)
        assign = crng.integers(0, n_centers, m)
        x = centers[assign] + crng.standard_normal((m, d)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    def chunks():
        for ci in range(n_chunks):
            yield chunk_emb(ci)

    # -- queries -------------------------------------------------------------
    q_assign = rng.integers(0, n_centers, batch)
    q_all = centers[q_assign] + rng.standard_normal((batch, d)).astype(
        np.float32
    )
    qn = q_all / np.linalg.norm(q_all, axis=1, keepdims=True)
    q_gold = qn[:N_GOLD]

    # -- lexical corpus (zipf, as bench.py) -----------------------------------
    t0 = time.perf_counter()
    zipf_raw = rng.zipf(1.3, size=(n, slots)).astype(np.int64)
    terms = ((zipf_raw - 1) % vocab).astype(np.int32)
    del zipf_raw
    tfs = np.minimum(rng.zipf(2.0, size=(n, slots)), 8).astype(np.float32)
    pad_mask = rng.random((n, slots)) < 0.2
    terms[pad_mask] = vocab
    tfs[pad_mask] = 0.0
    del pad_mask
    doc_len = tfs.sum(1) * 2.0 + 1.0
    avgdl = float(doc_len.mean())
    df = np.bincount(
        terms[terms < vocab].astype(np.int64), minlength=vocab + 1
    )
    idf_table = np.log(1.0 + (n - df + 0.5) / (df + 0.5)).astype(np.float32)
    lex_build_s = time.perf_counter() - t0

    # query terms: drawn from corpus rows, deduped, discriminative-df only
    qterms_n = 16
    q_rows = rng.integers(0, n, batch)
    q_terms = np.full((batch, qterms_n), vocab, np.int32)
    df_cap = max(64, n // 50)
    for bi, row in enumerate(q_rows):
        uniq = [t for t in dict.fromkeys(terms[row].tolist())
                if t != vocab and df[t] <= df_cap][:qterms_n]
        q_terms[bi, : len(uniq)] = uniq
    q_idf = np.where(q_terms != vocab, idf_table[np.minimum(q_terms, vocab)],
                     0.0).astype(np.float32)

    # -- exact dense gold (streamed fp32; top-cand for fusion gold) ----------
    t0 = time.perf_counter()
    gold_dv = np.full((N_GOLD, cand), -np.inf, np.float32)
    gold_di = np.full((N_GOLD, cand), -1, np.int64)
    for ci in range(n_chunks):
        chunk = chunk_emb(ci)
        s = q_gold @ chunk.T
        kk = min(cand, s.shape[1])
        loc = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
        lv = np.take_along_axis(s, loc, axis=1)
        cv = np.concatenate([gold_dv, lv], axis=1)
        cix = np.concatenate([gold_di, loc + ci * CHUNK], axis=1)
        sel = np.argpartition(-cv, cand - 1, axis=1)[:, :cand]
        gold_dv = np.take_along_axis(cv, sel, axis=1)
        gold_di = np.take_along_axis(cix, sel, axis=1)
    order = np.argsort(-gold_dv, axis=1)
    gold_dv = np.take_along_axis(gold_dv, order, axis=1)
    gold_di = np.take_along_axis(gold_di, order, axis=1)
    dense_gold_s = time.perf_counter() - t0

    # -- exact BM25 gold (untruncated host postings) --------------------------
    t0 = time.perf_counter()
    flat_terms = terms.reshape(-1)
    post_order = np.argsort(flat_terms, kind="stable")
    sorted_terms = flat_terms[post_order]
    norm_doc = (K1 * (1.0 - B + B * doc_len / avgdl)).astype(np.float32)
    gold_lv = np.full((N_GOLD, cand), -np.inf, np.float32)
    gold_li = np.full((N_GOLD, cand), -1, np.int64)
    scores = np.zeros(n, np.float32)
    for qi in range(N_GOLD):
        scores[:] = 0.0
        for t, w in zip(q_terms[qi], q_idf[qi]):
            if t >= vocab:
                continue
            lo = np.searchsorted(sorted_terms, t, side="left")
            hi = np.searchsorted(sorted_terms, t, side="right")
            pos = post_order[lo:hi]
            docs = pos // slots
            tf = tfs.reshape(-1)[pos]
            sat = tf * (K1 + 1.0) / (tf + norm_doc[docs])
            np.add.at(scores, docs, w * sat)
        kk = min(cand, n)
        loc = np.argpartition(-scores, kk - 1)[:kk]
        loc = loc[np.argsort(-scores[loc], kind="stable")]
        gold_lv[qi, : kk] = scores[loc]
        gold_li[qi, : kk] = loc
    del flat_terms, post_order, sorted_terms, scores
    lex_gold_s = time.perf_counter() - t0

    # exact hybrid gold = RRF of the two exact branches (bench.py semantics)
    gdi = np.where(np.isfinite(gold_dv), gold_di, -1).astype(np.int32)
    gli = np.where(np.isfinite(gold_lv) & (gold_lv > 0), gold_li, -1).astype(
        np.int32
    )
    _, gold_hybrid = rrf_fuse(jnp.asarray(gdi), jnp.asarray(gli), k=k)
    gold_hybrid = np.asarray(gold_hybrid)

    # -- IVF build (streamed, residual int8, balanced placement) -------------
    t0 = time.perf_counter()
    ivf = build_ivf_streaming(
        chunks, nlist=nlist, capacity_factor=1.15, dtype=jnp.int8,
        kmeans_iters=8, seed=1, train_sample=train_sample,
        assign_candidates=4,
    )
    overflow_n = (int(ivf.overflow_rows.size)
                  if ivf.overflow_rows is not None else 0)
    ivf_build_s = time.perf_counter() - t0

    # -- device lexical + inverted -------------------------------------------
    t0 = time.perf_counter()
    inverted = build_inverted(terms, tfs, doc_len, vocab,
                              postings_per_term=postings_per_term,
                              avgdl=avgdl)
    lexical = LexicalCorpus(
        terms=jnp.asarray(terms), tfs=jnp.asarray(tfs, jnp.bfloat16),
        doc_len=jnp.asarray(doc_len.astype(np.float32)),
    )
    del terms, tfs
    avgdl_j = jnp.float32(avgdl)
    inv_build_s = time.perf_counter() - t0

    queries = jnp.asarray(qn)
    q_terms_j = jnp.asarray(q_terms)
    q_idf_j = jnp.asarray(q_idf)

    def recall_of(ids, gold):
        return float(np.mean([
            len({x for x in a.tolist() if x >= 0}
                & {x for x in g.tolist() if x >= 0})
            / max(len({x for x in g.tolist() if x >= 0}), 1)
            for a, g in zip(np.asarray(ids), gold)
        ]))

    # -- nprobe selection: smallest that clears the dense recall gate --------
    dense_recalls = {}
    chosen = nprobes[-1]
    for np_ in nprobes:
        if on_tpu:
            _, di = pallas_ivf_topk(queries[:N_GOLD], ivf, k=k, nprobe=np_)
        else:
            from super_rag_tpu.ops.ivf import ivf_search

            _, di = ivf_search(queries[:N_GOLD], ivf, k=k, nprobe=np_)
        r = recall_of(di, gold_di[:, :k])
        dense_recalls[np_] = round(r, 4)
        if r >= 0.95:
            chosen = np_
            break

    def run(q, t, i):
        return hybrid_search(
            q, t, i, None, lexical, avgdl_j,
            inverted=inverted, ivf=ivf,
            vocab_size=vocab, k=k, candidates=cand,
            use_pallas=on_tpu, nprobe=chosen,
            postings_per_query_term=256, rescore=True,
            num_docs=n,
        )

    def sync(out):
        np.asarray(out.indices)

    res = run(queries[:N_GOLD], q_terms_j[:N_GOLD], q_idf_j[:N_GOLD])
    sync(res)
    hybrid_fidelity = recall_of(np.asarray(res.indices), gold_hybrid)

    def timed(fn, lo=4, hi=12):
        def total(depth):
            t0 = time.perf_counter()
            o = None
            for _ in range(depth):
                o = fn()
            sync(o)
            return time.perf_counter() - t0

        total(2)
        tlo = min(total(lo) for _ in range(2))
        thi = min(total(hi) for _ in range(2))
        return (thi - tlo) / (hi - lo)

    run512 = lambda: run(queries, q_terms_j, q_idf_j)
    run32 = lambda: run(queries[:32], q_terms_j[:32], q_idf_j[:32])
    sync(run512())
    per_call_512 = timed(run512)
    sync(run32())
    per_call_32 = timed(run32)

    qps = batch / per_call_512
    recall = dense_recalls[chosen]
    hbm_gb = (ivf.values.size + (lexical.terms.size * 4)
              + (lexical.tfs.size * 2) + inverted.postings_ids.size * 4
              + inverted.postings_impact.size * 2) / 2**30
    gates = {
        "recall_gate_0.95": recall >= 0.95,
        "qps_gate_10k": qps >= 10_000,
        "p50_gate_5ms": per_call_32 * 1e3 / 1.0 < 5.0,
    }
    print(json.dumps({
        "metric": "hybrid_north_star_10m_single_chip",
        "value": round(qps, 1),
        "unit": "queries/s",
        "n": n, "d": d, "nlist": nlist, "nprobe": chosen,
        "dense_recall_at_10_vs_exact_f32": recall,
        "dense_recall_by_nprobe": dense_recalls,
        "hybrid_fidelity_vs_exact_hybrid": round(hybrid_fidelity, 4),
        "batch512_ms": round(per_call_512 * 1e3, 2),
        "batch32_ms": round(per_call_32 * 1e3, 2),
        "hbm_gb": round(hbm_gb, 2),
        "ivf_overflow_rows": overflow_n,
        "gates": gates,
        "all_gates": all(gates.values()),
        "build_s": {"lexical": round(lex_build_s, 1),
                    "dense_gold": round(dense_gold_s, 1),
                    "bm25_gold": round(lex_gold_s, 1),
                    "ivf": round(ivf_build_s, 1),
                    "inverted": round(inv_build_s, 1)},
    }), flush=True)


if __name__ == "__main__":
    main()
