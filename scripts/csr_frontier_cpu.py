"""CPU sweep: fused 10M fidelity over CSR query budgets, one process.

Loads the cached 10M arrays ONCE and loops (pq, deep_terms,
deep_postings) configs through the full fused pipeline (IVF nprobe=32 +
CSR lexical + exact rescore) — much cheaper than one bench_10m run per
row.  Goal: the narrowest sort width that still clears fused >= 0.95,
so stage 10's quality pass buys its fidelity at the least QPS cost.

Appends `csr_frontier_v2` to DIAG_10M_FIDELITY.json.

Configs are read from argv as pq:dt:dp triples, e.g.
    python scripts/csr_frontier_cpu.py 2048:4:32768 2048:6:32768
Default list targets the 150k-220k width band between the measured
0.9234 (90k) and 0.9547 (287k) rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench10m_cache")
TAG = "n10002432_d768_v131072_s48"
N_GOLD = 64
QTERMS = 16

DEFAULT = ["2048:4:32768", "2048:6:32768", "2048:4:49152", "1024:6:49152"]


def log(m):
    print(f"[frontier] {m}", flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.bm25_inverted import CSRInvertedIndex
    from super_rag_tpu.ops.dense import DenseCorpus
    from super_rag_tpu.ops.fusion import rrf_fuse
    from super_rag_tpu.ops.hybrid import hybrid_search
    from super_rag_tpu.ops.ivf import IVFIndex

    configs = []
    for a in (sys.argv[1:] or DEFAULT):
        pq, dt, dp = (int(x) for x in a.split(":"))
        configs.append((pq, dt, dp))

    n, d, vocab, slots = 10_002_432, 768, 1 << 17, 48
    n_centers, nlist, k, cand = 2048, 16384, 10, 100
    t0 = time.perf_counter()

    # queries (identical recipe to bench_10m / diag)
    centers = (np.random.default_rng([7, 0])
               .standard_normal((n_centers, d), dtype=np.float32) * 3.0)
    qrng = np.random.default_rng([7, 1])
    q_assign = qrng.integers(0, n_centers, 512)
    q_all = centers[q_assign] + qrng.standard_normal((512, d),
                                                     dtype=np.float32)
    qn = q_all / np.linalg.norm(q_all, axis=1, keepdims=True)
    del centers, q_all

    with np.load(os.path.join(CACHE, f"lex_{TAG}.npz")) as z:
        terms, tfs_u8 = z["terms"], z["tfs"]
    tfs32 = tfs_u8.astype(np.float32)
    doc_len = tfs32.sum(1) * 2.0 + 1.0
    avgdl = float(doc_len.mean())
    df = np.bincount(terms[terms < vocab].astype(np.int64),
                     minlength=vocab + 1)
    idf_table = np.log(1.0 + (n - df + 0.5) / (df + 0.5)).astype(np.float32)
    q_rows = np.random.default_rng([7, 5]).integers(0, n, 512)
    q_terms = np.full((512, QTERMS), vocab, np.int32)
    df_cap = max(64, n // 50)
    for bi, row in enumerate(q_rows):
        uniq = [t for t in dict.fromkeys(terms[row].tolist())
                if t != vocab and df[t] <= df_cap][:QTERMS]
        q_terms[bi, : len(uniq)] = uniq
    q_idf = np.where(q_terms != vocab, idf_table[np.minimum(q_terms, vocab)],
                     0.0).astype(np.float32)

    with np.load(os.path.join(CACHE, f"dense_gold_{TAG}.npz")) as z:
        gold_dv, gold_di = z["dv"], z["di"]
    with np.load(os.path.join(CACHE, f"bm25_gold_{TAG}.npz")) as z:
        gold_lv, gold_li = z["lv"], z["li"]
    gdi = np.where(np.isfinite(gold_dv), gold_di, -1).astype(np.int32)
    gli = np.where(np.isfinite(gold_lv) & (gold_lv > 0), gold_li,
                   -1).astype(np.int32)
    _, gold_hybrid = rrf_fuse(jnp.asarray(gdi), jnp.asarray(gli), k=k)
    gold_hybrid = np.asarray(gold_hybrid)

    lexical = LexicalCorpus(
        terms=jnp.asarray(terms), tfs=jnp.asarray(tfs32, jnp.bfloat16),
        doc_len=jnp.asarray(doc_len.astype(np.float32)),
    )
    del terms, tfs32, tfs_u8
    with np.load(os.path.join(CACHE, f"csr_{TAG}.npz")) as z:
        csr = CSRInvertedIndex(
            postings_docs=jnp.asarray(z["docs"]),
            postings_impact=jnp.asarray(z["impact"]).astype(jnp.bfloat16),
            offsets=jnp.asarray(z["offsets"]),
            num_docs=int(z["num_docs"]),
        )
    iv = dict(np.load(os.path.join(CACHE, f"ivf_{TAG}_l{nlist}.npz")))
    overflow = overflow_rows = None
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
    log(f"arrays loaded in {time.perf_counter() - t0:.0f}s")

    queries = jnp.asarray(qn[:N_GOLD])
    qt = jnp.asarray(q_terms[:N_GOLD])
    qi = jnp.asarray(q_idf[:N_GOLD])

    def overlap(got, gold, kk):
        return float(np.mean([
            len({x for x in a[:kk].tolist() if x >= 0}
                & {x for x in g[:kk].tolist() if x >= 0})
            / max(len({x for x in g[:kk].tolist() if x >= 0}), 1)
            for a, g in zip(np.asarray(got), gold)
        ]))

    rows = []
    for pq, dt, dp in configs:
        width = dt * dp + (QTERMS - dt) * pq
        t1 = time.perf_counter()
        res = hybrid_search(
            queries, qt, qi, None, lexical, jnp.float32(avgdl),
            inverted=csr, ivf=ivf, vocab_size=vocab, k=k, candidates=cand,
            use_pallas=False, nprobe=32, postings_per_query_term=pq,
            lex_deep_terms=dt, lex_deep_postings=dp,
            rescore=True, lex_gen=250, num_docs=n, int8_queries=True,
        )
        fid = overlap(res.indices, gold_hybrid, k)
        row = {"config": f"pq{pq} + deep{dt}x{dp}", "sort_width": width,
               "fused_fidelity": round(fid, 4)}
        rows.append(row)
        log(f"{row} ({time.perf_counter() - t1:.0f}s)")

    path = os.path.join(ROOT, "DIAG_10M_FIDELITY.json")
    try:
        with open(path) as f:
            prior = json.load(f)
    except (OSError, ValueError):
        prior = {}
    prior.setdefault("csr_frontier_v2", {"note": (
        "one-process fused sweep, 16-term queries, nprobe=32, rescore "
        "lg250 — hunting the narrowest width clearing 0.95"), "rows": []})
    prior["csr_frontier_v2"]["rows"].extend(rows)
    with open(path, "w") as f:
        json.dump(prior, f, indent=1)
    log("recorded csr_frontier_v2")


if __name__ == "__main__":
    main()
