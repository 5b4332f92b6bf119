"""CPU check: doc-sharded (16) CSR vs flat CSR on the REAL 10M arrays.

The sharded tier is exact by construction at full coverage; at the bench
budgets the per-shard slack makes coverage a superset in expectation.
This confirms it on the actual corpus: lexical candidate overlap vs the
exact BM25 gold must not regress, and candidate sets must be ~identical
between layouts.  Appends results to DIAG_10M_FIDELITY.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench10m_cache")
TAG = "n10002432_d768_v131072_s48"
N_Q = 64


def log(m):
    print(f"[csr16check] {m}", flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from super_rag_tpu.ops.bm25_inverted import (CSRInvertedIndex,
                                                 inverted_bm25_search)

    n, vocab = 10_002_432, 1 << 17
    with np.load(os.path.join(CACHE, f"lex_{TAG}.npz")) as z:
        terms = z["terms"]
    df = np.bincount(terms[terms < vocab].astype(np.int64),
                     minlength=vocab + 1)
    idf_table = np.log(1.0 + (n - df + 0.5) / (df + 0.5)).astype(np.float32)
    qterms_n = 16
    q_rows = np.random.default_rng([7, 5]).integers(0, n, 512)[:N_Q]
    q_terms = np.full((N_Q, qterms_n), vocab, np.int32)
    df_cap = max(64, n // 50)
    for bi, row in enumerate(q_rows):
        uniq = [t for t in dict.fromkeys(terms[row].tolist())
                if t != vocab and df[t] <= df_cap][:qterms_n]
        q_terms[bi, : len(uniq)] = uniq
    del terms
    q_idf = np.where(q_terms != vocab, idf_table[np.minimum(q_terms, vocab)],
                     0.0).astype(np.float32)
    with np.load(os.path.join(CACHE, f"bm25_gold_{TAG}.npz")) as z:
        gold_lv, gold_li = z["lv"], z["li"]
    gli = np.where(np.isfinite(gold_lv) & (gold_lv > 0), gold_li,
                   -1).astype(np.int32)[:N_Q]

    qt = jnp.asarray(q_terms)
    qi = jnp.asarray(q_idf)
    results = {}
    flat_ids = None
    for label, fname in (("flat", f"csr_{TAG}.npz"),
                         ("sharded16", f"csr16_{TAG}.npz")):
        with np.load(os.path.join(CACHE, fname)) as z:
            idx = CSRInvertedIndex(
                postings_docs=jnp.asarray(z["docs"]),
                postings_impact=jnp.asarray(z["impact"]).astype(jnp.bfloat16),
                offsets=jnp.asarray(z["offsets"]),
                num_docs=int(z["num_docs"]),
            )
        lv, li = inverted_bm25_search(
            qt, qi, idx, k=250, postings_per_query_term=2048,
            deep_terms=4, deep_postings=65536)
        li = np.asarray(li)
        ov = float(np.mean([
            len({x for x in a.tolist() if x >= 0}
                & {x for x in g[:100].tolist() if x >= 0})
            / max(len({x for x in g[:100].tolist() if x >= 0}), 1)
            for a, g in zip(li, gli)
        ]))
        results[label] = {"gen250_vs_gold_top100": round(ov, 4)}
        if label == "flat":
            flat_ids = li
        else:
            jac = float(np.mean([
                len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
                / max(len(set(a[a >= 0].tolist())
                          | set(b[b >= 0].tolist())), 1)
                for a, b in zip(flat_ids, li)
            ]))
            results["jaccard_flat_vs_sharded"] = round(jac, 4)
        log(f"{label}: {results[label]}")
        del idx

    path = os.path.join(ROOT, "DIAG_10M_FIDELITY.json")
    try:
        with open(path) as f:
            prior = json.load(f)
    except (OSError, ValueError):
        prior = {}
    prior["csr16_layout_check"] = {
        "note": ("real-10M lexical generation at the quality budget "
                 "(pq2048+deep4x65536), 64 queries: sharded-16 layout vs "
                 "flat; overlap vs exact gold must not regress"),
        **results,
    }
    with open(path, "w") as f:
        json.dump(prior, f, indent=1)
    log("recorded csr16_layout_check")


if __name__ == "__main__":
    main()
