"""Decompose the 10M hybrid program's cost on the real chip.

BENCH_10M.json r3: batch-512 = 880 ms (581 QPS).  Candidate bottlenecks:
  (a) the Pallas probe-streaming kernel itself (DMA / matvec / loop
      overhead per cluster tile);
  (b) the EXACT final lax.top_k over the [B, nprobe*cap] candidate
      array (full bitonic sort of 92M floats at nprobe=128);
  (c) the inverted BM25 branch + exact rescore stage.

This script loads the cached 10M artifacts (.bench10m_cache/) and times
each stage separately with the queue-depth-marginal method.  One TPU
claim; run with a quiet host.

Run: MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824 \
     python -u scripts/tpu_profile_ivf.py
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
CHUNK = 262_144
N, D, NCEN = 8192 * 1221, 768, 2048
VOCAB, SLOTS = 1 << 17, 48
TAG = f"n{N}_d{D}_v{VOCAB}_s{SLOTS}"
T0 = time.perf_counter()


def log(m):
    print(f"[prof +{time.perf_counter() - T0:6.0f}s] {m}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.bm25_inverted import InvertedIndex, \
        inverted_bm25_search
    from super_rag_tpu.ops.dense import DenseCorpus
    from super_rag_tpu.ops.hybrid import hybrid_search
    from super_rag_tpu.ops.ivf import IVFIndex
    from super_rag_tpu.ops.pallas_ivf import pallas_ivf_topk

    log(f"backend {jax.default_backend()}")

    def timed(fn, sync, lo=2, hi=6):
        def total(depth):
            t0 = time.perf_counter()
            o = None
            for _ in range(depth):
                o = fn()
            sync(o)
            return time.perf_counter() - t0

        total(1)
        tlo = min(total(lo) for _ in range(2))
        thi = min(total(hi) for _ in range(2))
        return (thi - tlo) / (hi - lo)

    results = {}

    # ---- queries (same seeds as bench_10m) ------------------------------
    centers = (np.random.default_rng([7, 0])
               .standard_normal((NCEN, D), dtype=np.float32) * 3.0)
    qrng = np.random.default_rng([7, 1])
    q_assign = qrng.integers(0, NCEN, 512)
    q_all = centers[q_assign] + qrng.standard_normal((512, D),
                                                     dtype=np.float32)
    qn = q_all / np.linalg.norm(q_all, axis=1, keepdims=True)
    queries = jnp.asarray(qn)

    # ---- IVF on device ---------------------------------------------------
    z = np.load(os.path.join(CACHE, f"ivf_{TAG}_l8192.npz"))
    ivf = IVFIndex(
        centroids=jnp.asarray(z["centroids"]),
        values=jnp.asarray(z["values"]),
        scales=jnp.asarray(z["scales"]),
        row_ids=jnp.asarray(z["row_ids"]),
        overflow=DenseCorpus(values=jnp.asarray(z["of_values"]),
                             scales=jnp.asarray(z["of_scales"])),
        overflow_rows=jnp.asarray(z["of_rows"]),
        residual=bool(z["residual"]),
    )
    nlist, cap, _ = ivf.values.shape
    del z
    log(f"ivf on device (nlist={nlist} cap={cap})")

    # ---- stage: centroid scoring + probe top_k --------------------------
    @jax.jit
    def probe_only(q):
        cs = q @ ivf.centroids.T
        _, probes = jax.lax.top_k(cs, 128)
        return probes

    t = timed(lambda: probe_only(queries), lambda o: np.asarray(o))
    results["probe_b512_np128_ms"] = round(t * 1e3, 2)
    log(f"centroid+topk128 b512: {t * 1e3:.2f} ms")

    # ---- stage: pallas kernel + final extraction ------------------------
    for b in (32, 512):
        for np_ in (32, 128):
            for approx in (False, True):
                q = queries[:b]

                def run():
                    return pallas_ivf_topk(q, ivf, k=100, nprobe=np_,
                                           approx_topk=approx)

                t = timed(lambda: run(), lambda o: np.asarray(o[1]))
                key = f"ivf_b{b}_np{np_}_{'approx' if approx else 'exact'}_ms"
                results[key] = round(t * 1e3, 2)
                log(f"pallas_ivf b{b} nprobe{np_} "
                    f"{'approx' if approx else 'exact'}: {t * 1e3:.2f} ms")

    # ---- stage: bare top_k vs approx_max_k on candidate-shaped array ----
    cand = jnp.asarray(np.random.default_rng(3).standard_normal(
        (512, 128 * cap), dtype=np.float32))

    @jax.jit
    def exact_tk(c):
        return jax.lax.top_k(c, 100)[0]

    @jax.jit
    def approx_tk(c):
        return jax.lax.approx_max_k(c, 100)[0]

    t = timed(lambda: exact_tk(cand), lambda o: np.asarray(o))
    results["topk_512x180k_exact_ms"] = round(t * 1e3, 2)
    log(f"lax.top_k [512,180k] k=100: {t * 1e3:.2f} ms")
    t = timed(lambda: approx_tk(cand), lambda o: np.asarray(o))
    results["topk_512x180k_approx_ms"] = round(t * 1e3, 2)
    log(f"approx_max_k [512,180k] k=100: {t * 1e3:.2f} ms")
    del cand

    # ---- lexical + inverted on device -----------------------------------
    lex = np.load(os.path.join(CACHE, f"lex_{TAG}.npz"))
    terms, tfs_u8 = lex["terms"], lex["tfs"]
    del lex
    tfs32 = tfs_u8.astype(np.float32)
    doc_len = tfs32.sum(1) * 2.0 + 1.0
    avgdl = float(doc_len.mean())
    df = np.bincount(terms[terms < VOCAB].astype(np.int64),
                     minlength=VOCAB + 1)
    idf_table = np.log(1.0 + (N - df + 0.5) / (df + 0.5)).astype(np.float32)
    qterms_n = 16
    q_rows = np.random.default_rng([7, 5]).integers(0, N, 512)
    q_terms = np.full((512, qterms_n), VOCAB, np.int32)
    df_cap = max(64, N // 50)
    for bi, row in enumerate(q_rows):
        uniq = [t for t in dict.fromkeys(terms[row].tolist())
                if t != VOCAB and df[t] <= df_cap][:qterms_n]
        q_terms[bi, : len(uniq)] = uniq
    q_idf = np.where(q_terms != VOCAB, idf_table[np.minimum(q_terms, VOCAB)],
                     0.0).astype(np.float32)

    inv_np = np.load(os.path.join(CACHE, f"inverted_{TAG}_p1024.npz"))
    inverted = InvertedIndex(
        postings_ids=jnp.asarray(inv_np["ids"]),
        postings_impact=jnp.asarray(inv_np["impact"]).astype(jnp.bfloat16),
        num_docs=int(inv_np["num_docs"]),
    )
    del inv_np
    lexical = LexicalCorpus(
        terms=jnp.asarray(terms), tfs=jnp.asarray(tfs32, jnp.bfloat16),
        doc_len=jnp.asarray(doc_len.astype(np.float32)),
    )
    del terms, tfs32, tfs_u8
    avgdl_j = jnp.float32(avgdl)
    q_terms_j = jnp.asarray(q_terms)
    q_idf_j = jnp.asarray(q_idf)
    log("lexical + inverted on device")

    # ---- stage: inverted BM25 alone -------------------------------------
    def inv_run():
        return inverted_bm25_search(q_terms_j, q_idf_j, inverted, k=200,
                                    postings_per_query_term=256)

    t = timed(lambda: inv_run(), lambda o: np.asarray(o[1]))
    results["inverted_b512_ms"] = round(t * 1e3, 2)
    log(f"inverted bm25 b512: {t * 1e3:.2f} ms")

    # ---- full hybrid variants -------------------------------------------
    for label, kw in (
        ("np128_exact", dict(nprobe=128)),
        ("np32_exact", dict(nprobe=32)),
        ("np32_dapprox", dict(nprobe=32, dense_approx_topk=True)),
        ("np32_dapprox_norescore", dict(nprobe=32, dense_approx_topk=True,
                                        rescore=False)),
        ("np32_dapprox_lapprox", dict(nprobe=32, dense_approx_topk=True,
                                      lex_approx_topk=True)),
    ):
        for b in (32, 512):
            def run():
                return hybrid_search(
                    queries[:b], q_terms_j[:b], q_idf_j[:b], None, lexical,
                    avgdl_j, inverted=inverted, ivf=ivf, vocab_size=VOCAB,
                    k=10, candidates=100, use_pallas=True,
                    postings_per_query_term=256, num_docs=N, **kw,
                )

            t = timed(lambda: run(), lambda o: np.asarray(o.indices))
            results[f"hybrid_b{b}_{label}_ms"] = round(t * 1e3, 2)
            log(f"hybrid b{b} {label}: {t * 1e3:.2f} ms "
                f"(qps {b / t:.0f})")

    print(json.dumps(results), flush=True)
    with open(os.path.join(CACHE, "profile_ivf.json"), "w") as f:
        json.dump(results, f, indent=1)
    log("wrote .bench10m_cache/profile_ivf.json")


if __name__ == "__main__":
    main()
