"""IVF latency-tier benchmark: clustered 1M corpus, small-batch hybrid.

The flat kernel streams the whole corpus per batch (batch-32 latency
~8.6 ms at 1M x 768); the IVF tier bounds bytes/query to ~nprobe/nlist.
This script measures the fused IVF-hybrid latency and its recall against
exact flat search on a CLUSTERED corpus (real embeddings cluster; uniform
gaussian is the known-degenerate case for IVF).

Run on TPU: python scripts/bench_ivf.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.bm25_inverted import build_inverted
    from super_rag_tpu.ops.dense import DenseCorpus, build_corpus
    from super_rag_tpu.ops.hybrid import hybrid_search
    from super_rag_tpu.ops.ivf import build_ivf, ivf_search

    on_tpu = jax.default_backend() != "cpu"
    n = 1_000_000 if on_tpu else 20_000
    d = 768 if on_tpu else 64
    n_centers = 1024 if on_tpu else 64
    nlist = 8192 if on_tpu else 128
    nprobe = 32
    batch, k, cand = 32, 10, 100
    slots, vocab = 64 if on_tpu else 16, 1 << 17 if on_tpu else 1 << 14

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 3.0
    assign = rng.integers(0, n_centers, n)
    emb = (centers[assign]
           + rng.standard_normal((n, d), dtype=np.float32) * 1.0)

    t0 = time.perf_counter()
    ivf = build_ivf(jnp.asarray(emb), nlist=nlist, dtype=jnp.int8,
                    kmeans_iters=6, capacity_factor=1.2)
    build_s = time.perf_counter() - t0
    import gc
    gc.collect()  # free the f32 training copies before serving arrays

    zipf_raw = rng.zipf(1.3, size=(n, slots)).astype(np.int64)
    terms = ((zipf_raw - 1) % vocab).astype(np.int32)
    tfs = np.minimum(rng.zipf(2.0, size=(n, slots)), 8).astype(np.float32)
    pad = rng.random((n, slots)) < 0.2
    terms[pad] = vocab
    tfs[pad] = 0
    dl = tfs.sum(1) * 2 + 1
    lexical = LexicalCorpus(jnp.asarray(terms), jnp.asarray(tfs, jnp.bfloat16),
                            jnp.asarray(dl))
    inverted = build_inverted(terms, tfs, dl, vocab, postings_per_term=256,
                              avgdl=float(dl.mean()))
    avgdl = jnp.float32(dl.mean())

    # queries near cluster centers (in-distribution)
    q_assign = rng.integers(0, n_centers, batch)
    queries = jnp.asarray(
        centers[q_assign]
        + rng.standard_normal((batch, d), dtype=np.float32) * 1.0
    )
    q_terms = np.full((batch, 16), vocab, np.int32)
    for bi in range(batch):
        row = rng.integers(0, n)
        uniq = [t for t in dict.fromkeys(terms[row].tolist()) if t != vocab][:16]
        q_terms[bi, : len(uniq)] = uniq
    q_terms_j = jnp.asarray(q_terms)
    q_idf_j = jnp.where(q_terms_j != vocab, 3.0, 0.0).astype(jnp.float32)

    # the dense corpus arg is unused when the IVF branch is active, but
    # hybrid_search requires it for shape info; pass the int8 corpus
    dense_int8 = build_corpus(jnp.asarray(emb), dtype=jnp.int8)

    def run():
        return hybrid_search(
            queries, q_terms_j, q_idf_j, dense_int8, lexical, avgdl,
            inverted=inverted, ivf=ivf, nprobe=nprobe,
            vocab_size=vocab, k=k, candidates=cand,
            postings_per_query_term=256,
        )

    def sync(out):
        np.asarray(out.indices)

    res = run()
    sync(res)

    # dense recall of the IVF branch vs exact fp32 gold (host numpy to
    # keep HBM for the serving-shaped arrays; 1M x 768 x 32 queries is
    # ~25 GFLOP on the host, a few seconds)
    qn = np.asarray(queries, np.float32)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    scores = qn @ en.T
    gi = np.argsort(-scores, axis=1)[:, :k]
    av, ai = ivf_search(queries, ivf, k=k, nprobe=nprobe)
    ai = np.asarray(ai)
    recall = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(ai, gi)
    ]))

    def timed(fn, lo=8, hi=24):
        def total(depth):
            t0 = time.perf_counter()
            out = None
            for _ in range(depth):
                out = fn()
            sync(out)
            return time.perf_counter() - t0
        total(2)
        tlo = min(total(lo) for _ in range(2))
        thi = min(total(hi) for _ in range(2))
        return (thi - tlo) / (hi - lo)

    per_call = timed(run)

    # Pallas IVF kernel (probe-driven streaming; ops/pallas_ivf.py)
    from super_rag_tpu.ops.pallas_ivf import pallas_ivf_topk

    def run_pallas():
        return pallas_ivf_topk(queries, ivf, k=k, nprobe=nprobe,
                               interpret=not on_tpu)

    def sync_pair(out):
        np.asarray(out[1])

    out = run_pallas()
    sync_pair(out)
    pi = np.asarray(out[1])
    pallas_recall = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(pi, gi)
    ]))

    def timed_pair(fn, lo=8, hi=24):
        def total(depth):
            t0 = time.perf_counter()
            o = None
            for _ in range(depth):
                o = fn()
            sync_pair(o)
            return time.perf_counter() - t0
        total(2)
        tlo = min(total(lo) for _ in range(2))
        thi = min(total(hi) for _ in range(2))
        return (thi - tlo) / (hi - lo)

    pallas_call_s = timed_pair(run_pallas)

    print(json.dumps({
        "metric": f"IVF latency tier (nlist={nlist}, nprobe={nprobe},"
                  f" {n}x{d} int8, batch {batch})",
        "xla_hybrid_latency_ms": round(per_call * 1000, 3),
        "pallas_ivf_dense_latency_ms": round(pallas_call_s * 1000, 3),
        "pallas_ivf_dense_qps": round(batch / pallas_call_s, 1),
        "ivf_dense_recall_at_10_vs_exact": round(recall, 4),
        "pallas_ivf_recall_at_10": round(pallas_recall, 4),
        "ivf_build_s": round(build_s, 1),
        "pallas_meets_p50_5ms": pallas_call_s * 1000 < 5.0,
    }), flush=True)

    # recall/latency curve over nprobe (the production tuning knob)
    for np_ in (16, 48, 64):
        if np_ == nprobe:
            continue

        def run_np():
            return pallas_ivf_topk(queries, ivf, k=k, nprobe=np_,
                                   interpret=not on_tpu)

        o = run_np()
        sync_pair(o)
        pi_ = np.asarray(o[1])
        rec_ = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(pi_, gi)
        ]))
        t_ = timed_pair(run_np)
        print(json.dumps({
            "nprobe": np_,
            "pallas_ivf_latency_ms": round(t_ * 1000, 3),
            "recall_at_10": round(rec_, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
