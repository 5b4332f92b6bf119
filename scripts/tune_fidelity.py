"""Hybrid-fidelity vs QPS sweep over the query-time postings cap.

bench.py reports hybrid_fidelity = fused-hybrid top-k overlap with a
truncation-free exact-hybrid gold.  The stored inverted index keeps
n/500 = 2000 postings per term at 1M docs; the query-time
``postings_per_query_term`` cap (256 in the headline config) is the
only lexical pruning.  This sweep measures what relaxing it buys and
costs, and splits the fidelity loss by branch (dense int8 vs inverted
BM25) so tuning targets the right knob.

Run on TPU: python scripts/tune_fidelity.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the axon sitecustomize overrides JAX_PLATFORMS; re-force it so
        # `JAX_PLATFORMS=cpu` really runs the CPU sanity shapes
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.ops.bm25 import LexicalCorpus, bm25_search
    from super_rag_tpu.ops.bm25_inverted import (build_inverted,
                                                 inverted_bm25_search)
    from super_rag_tpu.ops.dense import build_corpus, dense_search
    from super_rag_tpu.ops.fusion import rrf_fuse
    from super_rag_tpu.ops.hybrid import hybrid_search

    on_tpu = jax.default_backend() != "cpu"
    # TUNE_REAL_FIDELITY_CPU=1: run the REAL 1M corpus on the CPU backend
    # at a fidelity-only batch — hybrid fidelity is backend-independent
    # (same XLA programs minus Pallas; per_tile_k=2 measured
    # fidelity-neutral, kernels.md), so the sweep's quality column can be
    # recorded without a TPU claim.  QPS is NOT measured in this mode and
    # BENCH_CONFIG.json is not written (on_tpu gate below).
    real_fid = (os.environ.get("TUNE_REAL_FIDELITY_CPU") == "1"
                and not on_tpu)
    n = 1_000_000 if (on_tpu or real_fid) else 10_000
    d = 768 if (on_tpu or real_fid) else 128
    batch = 512 if on_tpu else (64 if real_fid else 16)
    k, cand = 10, 100
    slots = 64 if (on_tpu or real_fid) else 16
    # sweep at the SERVING query distribution (bench.py BENCH_QTERMS
    # default 6 — the reference analyzer emits ~3-8 discriminative
    # terms); 16 uniform terms is the adversarial diagnostic case
    qterms_n = int(os.environ.get("BENCH_QTERMS", "6"))
    vocab = (1 << 17) if (on_tpu or real_fid) else (1 << 14)
    sample = 64 if (on_tpu or real_fid) else 16

    # identical corpus to bench.py: same loader, same disk cache — the
    # promoted config's numbers transfer to the headline 1:1.  The fp32
    # gold corpus stays on the HOST (the on-device 3 GB fp32 gold is
    # exactly what OOMed the r4 driver bench), and corpus generation
    # avoids the rng.zipf f64 rejection loop (~13 min at 1M x 64 x 2).
    from bench import _host_dense_gold, _load_or_build_corpus

    corpus, _ = _load_or_build_corpus(n, d, slots, vocab, qterms_n,
                                      512 if (on_tpu or real_fid) else 16)
    emb = corpus["emb"]
    terms = corpus["terms"]
    tfs = corpus["tfs"]
    doc_len = corpus["doc_len"]
    queries_np = corpus["queries"][:batch]
    q_terms = corpus["q_terms"][:batch]
    q_idf = corpus["q_idf"][:batch]

    dense_int8 = build_corpus(jnp.asarray(emb), dtype=jnp.int8,
                              error_signs=True)
    lexical = LexicalCorpus(
        terms=jnp.asarray(terms), tfs=jnp.asarray(tfs, jnp.bfloat16),
        doc_len=jnp.asarray(doc_len),
    )
    avgdl = jnp.float32(float(doc_len.mean()))
    inverted = build_inverted(terms, tfs, doc_len, vocab,
                              postings_per_term=max(256, n // 500),
                              avgdl=float(doc_len.mean()))
    queries = jnp.asarray(queries_np)
    q_terms_j = jnp.asarray(q_terms)
    q_idf_j = jnp.asarray(q_idf)
    tile = 8192 if (on_tpu or real_fid) else 512

    # truncation-free gold (sample queries): dense branch on the host
    ds_full = _host_dense_gold(emb, queries_np, sample, cand)
    part = np.argpartition(-ds_full, cand, axis=1)[:, :cand]
    order = np.argsort(-np.take_along_axis(ds_full, part, axis=1), axis=1)
    di = np.take_along_axis(part, order, axis=1).astype(np.int32)
    del ds_full
    lv, li = bm25_search(q_terms_j[:sample], q_idf_j[:sample], lexical,
                         avgdl, vocab_size=vocab, k=cand, block_size=8_192)
    li = jnp.where(jnp.isfinite(lv) & (lv > 0), li, -1)
    _, gold_i = rrf_fuse(jnp.asarray(di), li.astype(jnp.int32), k=k)
    gold = np.asarray(gold_i)
    gold_dense = di[:, :k]
    gold_bm25 = np.asarray(li)[:, :k]

    def overlap(got, ref):
        return float(np.mean([
            len({x for x in a.tolist() if x >= 0}
                & {x for x in b.tolist() if x >= 0})
            / max((np.unique(b[b >= 0])).size, 1)
            for a, b in zip(got, ref)
        ]))

    # branch-wise diagnosis at the headline caps (skipped in the
    # real-1M CPU fidelity mode: interpret-mode Pallas at 1M x 768 is
    # pathologically slow on one vCPU and the branch split is already
    # recorded by the simulator diagnostics)
    from super_rag_tpu.ops.pallas_topk import pallas_dense_topk
    if real_fid:
        pdi = None
    else:
        pdv, pdi = pallas_dense_topk(queries[:sample], dense_int8, k=cand,
                                     tile=tile, int8_queries=True,
                                     per_tile_k=8, interpret=not on_tpu)
    if pdi is not None:
        print(json.dumps({"branch": "dense_int8_cap8",
                          "top10_overlap_vs_f32": overlap(
                              np.asarray(pdi)[:, :k], gold_dense)}),
              flush=True)
    for ppq in (256, 1024):
        iv_, ii_ = inverted_bm25_search(q_terms_j[:sample], q_idf_j[:sample],
                                        inverted, k=cand,
                                        postings_per_query_term=ppq)
        print(json.dumps({"branch": f"bm25_inverted_cap{ppq}",
                          "top10_overlap_vs_exact": overlap(
                              np.asarray(ii_)[:, :k], gold_bm25)}),
              flush=True)

    def timed(run, sync, lo=8, hi=24):
        def total(depth):
            t0 = time.perf_counter()
            out = None
            for _ in range(depth):
                out = run()
            sync(out)
            return time.perf_counter() - t0
        total(2)
        tlo = min(total(lo) for _ in range(2))
        thi = min(total(hi) for _ in range(2))
        return (thi - tlo) / (hi - lo)

    # sweep: uniform caps, df-adaptive two-tier budgets (deep budget on
    # the lowest-idf terms only), approx_max_k generation — all with the
    # rescore stage on (the headline path)
    # Config list selected by the 1M NumPy fidelity simulator
    # (scripts/sim_fidelity_1m.py, SIM_FIDELITY_1M.json): uniform caps
    # cannot clear 0.95 at any QPS-relevant width; df-adaptive deep
    # budgets on the 2-4 lowest-idf terms + the sign-plane dense refine
    # (predicted +0.006, the pass/fail margin) can.  Each config is a
    # fresh multi-minute remote compile — keep the list tight.
    ptk = 2  # measured fidelity-neutral at k=100 and fastest (kernels.md)
    configs = [
        # (ppq, deep_terms, deep_postings, approx, refine, lex_gen, label)
        (768, 0, None, False, 0, 250, "uniform768 (r2 headline)"),
        (512, 3, 2000, False, 0, 300, "da512+3x2000"),
        (512, 3, 2000, False, 200, 300, "da512+3x2000+r200"),
        (512, 4, 2000, False, 200, 300, "da512+4x2000+r200"),
        (512, 3, 2000, True, 200, 300, "da512+3x2000+r200+approx"),
        (2000, 0, None, False, 300, 300, "full+r300"),
        (2000, 0, None, True, 300, 300, "full+r300+approx"),
    ]
    # partial-progress checkpoint (VERDICT r4 item 8): each completed
    # config persists immediately, and a restarted sweep skips rows it
    # already measured — a 20-minute claim window still yields rows, and
    # a wedge mid-sweep loses only the in-flight config.
    part_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"TUNE_FIDELITY_PARTIAL_{jax.default_backend()}.json")
    results = []
    done_labels: set[str] = set()
    if os.path.exists(part_path):
        try:
            with open(part_path) as f:
                prior = json.load(f)
            if (prior.get("qterms") == qterms_n
                    and prior.get("n") == n):
                results = [r for r in prior.get("results", [])
                           if r.get("config")]
                done_labels = {r["config"] for r in results}
                print(json.dumps({"resumed": sorted(done_labels)}),
                      flush=True)
        except (OSError, ValueError):
            pass

    def _save_partial():
        tmp = part_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"qterms": qterms_n, "n": n, "results": results}, f,
                      indent=1)
        os.replace(tmp, part_path)

    for ppq, dt, dp, approx, refine, lg, label in configs:
        if label in done_labels:
            continue
        def run():
            # mirrors bench.py's serving args exactly (rescore on,
            # lex_gen 250) so the promoted config's numbers transfer
            return hybrid_search(
                queries, q_terms_j, q_idf_j, dense_int8, lexical, avgdl,
                inverted=inverted, vocab_size=vocab, k=k, candidates=cand,
                use_pallas=on_tpu, dense_tile=tile,
                block_size=262_144 if on_tpu else 8_192,
                bm25_block_size=4_096,
                postings_per_query_term=ppq,
                int8_queries=on_tpu or real_fid,
                per_tile_k=ptk if on_tpu else None,
                rescore=True, lex_gen=lg,
                lex_deep_terms=dt, lex_deep_postings=dp,
                lex_approx_topk=approx,
                dense_refine=refine,
            )

        def sync(out):
            np.asarray(out.indices)

        res = run()
        sync(res)
        fid = overlap(np.asarray(res.indices)[:sample], gold)
        per_call = None if real_fid else timed(run, sync)
        row = {
            "config": label,
            "postings_per_query_term": ppq,
            "deep_terms": dt, "deep_postings": dp, "approx": approx,
            "dense_refine": refine, "lex_gen": lg,
            "hybrid_fidelity": round(fid, 4),
            "qps": None if per_call is None else round(batch / per_call, 1),
            "batch512_ms": (None if per_call is None
                            else round(per_call * 1e3, 2)),
        }
        results.append(row)
        _save_partial()
        print(json.dumps(row), flush=True)

    # promote the winner to the bench headline (bench.py reads
    # BENCH_CONFIG.json): best QPS among configs meeting the 0.95
    # fidelity bar, else the highest-fidelity config.  TPU only — CPU
    # sanity numbers must not set the chip's operating point.
    if real_fid and results:
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "FIDELITY_1M_CPU.json")
        with open(out_path, "w") as f:
            json.dump({
                "note": ("REAL 1M corpus, CPU backend, fidelity only "
                         "(qps requires the chip); same XLA programs as "
                         "the TPU sweep minus Pallas extraction "
                         "(per_tile_k=2 measured fidelity-neutral)"),
                "qterms": qterms_n,
                "results": results,
            }, f, indent=1)
        print(json.dumps({"wrote": out_path}), flush=True)
    if on_tpu and results:
        eligible = [r for r in results if r["hybrid_fidelity"] >= 0.95]
        best = (max(eligible, key=lambda r: r["qps"]) if eligible
                else max(results, key=lambda r: r["hybrid_fidelity"]))
        cfg_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_CONFIG.json",
        )
        with open(cfg_path, "w") as f:
            json.dump({
                "source": "scripts/tune_fidelity.py sweep",
                "postings_per_query_term": best["postings_per_query_term"],
                "lex_deep_terms": best["deep_terms"],
                "lex_deep_postings": best["deep_postings"],
                "lex_approx_topk": best["approx"],
                "dense_refine": best["dense_refine"],
                "lex_gen": best["lex_gen"],
                "qterms": qterms_n,
                # the sweep measures at this extraction cap — the bench
                # must serve at the same one or fidelity won't reproduce
                "per_tile_k": ptk,
                "swept_fidelity": best["hybrid_fidelity"],
                "swept_qps": best["qps"],
                "all_results": results,
            }, f, indent=1)
        print(json.dumps({"promoted": best["config"], "to": cfg_path}),
              flush=True)


if __name__ == "__main__":
    main()
