"""Decompose the batch-32 hybrid program latency at 1M (p50 gate work).

BENCH_P50_1M.json records 11.03 ms for the batch-32 fused program where
the <5 ms north-star gate needs ~half that.  This script times ablation
rungs of the SAME program (bench.py device state, promoted operating
point) at nq=32 so the gap decomposes into stage costs:

  full        tuned config (rescore + deep terms + refine)
  norescore   rescore=False (exact-BM25 rescoring stage off)
  nodeep      + lex_deep_terms=0 (deep postings gather off)
  lexmin      + postings_per_query_term=64 (minimal lexical tier)
  dense_only  pallas dense top-k alone (no lexical, no fusion)
  bm25_only   inverted BM25 alone

Run as THE designated TPU process; CPU sanity: JAX_PLATFORMS=cpu.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from bench import _load_or_build_corpus, timed
    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.bm25_inverted import (build_inverted,
                                                 inverted_bm25_search)
    from super_rag_tpu.ops.dense import build_corpus
    from super_rag_tpu.ops.hybrid import hybrid_search
    from super_rag_tpu.ops.pallas_topk import pallas_dense_topk

    on_tpu = jax.default_backend() != "cpu"
    n = 1_000_000 if on_tpu else 10_000
    d = 768 if on_tpu else 128
    slots = 64 if on_tpu else 16
    vocab = (1 << 17) if on_tpu else (1 << 14)
    k, cand = 10, 100
    nq = 32

    corpus, _ = _load_or_build_corpus(n, d, slots, vocab, 6, 512)
    tuned: dict = {}
    cfg_path = os.path.join(ROOT, "BENCH_CONFIG.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            tuned = json.load(f)
    pq = int(tuned.get("postings_per_query_term", 768))
    lex_gen = int(tuned.get("lex_gen", 250))
    ptk = int(tuned.get("per_tile_k", 2))
    deep_terms = int(tuned.get("lex_deep_terms", 0))
    deep_postings = tuned.get("lex_deep_postings")
    approx_topk = bool(tuned.get("lex_approx_topk", False))
    refine = int(tuned.get("dense_refine", 0))

    dense_int8 = build_corpus(jnp.asarray(corpus["emb"]), dtype=jnp.int8,
                              error_signs=refine > 0)
    lexical = LexicalCorpus(
        terms=jnp.asarray(corpus["terms"]),
        tfs=jnp.asarray(corpus["tfs"], jnp.bfloat16),
        doc_len=jnp.asarray(corpus["doc_len"]),
    )
    avgdl = jnp.float32(float(corpus["doc_len"].mean()))
    inverted = build_inverted(
        corpus["terms"], corpus["tfs"], corpus["doc_len"], vocab,
        postings_per_term=max(256, n // 500),
        avgdl=float(corpus["doc_len"].mean()))
    qs = jnp.asarray(corpus["queries"][:nq])
    ts = jnp.asarray(corpus["q_terms"][:nq])
    idfs = jnp.asarray(corpus["q_idf"][:nq])
    tile = 8192 if on_tpu else 512
    block = 262_144 if on_tpu else 8_192

    def mk(rescore, dt, dp, pq_, refine_):
        def run():
            return hybrid_search(
                qs, ts, idfs, dense_int8, lexical, avgdl,
                inverted=inverted, vocab_size=vocab, k=k, candidates=cand,
                use_pallas=on_tpu, dense_tile=tile, block_size=block,
                bm25_block_size=4_096, postings_per_query_term=pq_,
                int8_queries=on_tpu, per_tile_k=ptk if on_tpu else None,
                rescore=rescore, lex_gen=lex_gen if rescore else None,
                lex_deep_terms=dt, lex_deep_postings=dp,
                lex_approx_topk=approx_topk, dense_refine=refine_,
            )
        return run

    def sync_h(out):
        np.asarray(out.indices)

    rungs = {
        "full": mk(True, deep_terms, deep_postings, pq, refine),
        "norescore": mk(False, deep_terms, deep_postings, pq, refine),
        "nodeep": mk(False, 0, None, pq, refine),
        "lexmin": mk(False, 0, None, 64, refine),
    }

    out = {"nq": nq, "n": n, "tuned": tuned.get("postings_per_query_term")
           is not None}
    for name, run in rungs.items():
        sync_h(run())  # compile
        ms = timed(run, sync_h) * 1e3
        out[name + "_ms"] = round(ms, 3)
        print(f"[profile] {name}: {ms:.3f} ms", flush=True)

    # dense branch alone (the pallas flat tier the serving default uses)
    def run_dense():
        return pallas_dense_topk(qs, dense_int8, k=cand, tile=tile,
                                 per_tile_k=ptk if on_tpu else None,
                                 int8_queries=on_tpu)

    try:
        v, i = run_dense()
        np.asarray(i)
        ms = timed(run_dense, lambda o: np.asarray(o[1])) * 1e3
        out["dense_only_ms"] = round(ms, 3)
        print(f"[profile] dense_only: {ms:.3f} ms", flush=True)
    except Exception as e:  # signature drift — record, keep going
        out["dense_only_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(f"[profile] dense_only failed: {e}", flush=True)

    def run_bm25():
        return inverted_bm25_search(ts, idfs, inverted, k=cand,
                                    postings_per_query_term=pq)

    try:
        r = run_bm25()
        np.asarray(r[1])
        ms = timed(run_bm25, lambda o: np.asarray(o[1])) * 1e3
        out["bm25_only_ms"] = round(ms, 3)
        print(f"[profile] bm25_only: {ms:.3f} ms", flush=True)
    except Exception as e:
        out["bm25_only_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(f"[profile] bm25_only failed: {e}", flush=True)

    print(json.dumps(out), flush=True)
    if on_tpu:
        with open(os.path.join(ROOT, "PROFILE_B32.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
