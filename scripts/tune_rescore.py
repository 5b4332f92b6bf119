"""TPU sweep: hybrid QPS + fidelity across (rescore, lex_gen, P_q).

Finds the operating point for VERDICT r2 item 2 (fidelity >= 0.9 at
>= 20k QPS/chip).  Same corpus/gold construction as bench.py.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:  # `python scripts/...` puts scripts/ first
    sys.path.insert(0, ROOT)


def main():
    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.ops.bm25 import LexicalCorpus, bm25_search
    from super_rag_tpu.ops.bm25_inverted import build_inverted
    from super_rag_tpu.ops.dense import build_corpus, dense_search
    from super_rag_tpu.ops.fusion import rrf_fuse
    from super_rag_tpu.ops.hybrid import hybrid_search
    from bench import timed

    on_tpu = jax.default_backend() not in ("cpu",)
    n = 1_000_000 if on_tpu else 20_000
    d = 768 if on_tpu else 64
    batch = 512 if on_tpu else 32
    k, cand = 10, 100
    slots = 64 if on_tpu else 16
    qterms_n = 16
    vocab = (1 << 17) if on_tpu else (1 << 14)

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((n, d), dtype=np.float32)
    dense_int8 = build_corpus(jnp.asarray(emb), dtype=jnp.int8)
    dense_f32 = build_corpus(jnp.asarray(emb), dtype=jnp.float32)
    zipf_raw = rng.zipf(1.3, size=(n, slots)).astype(np.int64)
    terms = ((zipf_raw - 1) % vocab).astype(np.int32)
    tfs = np.minimum(rng.zipf(2.0, size=(n, slots)), 8).astype(np.float32)
    pad_mask = rng.random((n, slots)) < 0.2
    terms[pad_mask] = vocab
    tfs[pad_mask] = 0.0
    doc_len = tfs.sum(1) * 2.0 + 1.0
    lexical = LexicalCorpus(terms=jnp.asarray(terms),
                            tfs=jnp.asarray(tfs, jnp.bfloat16),
                            doc_len=jnp.asarray(doc_len))
    avgdl = jnp.float32(float(doc_len.mean()))
    inverted = build_inverted(terms, tfs, doc_len, vocab,
                              postings_per_term=max(256, n // 500),
                              avgdl=float(doc_len.mean()))
    sorted_terms = np.sort(terms, axis=1)
    first = np.ones_like(sorted_terms, bool)
    first[:, 1:] = sorted_terms[:, 1:] != sorted_terms[:, :-1]
    uniq_flat = sorted_terms[first]
    df = np.bincount(uniq_flat[uniq_flat < vocab], minlength=vocab + 1)
    idf_table = np.log(1.0 + (n - df + 0.5) / (df + 0.5)).astype(np.float32)
    queries = jnp.asarray(rng.standard_normal((batch, d), dtype=np.float32))
    q_rows = rng.integers(0, n, batch)
    q_terms = np.full((batch, qterms_n), vocab, np.int32)
    df_cap = max(64, n // 50)
    for bi, row in enumerate(q_rows):
        uniq = [t for t in dict.fromkeys(terms[row].tolist())
                if t != vocab and df[t] <= df_cap][:qterms_n]
        q_terms[bi, : len(uniq)] = uniq
    q_idf = np.where(q_terms != vocab, idf_table[np.minimum(q_terms, vocab)],
                     0.0).astype(np.float32)
    q_terms_j, q_idf_j = jnp.asarray(q_terms), jnp.asarray(q_idf)

    sample = 32
    dv, di = dense_search(queries[:sample], dense_f32, k=cand,
                          block_size=262_144 if on_tpu else 8_192)
    lv, li = bm25_search(q_terms_j[:sample], q_idf_j[:sample], lexical,
                         avgdl, vocab_size=vocab, k=cand, block_size=8_192)
    di = jnp.where(jnp.isfinite(dv), di, -1)
    li = jnp.where(jnp.isfinite(lv) & (lv > 0), li, -1)
    _, gold_i = rrf_fuse(di.astype(jnp.int32), li.astype(jnp.int32), k=k)
    gold = np.asarray(gold_i)

    tile = 8192 if on_tpu else 512

    def make_run(rescore, lex_gen, pq, use_int8=True, dg=None, ptk=8):
        def run():
            return hybrid_search(
                queries, q_terms_j, q_idf_j,
                dense_int8 if use_int8 else dense_f32, lexical, avgdl,
                inverted=inverted, vocab_size=vocab, k=k, candidates=cand,
                use_pallas=on_tpu, dense_tile=tile,
                block_size=262_144 if on_tpu else 8_192,
                postings_per_query_term=pq,
                int8_queries=on_tpu and use_int8,
                per_tile_k=ptk if on_tpu else None,
                rescore=rescore, lex_gen=lex_gen, dense_gen=dg,
            )
        return run

    def sync(out):
        np.asarray(out.indices)

    # -- decomposition: which branch caps fidelity? -----------------------
    # (a) our int8 dense branch fused with the EXACT lexical gold: if this
    #     is ~the shipped fidelity, dense int8 rank noise is the cap.
    # (b) exact dense gold fused with our rescored lexical branch: the
    #     lexical-side loss.
    from super_rag_tpu.ops.pallas_topk import pallas_dense_topk

    def fid_of(ids):
        return float(np.mean([
            len({x for x in a.tolist() if x >= 0}
                & {x for x in b.tolist() if x >= 0})
            / max(np.unique(b[b >= 0]).size, 1)
            for a, b in zip(np.asarray(ids), gold)
        ]))

    if on_tpu:
        odv, odi = pallas_dense_topk(queries[:sample], dense_int8, k=cand,
                                     tile=tile, int8_queries=True,
                                     per_tile_k=8)
    else:
        odv, odi = dense_search(queries[:sample], dense_int8, k=cand)
    odi = jnp.where(jnp.isfinite(odv), odi, -1)
    _, fuse_a = rrf_fuse(odi.astype(jnp.int32), li.astype(jnp.int32), k=k)
    print(json.dumps({"config": "ourdense_x_goldlex",
                      "fidelity": round(fid_of(fuse_a), 4)}), flush=True)
    # f32-query variant isolates query-side quantization
    if on_tpu:
        fdv, fdi = pallas_dense_topk(queries[:sample], dense_int8, k=cand,
                                     tile=tile, int8_queries=False,
                                     per_tile_k=8)
        fdi = jnp.where(jnp.isfinite(fdv), fdi, -1)
        _, fuse_f = rrf_fuse(fdi.astype(jnp.int32), li.astype(jnp.int32), k=k)
        print(json.dumps({"config": "ourdense_f32q_x_goldlex",
                          "fidelity": round(fid_of(fuse_f), 4)}), flush=True)

    # generation-recall probe: how much of the exact BM25 top-100 does
    # truncated inverted generation surface at each query-time cap?
    # (r2 sweep 1 showed the lexical branch caps fidelity: ourdense x
    # goldlex = 0.975 while the full program sat at 0.83-0.88)
    from super_rag_tpu.ops.bm25_inverted import inverted_bm25_search

    gold_lex = np.asarray(li)
    for pq in (256, 1024, None):  # None = full stored depth
        gv_, gi_ = inverted_bm25_search(
            q_terms_j[:sample], q_idf_j[:sample], inverted, k=200,
            postings_per_query_term=pq,
        )
        gi_ = np.asarray(jnp.where(jnp.isfinite(gv_) & (gv_ > 0), gi_, -1))
        cov = float(np.mean([
            len({x for x in a.tolist() if x >= 0}
                & {x for x in g.tolist() if x >= 0})
            / max(len({x for x in g.tolist() if x >= 0}), 1)
            for a, g in zip(gi_, gold_lex)
        ]))
        print(json.dumps({"config": f"genrecall_pq{pq}",
                          "coverage_of_exact_top100": round(cov, 4)}),
              flush=True)

    configs = [
        ("scan_lg200_pq256", True, 200, 256, True, None, 8),
        ("scan_lg200_pq1024", True, 200, 1024, True, None, 8),
        ("scan_lg200_pqfull", True, 200, None, True, None, 8),
        ("scan_lg300_pqfull", True, 300, None, True, None, 8),
    ]
    for name, rs, lg, pq, i8, dg, ptk in configs:
        run = make_run(rs, lg, pq, i8, dg, ptk)
        res = run()
        sync(res)
        got = np.asarray(res.indices)[:sample]
        fid = float(np.mean([
            len({x for x in a.tolist() if x >= 0}
                & {x for x in b.tolist() if x >= 0})
            / max(np.unique(b[b >= 0]).size, 1)
            for a, b in zip(got, gold)
        ]))
        per_call = timed(run, sync)
        print(json.dumps({
            "config": name, "fidelity": round(fid, 4),
            "qps": round(batch / per_call, 1),
            "batch_ms": round(per_call * 1000, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
