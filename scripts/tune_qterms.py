"""TPU sweep: hybrid fidelity x QPS as a function of query term count.

The bench's synthetic queries carry 16 discriminative terms — far past
the reference workload (the analyzer yields ~3-8 terms for natural
questions after stopword stripping), and each extra term is another
truncated posting list a multi-term doc can fall out of.  This sweep
measures the (fidelity, QPS) frontier at realistic (6) and adversarial
(16) query widths across rescore configs, to pick bench.py's headline
operating point on evidence.

    python scripts/tune_qterms.py
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


def main():
    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from bench import timed
    from super_rag_tpu.ops.bm25 import LexicalCorpus, bm25_search
    from super_rag_tpu.ops.bm25_inverted import build_inverted
    from super_rag_tpu.ops.dense import build_corpus, dense_search
    from super_rag_tpu.ops.fusion import rrf_fuse
    from super_rag_tpu.ops.hybrid import hybrid_search

    on_tpu = jax.default_backend() not in ("cpu",)
    n = 1_000_000 if on_tpu else 20_000
    d = 768 if on_tpu else 64
    batch = 512 if on_tpu else 32
    k, cand = 10, 100
    slots = 64 if on_tpu else 16
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
    df_cap = max(64, n // 50)
    tile = 8192 if on_tpu else 512

    def build_queries(qn: int):
        q_terms = np.full((batch, qn), vocab, np.int32)
        for bi, row in enumerate(q_rows):
            uniq = [t for t in dict.fromkeys(terms[row].tolist())
                    if t != vocab and df[t] <= df_cap][:qn]
            q_terms[bi, : len(uniq)] = uniq
        q_idf = np.where(q_terms != vocab,
                         idf_table[np.minimum(q_terms, vocab)],
                         0.0).astype(np.float32)
        return jnp.asarray(q_terms), jnp.asarray(q_idf)

    sample = 32

    def sync(out):
        np.asarray(out.indices)

    qn_list = tuple(int(x) for x in
                    os.environ.get("QT_QNS", "6,16").split(","))
    cfg_filter = os.environ.get("QT_CONFIGS", "")
    for qn in qn_list:
        qt, qi = build_queries(qn)
        dv, di = dense_search(queries[:sample], dense_f32, k=cand,
                              block_size=262_144 if on_tpu else 8_192)
        lv, li = bm25_search(qt[:sample], qi[:sample], lexical, avgdl,
                             vocab_size=vocab, k=cand, block_size=8_192)
        di = jnp.where(jnp.isfinite(dv), di, -1)
        li = jnp.where(jnp.isfinite(lv) & (lv > 0), li, -1)
        _, gold_i = rrf_fuse(di.astype(jnp.int32), li.astype(jnp.int32), k=k)
        gold = np.asarray(gold_i)

        def fid_of(ids):
            return float(np.mean([
                len({x for x in a.tolist() if x >= 0}
                    & {x for x in b.tolist() if x >= 0})
                / max(np.unique(b[b >= 0]).size, 1)
                for a, b in zip(np.asarray(ids)[:sample], gold)
            ]))

        configs = [
            # name, rescore, lex_gen, P_q, per_tile_k
            ("norescore_pq256", False, None, 256, 8),
            ("rescore_lg200_pq256", True, 200, 256, 8),
            ("rescore_lg200_pq512", True, 200, 512, 8),
            ("rescore_lg300_pq1024", True, 300, 1024, 8),
            ("rescore_lg300_pqfull", True, 300, None, 8),
            ("rescore_lg400_pqfull", True, 400, None, 8),
            # per_tile_k=4 dense: extraction epilogue halves (stage probe:
            # 12.6 -> 7.7 ms at k=100); recall checked via dense_recall
            ("ptk4_rescore_lg200_pq512", True, 200, 512, 4),
            ("ptk4_rescore_lg300_pq1024", True, 300, 1024, 4),
            ("ptk4_rescore_lg300_pqfull", True, 300, None, 4),
            ("ptk2_rescore_lg300_pq1024", True, 300, 1024, 2),
            ("ptk4_rescore_lg250_pq768", True, 250, 768, 4),
            ("ptk2_rescore_lg250_pq768", True, 250, 768, 2),
        ]
        if cfg_filter:
            keep = set(cfg_filter.split(","))
            configs = [c for c in configs if c[0] in keep]
        for name, rs, lg, pq, ptk in configs:
            def run(rs=rs, lg=lg, pq=pq, ptk=ptk, qt=qt, qi=qi):
                return hybrid_search(
                    queries, qt, qi, dense_int8, lexical, avgdl,
                    inverted=inverted, vocab_size=vocab, k=k,
                    candidates=cand, use_pallas=on_tpu, dense_tile=tile,
                    block_size=262_144 if on_tpu else 8_192,
                    postings_per_query_term=pq,
                    int8_queries=on_tpu,
                    per_tile_k=ptk if on_tpu else None,
                    rescore=rs, lex_gen=lg,
                )

            res = run()
            sync(res)
            fid = fid_of(res.indices)
            per_call = timed(run, sync)
            print(json.dumps({
                "qterms": qn, "config": name,
                "fidelity": round(fid, 4),
                "qps": round(batch / per_call, 1),
                "batch_ms": round(per_call * 1e3, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
