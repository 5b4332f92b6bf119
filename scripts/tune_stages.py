"""TPU stage breakdown of the hybrid program at the fidelity frontier.

Times each stage standalone at qn=6, batch 512, 1M x 768:
  dense    — Pallas flat int8 top-100
  gen(pq)  — inverted BM25 generation at several postings widths
  gen_axk  — same but approx_max_k for the generation top-k
  rescore  — exact-BM25 pool rescore (P=304)

    python scripts/tune_stages.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main():
    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    import functools

    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from bench import timed
    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.bm25_inverted import (
        _segment_sum_runs,
        build_inverted,
        inverted_bm25_search,
    )
    from super_rag_tpu.ops.dense import build_corpus
    from super_rag_tpu.ops.hybrid import _exact_bm25_rescore
    from super_rag_tpu.ops.pallas_topk import pallas_dense_topk

    on_tpu = jax.default_backend() not in ("cpu",)
    n = 1_000_000 if on_tpu else 20_000
    d = 768 if on_tpu else 64
    batch = 512 if on_tpu else 32
    slots = 64 if on_tpu else 16
    vocab = (1 << 17) if on_tpu else (1 << 14)
    qn = 6

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((n, d), dtype=np.float32)
    dense_int8 = build_corpus(jnp.asarray(emb), dtype=jnp.int8)
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
    q_terms = np.full((batch, qn), vocab, np.int32)
    for bi, row in enumerate(q_rows):
        uniq = [t for t in dict.fromkeys(terms[row].tolist())
                if t != vocab and df[t] <= df_cap][:qn]
        q_terms[bi, : len(uniq)] = uniq
    q_idf = np.where(q_terms != vocab, idf_table[np.minimum(q_terms, vocab)],
                     0.0).astype(np.float32)
    qt, qi = jnp.asarray(q_terms), jnp.asarray(q_idf)

    def sync(x):
        if isinstance(x, tuple):
            np.asarray(x[0])
        else:
            np.asarray(x)

    tile = 8192 if on_tpu else 512

    def t(name, fn, *args, **kw):
        f = jax.jit(functools.partial(fn, **kw)) if kw else fn
        out = f(*args)
        sync(out)
        ms = timed(lambda: f(*args), sync) * 1e3
        print(json.dumps({"stage": name, "batch_ms": round(ms, 2)}),
              flush=True)

    # dense branch alone (Pallas needs real hardware; skip on CPU sanity)
    if on_tpu:
        for ptk in (8, 4, 16):
            t(f"dense_pallas_k100_ptk{ptk}",
              lambda q, ptk=ptk: pallas_dense_topk(
                  q, dense_int8, k=100, tile=tile, int8_queries=True,
                  per_tile_k=ptk),
              queries)
        for tl in (16384,):
            t(f"dense_pallas_k100_tile{tl}",
              lambda q, tl=tl: pallas_dense_topk(
                  q, dense_int8, k=100, tile=tl, int8_queries=True,
                  per_tile_k=8),
              queries)

    # inverted generation at widths
    for pq in (256, 512, 1024, None):
        t(f"lexgen_pq{pq}_k300",
          lambda qt_, qi_, pq=pq: inverted_bm25_search(
              qt_, qi_, inverted, k=300, postings_per_query_term=pq),
          qt, qi)

    # generation with approx top-k over the segment totals
    @jax.jit
    def gen_axk(post_ids, post_imp, qt_, qi_):
        p = post_ids.shape[1]
        ids = jnp.take(post_ids, qt_, axis=0)
        imp = jnp.take(post_imp, qt_, axis=0).astype(jnp.float32)
        w = imp * qi_[..., None]
        ids2 = ids.reshape(batch, qn * p)
        w2 = w.reshape(batch, qn * p)
        sorted_ids, totals = _segment_sum_runs(ids2, w2)
        v, pos = jax.lax.approx_max_k(totals, 300)
        i = jnp.take_along_axis(sorted_ids, pos, axis=-1)
        return v, i

    t("lexgen_pqfull_axk300", gen_axk, inverted.postings_ids,
      inverted.postings_impact, qt, qi)

    # rescore stage alone (pool 304)
    pool = jnp.asarray(rng.integers(0, n, (batch, 304)).astype(np.int32))
    qt16 = jnp.pad(qt, ((0, 0), (0, 10)), constant_values=vocab)
    qi16 = jnp.pad(qi, ((0, 0), (0, 10)))
    t("rescore_p304",
      lambda p_, a, b: _exact_bm25_rescore(p_, a, b, lexical, avgdl, 1.2,
                                           0.75),
      pool, qt16, qi16)


if __name__ == "__main__":
    main()
