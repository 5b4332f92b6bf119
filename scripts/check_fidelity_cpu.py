"""Quick CPU check: hybrid fidelity vs exact-hybrid gold, rescoring on/off.

Mirrors bench.py's synthetic corpus + gold at CPU scale, but with the
TRUNCATED postings configuration that binds fidelity at 1M (build cap
n//500, query cap 256) scaled down proportionally so truncation bites.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=1"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from super_rag_tpu.ops.bm25 import LexicalCorpus, bm25_search
from super_rag_tpu.ops.bm25_inverted import build_inverted
from super_rag_tpu.ops.dense import build_corpus, dense_search
from super_rag_tpu.ops.fusion import rrf_fuse
from super_rag_tpu.ops.hybrid import hybrid_search

n, d, batch, k, cand = 50_000, 64, 64, 10, 100
slots, qterms_n, vocab = 32, 16, 1 << 14

rng = np.random.default_rng(0)
emb = rng.standard_normal((n, d), dtype=np.float32)
dense_i8 = build_corpus(jnp.asarray(emb), dtype=jnp.int8)
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
# proportional to the 1M config: build cap n//500, query cap 256
inverted = build_inverted(terms, tfs, doc_len, vocab,
                          postings_per_term=max(64, n // 500),
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

# exact gold
dv, di = dense_search(queries, dense_f32, k=cand, block_size=8192)
lv, li = bm25_search(q_terms_j, q_idf_j, lexical, avgdl,
                     vocab_size=vocab, k=cand, block_size=8192)
di = jnp.where(jnp.isfinite(dv), di, -1)
li = jnp.where(jnp.isfinite(lv) & (lv > 0), li, -1)
_, gold_i = rrf_fuse(di.astype(jnp.int32), li.astype(jnp.int32), k=k)
gold = np.asarray(gold_i)


def fidelity(res):
    got = np.asarray(res.indices)
    return float(np.mean([
        len({x for x in a.tolist() if x >= 0}
            & {x for x in b.tolist() if x >= 0})
        / max(np.unique(b[b >= 0]).size, 1)
        for a, b in zip(got, gold)
    ]))


for pq in (64, 128, 256):
    for rescore, lg in ((False, cand), (True, 2 * cand), (True, 4 * cand)):
        res = hybrid_search(
            queries, q_terms_j, q_idf_j, dense_i8, lexical, avgdl,
            inverted=inverted, vocab_size=vocab, k=k, candidates=cand,
            use_pallas=False, block_size=8192,
            postings_per_query_term=pq, rescore=rescore, lex_gen=lg,
        )
        print(f"P_q={pq:4d} rescore={rescore!s:5} lex_gen={lg:4d} "
              f"fidelity={fidelity(res):.4f}")
