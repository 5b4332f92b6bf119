import time, numpy as np, jax, jax.numpy as jnp
from super_rag_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from super_rag_tpu.ops.dense import build_corpus
from super_rag_tpu.ops.pallas_topk import pallas_dense_topk
from super_rag_tpu.ops.bm25_inverted import build_inverted, inverted_bm25_search
from super_rag_tpu.ops.hybrid import hybrid_search, _rrf_on_device
from super_rag_tpu.ops.bm25 import LexicalCorpus

rng = np.random.default_rng(0)
n, d, batch, k, cand = 1_000_000, 768, 256, 10, 100
slots, Q, vocab = 64, 16, 1 << 17
emb = rng.standard_normal((n, d), dtype=np.float32)
dense_int8 = build_corpus(jnp.asarray(emb), dtype=jnp.int8)
zipf_raw = rng.zipf(1.3, size=(n, slots)).astype(np.int64)
terms = ((zipf_raw - 1) % vocab).astype(np.int32)
tfs = np.minimum(rng.zipf(2.0, size=(n, slots)), 8).astype(np.float32)
pad = rng.random((n, slots)) < 0.2
terms[pad] = vocab; tfs[pad] = 0
dl = tfs.sum(1) * 2 + 1
lexical = LexicalCorpus(jnp.asarray(terms), jnp.asarray(tfs, jnp.bfloat16), jnp.asarray(dl))
inverted = build_inverted(terms, tfs, dl, vocab, postings_per_term=2000, avgdl=float(dl.mean()))
avgdl = jnp.float32(dl.mean())
queries = jnp.asarray(rng.standard_normal((batch, d), dtype=np.float32))
qt = jnp.asarray(rng.integers(0, vocab, (batch, Q)).astype(np.int32))
qi = jnp.ones((batch, Q), jnp.float32) * 3.0

def timeit(fn, lo=8, hi=24):
    def total(depth):
        t0=time.perf_counter(); out=None
        for _ in range(depth): out=fn()
        np.asarray(jax.tree.leaves(out)[0]); return time.perf_counter()-t0
    total(2)
    tlo=min(total(lo) for _ in range(2)); thi=min(total(hi) for _ in range(2))
    return (thi-tlo)/(hi-lo)*1000

t = timeit(lambda: pallas_dense_topk(queries, dense_int8, k=cand, tile=8192, int8_queries=True))
print(f"dense int8xint8 B=256 k=100: {t:.2f} ms", flush=True)
t = timeit(lambda: pallas_dense_topk(queries, dense_int8, k=cand, tile=8192))
print(f"dense bf16-query  B=256 k=100: {t:.2f} ms", flush=True)
for pq in (256, 512):
    t = timeit(lambda: inverted_bm25_search(qt, qi, inverted, k=cand, postings_per_query_term=pq))
    print(f"inverted bm25 P_q={pq}: {t:.2f} ms", flush=True)
t = timeit(lambda: hybrid_search(queries, qt, qi, dense_int8, lexical, avgdl,
    inverted=inverted, vocab_size=vocab, k=k, candidates=cand,
    use_pallas=True, dense_tile=8192, postings_per_query_term=512, int8_queries=True))
print(f"full hybrid: {t:.2f} ms", flush=True)
