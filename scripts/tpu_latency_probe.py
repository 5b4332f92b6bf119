import time, numpy as np, jax, jax.numpy as jnp
from super_rag_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from super_rag_tpu.ops.dense import build_corpus
from super_rag_tpu.ops.bm25_inverted import build_inverted
from super_rag_tpu.ops.hybrid import hybrid_search
from super_rag_tpu.ops.bm25 import LexicalCorpus

rng = np.random.default_rng(0)
n, d, k, cand = 1_000_000, 768, 10, 100
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

def timeit(fn, lo=8, hi=24):
    def total(depth):
        t0=time.perf_counter(); out=None
        for _ in range(depth): out=fn()
        np.asarray(out.indices); return time.perf_counter()-t0
    total(2)
    tlo=min(total(lo) for _ in range(2)); thi=min(total(hi) for _ in range(2))
    return (thi-tlo)/(hi-lo)*1000

for B in (32, 512):
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    qt = jnp.asarray(rng.integers(0, vocab, (B, Q)).astype(np.int32))
    qi = jnp.ones((B, Q), jnp.float32) * 3.0
    t = timeit(lambda: hybrid_search(q, qt, qi, dense_int8, lexical, avgdl,
        inverted=inverted, vocab_size=vocab, k=k, candidates=cand,
        use_pallas=True, dense_tile=8192, postings_per_query_term=256,
        int8_queries=True, per_tile_k=8))
    print(f"hybrid B={B}: {t:.2f} ms/batch, {B/t*1000:.0f} QPS", flush=True)
