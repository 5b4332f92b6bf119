import time, numpy as np, jax, jax.numpy as jnp
from super_rag_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from super_rag_tpu.ops.dense import build_corpus
from super_rag_tpu.ops.pallas_topk import pallas_dense_topk

rng = np.random.default_rng(0)
n, d, k = 1_000_000, 768, 10
cnp = rng.standard_normal((n,d)).astype(np.float32)
corpus_bf16 = build_corpus(jnp.asarray(cnp), dtype=jnp.bfloat16)
corpus_int8 = build_corpus(jnp.asarray(cnp), dtype=jnp.int8)

def timeit(fn, reps_lo=8, reps_hi=24):
    def total(depth):
        t0=time.perf_counter()
        out=None
        for _ in range(depth): out=fn()
        np.asarray(out[0]); return time.perf_counter()-t0
    total(2)
    tlo=min(total(reps_lo) for _ in range(2)); thi=min(total(reps_hi) for _ in range(2))
    return (thi-tlo)/(reps_hi-reps_lo)

for batch in (128, 256, 512):
    q = jnp.asarray(rng.standard_normal((batch,d)).astype(np.float32))
    try:
        t = timeit(lambda: pallas_dense_topk(q, corpus_bf16, k=k, tile=2048))
        print(f"bf16 B={batch}: {t*1000:.2f} ms/batch, {batch/t:.0f} QPS")
    except Exception as e:
        print(f"bf16 B={batch}: FAIL {type(e).__name__} {str(e)[:120]}")
for batch in (128, 256):
    q = jnp.asarray(rng.standard_normal((batch,d)).astype(np.float32))
    try:
        t = timeit(lambda: pallas_dense_topk(q, corpus_int8, k=k, tile=2048))
        print(f"int8 B={batch}: {t*1000:.2f} ms/batch, {batch/t:.0f} QPS")
    except Exception as e:
        print(f"int8 B={batch}: FAIL {type(e).__name__} {str(e)[:120]}")
# extraction-cost probe: k=1
q = jnp.asarray(rng.standard_normal((128,d)).astype(np.float32))
t = timeit(lambda: pallas_dense_topk(q, corpus_bf16, k=1, tile=2048))
print(f"bf16 B=128 k=1 (floor): {t*1000:.2f} ms/batch")
