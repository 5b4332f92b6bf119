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

for (name, corpus) in (("bf16", corpus_bf16), ("int8", corpus_int8)):
    for batch in (128, 256):
        q = jnp.asarray(rng.standard_normal((batch,d)).astype(np.float32))
        for tile in (2048, 4096, 8192):
            try:
                t = timeit(lambda: pallas_dense_topk(q, corpus, k=k, tile=tile))
                print(f"{name} B={batch} tile={tile}: {t*1000:.2f} ms, {batch/t:.0f} QPS", flush=True)
            except Exception as e:
                print(f"{name} B={batch} tile={tile}: FAIL {type(e).__name__} {str(e)[:90]}", flush=True)
# int8 large batch
q = jnp.asarray(rng.standard_normal((512,d)).astype(np.float32))
for tile in (2048, 4096):
    try:
        t = timeit(lambda: pallas_dense_topk(q, corpus_int8, k=k, tile=tile))
        print(f"int8 B=512 tile={tile}: {t*1000:.2f} ms, {512/t:.0f} QPS", flush=True)
    except Exception as e:
        print(f"int8 B=512 tile={tile}: FAIL {str(e)[:90]}", flush=True)
