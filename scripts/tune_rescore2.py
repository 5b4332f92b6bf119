"""Micro-bench of _exact_bm25_rescore implementations on TPU.

The rescoring stage costs ~10 ms at B=512 (bench r2: 19.5 -> 29.9 ms
batch latency).  This times the stage standalone and layout variants:

  v0  shipped: scan over Q query terms, [B,P,L] compare+select+sum
  v1  scan over L slots, [B,P,Q] one-hot einsum accumulation
  v2  v0 with bf16 sat (half the re-read traffic)

All variants must agree with v0's scores before timing counts.
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


def main() -> None:
    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    import functools

    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.ops.bm25 import LexicalCorpus
    from super_rag_tpu.ops.hybrid import _exact_bm25_rescore

    on_tpu = jax.default_backend() != "cpu"
    n = 1_000_000 if on_tpu else 20_000
    b_, p_, l_, q_ = (512, 304, 64, 16) if on_tpu else (32, 48, 16, 8)
    vocab = 1 << 17 if on_tpu else 1 << 14
    K1, B = 1.2, 0.75

    rng = np.random.default_rng(0)
    terms = rng.integers(0, vocab, (n, l_)).astype(np.int32)
    tfs = rng.integers(1, 8, (n, l_)).astype(np.float32)
    doc_len = tfs.sum(1) * 2 + 1
    lexical = LexicalCorpus(terms=jnp.asarray(terms),
                            tfs=jnp.asarray(tfs, jnp.bfloat16),
                            doc_len=jnp.asarray(doc_len))
    avgdl = jnp.float32(float(doc_len.mean()))

    pool = jnp.asarray(rng.integers(0, n, (b_, p_)).astype(np.int32))
    qt_np = np.full((b_, q_), vocab, np.int32)
    for i in range(b_):
        row = terms[rng.integers(0, n)]
        uniq = list(dict.fromkeys(row.tolist()))[:q_]
        qt_np[i, : len(uniq)] = uniq
    qt = jnp.asarray(qt_np)
    qi = jnp.asarray(rng.random((b_, q_)).astype(np.float32) * 3)

    v0 = jax.jit(functools.partial(_exact_bm25_rescore, k1=K1, b=B))

    @jax.jit
    def v1(pool_ids, query_terms, query_idf, lex, ad):
        safe = jnp.maximum(pool_ids, 0)
        t = jnp.take(lex.terms, safe, axis=0)  # [B,P,L]
        f = jnp.take(lex.tfs, safe, axis=0).astype(jnp.float32)
        dl = jnp.take(lex.doc_len, safe, axis=0).astype(jnp.float32)
        norm = K1 * (1.0 - B + B * dl / jnp.maximum(ad, 1e-6))  # [B,P]

        def step(acc, inp):
            t_l, f_l = inp  # [B,P]
            sat = f_l * (K1 + 1.0) / (f_l + norm)
            hit = t_l[:, :, None] == query_terms[:, None, :]  # [B,P,Q]
            w = jnp.einsum("bpq,bq->bp", hit.astype(jnp.float32), query_idf)
            return acc + w * sat, None

        acc, _ = jax.lax.scan(
            step, jnp.zeros(pool_ids.shape, jnp.float32),
            (jnp.moveaxis(t, 2, 0), jnp.moveaxis(f, 2, 0)),
        )
        return jnp.where(pool_ids >= 0, acc, -jnp.inf)

    @jax.jit
    def v2(pool_ids, query_terms, query_idf, lex, ad):
        safe = jnp.maximum(pool_ids, 0)
        t = jnp.take(lex.terms, safe, axis=0)
        f = jnp.take(lex.tfs, safe, axis=0).astype(jnp.float32)
        dl = jnp.take(lex.doc_len, safe, axis=0).astype(jnp.float32)
        norm = K1 * (1.0 - B + B * dl[:, :, None] / jnp.maximum(ad, 1e-6))
        sat = (f * (K1 + 1.0) / (f + norm)).astype(jnp.bfloat16)

        def step(acc, inp):
            qt_, qi_ = inp
            hit = t == qt_[:, None, None]
            acc = acc + qi_[:, None] * jnp.sum(
                jnp.where(hit, sat, jnp.bfloat16(0)), axis=-1
            ).astype(jnp.float32)
            return acc, None

        acc, _ = jax.lax.scan(
            step, jnp.zeros(pool_ids.shape, jnp.float32),
            (query_terms.T, query_idf.T),
        )
        return jnp.where(pool_ids >= 0, acc, -jnp.inf)

    def sync(x):
        np.asarray(x)

    ref = np.asarray(v0(pool, qt, qi, lexical, avgdl))

    def timed(fn, lo=8, hi=24):
        def total(depth):
            t0 = time.perf_counter()
            o = None
            for _ in range(depth):
                o = fn(pool, qt, qi, lexical, avgdl)
            sync(o)
            return time.perf_counter() - t0

        total(2)
        tlo = min(total(lo) for _ in range(2))
        thi = min(total(hi) for _ in range(2))
        return (thi - tlo) / (hi - lo)

    for name, fn in (("v0_scanQ_f32", v0), ("v1_scanL_einsum", v1),
                     ("v2_scanQ_bf16sat", v2)):
        got = np.asarray(fn(pool, qt, qi, lexical, avgdl))
        finite = np.isfinite(ref)
        err = float(np.max(np.abs(got[finite] - ref[finite])))
        ms = timed(fn) * 1e3
        print(json.dumps({"variant": name, "ms": round(ms, 3),
                          "max_err_vs_v0": round(err, 5)}), flush=True)


if __name__ == "__main__":
    main()
