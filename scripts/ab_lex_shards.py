"""TPU A/B: lexical aggregation cost, doc-sharded CSR vs unsharded.

Times ONLY the lexical branch (inverted_bm25_search) at the 10M bench's
budget configs, both layouts, WITHOUT shipping the 2.3 GB postings to
the device: bitonic sort cost is data-independent, so device-generated
random postings with the REAL per-term run lengths (offsets loaded from
the cached 10M snapshot, 0.5 MB) time exactly what the real index would.
Big host->device transfers are the claim-wedge risk window (CLAUDE.md);
this sends ~1 MB.

Writes AB_LEX_SHARDS.json: ms per batch for every (config, layout), and
the BENCH_CSR_SHARDS value stage 10 should use (16 if sharded wins both
configs, else 1).

Run on TPU from the r4 queue (stage 08).  CPU smoke: AB_SMOKE=1.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench10m_cache")
TAG = "n10002432_d768_v131072_s48"
SHARDS = 16
B = 512
QTERMS = 16


def log(msg: str) -> None:
    print(f"[ab_lex] {msg}", flush=True)


def main() -> None:
    smoke = os.environ.get("AB_SMOKE") == "1"

    # claim-wedge watchdog: die loudly instead of hanging the queue slot
    signal.alarm(60 if smoke else 900)
    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from bench import timed
    from super_rag_tpu.ops.bm25_inverted import (CSRInvertedIndex,
                                                 inverted_bm25_search)

    dev = jax.devices()[0]
    log(f"backend={dev.platform}")
    signal.alarm(0)

    if smoke:
        rng = np.random.default_rng(0)
        vocab, n = 1 << 12, 100_000
        counts = rng.zipf(1.4, vocab + 1).astype(np.int64) % 4096
        counts[-1] = 0  # pad bucket empty
    else:
        with np.load(os.path.join(CACHE, f"csr_{TAG}.npz")) as z:
            off_real = z["offsets"].astype(np.int64)
        counts = np.diff(off_real)
        vocab = len(counts) - 1
        n = 10_002_432
    e = int(counts.sum())
    offsets1d = np.zeros(vocab + 2, np.int64)
    np.cumsum(counts, out=offsets1d[1:])

    # shard-major synthetic offsets with the same totals: counts split
    # evenly with the remainder spread over the first (count % C) shards
    per = counts // SHARDS
    rem = counts % SHARDS
    counts2d = np.broadcast_to(per, (SHARDS, vocab + 1)).copy()
    counts2d += (np.arange(SHARDS)[:, None] < rem[None, :])
    flat_off = np.zeros(SHARDS * (vocab + 1) + 1, np.int64)
    np.cumsum(counts2d.reshape(-1), out=flat_off[1:])
    offsets2d = np.empty((SHARDS, vocab + 2), np.int64)
    for c in range(SHARDS):
        offsets2d[c] = flat_off[c * (vocab + 1): c * (vocab + 1) + vocab + 2]
    assert offsets2d[-1, -1] == e

    # device-generated postings: timing-equivalent to the real snapshot
    key = jax.random.PRNGKey(0)
    docs = jax.random.randint(key, (e,), 0, n, dtype=jnp.int32)
    impact = jax.random.uniform(jax.random.PRNGKey(1), (e,),
                                dtype=jnp.float32).astype(jnp.bfloat16)
    docs.block_until_ready()
    log(f"postings on device: {e / 1e6:.0f}M")

    # query terms ~ df-weighted sample of real terms (the bench draws
    # terms from random docs, which is df-weighted by construction),
    # capped at the bench's df cap n/50
    cap = max(64, n // 50)
    elig = np.flatnonzero((counts[:vocab] > 0) & (counts[:vocab] <= cap))
    p = counts[elig].astype(np.float64)
    p /= p.sum()
    qt_np = np.random.default_rng(2).choice(
        elig, size=(B, QTERMS), p=p).astype(np.int32)
    df = counts[:vocab][qt_np]
    qi_np = np.log(1.0 + (n - df + 0.5) / (df + 0.5)).astype(np.float32)
    qt = jnp.asarray(qt_np)
    qi = jnp.asarray(qi_np)

    idx1 = CSRInvertedIndex(postings_docs=docs, postings_impact=impact,
                            offsets=jnp.asarray(offsets1d.astype(np.int32)),
                            num_docs=n)
    idx16 = CSRInvertedIndex(postings_docs=docs, postings_impact=impact,
                             offsets=jnp.asarray(offsets2d.astype(np.int32)),
                             num_docs=n)

    if smoke:
        configs = {"tiny": dict(postings_per_query_term=64, deep_terms=2,
                                deep_postings=512)}
    else:
        configs = {
            "gates_pq768_d2x8192": dict(postings_per_query_term=768,
                                        deep_terms=2, deep_postings=8192),
            "quality_pq2048_d4x65536": dict(postings_per_query_term=2048,
                                            deep_terms=4,
                                            deep_postings=65536),
        }

    out = {"batch": B, "qterms": QTERMS, "postings_m": round(e / 1e6, 1),
           "shards": SHARDS, "results_ms": {}}
    for name, cfg in configs.items():
        for label, idx in (("flat", idx1), (f"sharded{SHARDS}", idx16)):
            def run(idx=idx, cfg=cfg):
                return inverted_bm25_search(qt, qi, idx, k=250,
                                            approx_topk=True, **cfg)

            def sync(o):
                np.asarray(o[0][:1, :1])

            t0 = time.perf_counter()
            sync(run())  # compile
            log(f"{name}/{label}: compiled in "
                f"{time.perf_counter() - t0:.0f}s")
            ms = timed(run, sync) * 1e3
            out["results_ms"][f"{name}/{label}"] = round(ms, 2)
            log(f"{name}/{label}: {ms:.2f} ms/batch")

    if not smoke:
        r = out["results_ms"]
        wins = all(
            r[f"{c}/sharded{SHARDS}"] < r[f"{c}/flat"] for c in configs)
        out["recommended_csr_shards"] = SHARDS if wins else 1
        log(f"recommended BENCH_CSR_SHARDS="
            f"{out['recommended_csr_shards']}")
    path = ("/tmp/AB_LEX_SHARDS_SMOKE.json" if smoke
            else os.path.join(ROOT, "AB_LEX_SHARDS.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
