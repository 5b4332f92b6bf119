"""10M-chunk single-chip capacity benchmark (BASELINE.md scale point).

BASELINE.md states the recall target at 10M chunks; bench.py measures the
1M headline.  This script proves the 10M configuration on ONE chip:

    int8 corpus  10,003,456 x 768  = 7.68 GB HBM (+ 40 MB scales)
    fused Pallas dense top-k, int8 x int8 MXU path
    recall@10 vs exact fp32 gold (computed host-side, streamed)

The corpus is generated and quantized host-side in chunks so neither the
host nor the device ever holds an f32 copy of the full matrix (29 GB).

Run on TPU: python scripts/bench_10m.py
"""

from __future__ import annotations

import json
import time

import numpy as np

TILE = 8192
CHUNK = 262_144


def main() -> None:
    import jax
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.ops.dense import DenseCorpus
    from super_rag_tpu.ops.pallas_topk import pallas_dense_topk

    on_tpu = jax.default_backend() != "cpu"
    n = TILE * 1221 if on_tpu else TILE * 4  # 10,003,432 rounded to tiles
    n = (n // TILE) * TILE
    d = 768 if on_tpu else 128
    n_centers = 2048 if on_tpu else 64
    k = 10
    batch_qps, batch_lat = 512, 32
    n_gold = 64

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 3.0

    # queries: in-distribution (near centers)
    q_assign = rng.integers(0, n_centers, batch_qps)
    q_all = (centers[q_assign]
             + rng.standard_normal((batch_qps, d)).astype(np.float32))
    qn = q_all / np.linalg.norm(q_all, axis=1, keepdims=True)
    q_gold = qn[:n_gold]

    # streamed build: per chunk -> normalize -> gold scores -> int8 (+bf16)
    import ml_dtypes

    values = np.empty((n, d), np.int8)
    values_bf16 = np.empty((n, d), ml_dtypes.bfloat16)
    scales = np.empty((n,), np.float32)
    gold_v = np.full((n_gold, k), -np.inf, np.float32)
    gold_i = np.full((n_gold, k), -1, np.int64)

    t0 = time.perf_counter()
    for base in range(0, n, CHUNK):
        m = min(CHUNK, n - base)
        assign = rng.integers(0, n_centers, m)
        chunk = centers[assign] + rng.standard_normal((m, d)).astype(np.float32)
        chunk /= np.linalg.norm(chunk, axis=1, keepdims=True)

        s = q_gold @ chunk.T  # [n_gold, m]
        # merge running top-k with this chunk's top-k
        loc = np.argpartition(-s, k, axis=1)[:, :k]
        lv = np.take_along_axis(s, loc, axis=1)
        cv = np.concatenate([gold_v, lv], axis=1)
        ci = np.concatenate([gold_i, loc + base], axis=1)
        sel = np.argpartition(-cv, k, axis=1)[:, :k]
        gold_v = np.take_along_axis(cv, sel, axis=1)
        gold_i = np.take_along_axis(ci, sel, axis=1)

        mx = np.abs(chunk).max(axis=1)
        mx = np.where(mx > 0, mx, 1.0)
        values[base : base + m] = np.clip(
            np.rint(chunk * (127.0 / mx[:, None])), -127, 127
        ).astype(np.int8)
        scales[base : base + m] = mx / 127.0
        values_bf16[base : base + m] = chunk.astype(ml_dtypes.bfloat16)
    build_s = time.perf_counter() - t0

    corpus = DenseCorpus(values=jnp.asarray(values),
                         scales=jnp.asarray(scales))
    del values, scales
    queries = jnp.asarray(qn)

    def run(q):
        return pallas_dense_topk(q, corpus, k=k, tile=TILE,
                                 int8_queries=True, interpret=not on_tpu)

    def sync(out):
        np.asarray(out[1])

    def recall_of(ids):
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(np.asarray(ids), gold_i)
        ]))

    # recall@10 of the int8 Pallas path vs exact fp32 gold
    out = run(queries[:n_gold])
    sync(out)
    recall = recall_of(out[1])
    # int8 corpus with UNquantized (bf16) queries — isolates the
    # query-side quantization loss at ~half the int8 MXU rate
    _, fi = pallas_dense_topk(queries[:n_gold], corpus, k=k, tile=TILE,
                              int8_queries=False, interpret=not on_tpu)
    sync((None, fi))
    recall_f32q = recall_of(fi)

    def timed(fn, q, lo=4, hi=12):
        def total(depth):
            t0 = time.perf_counter()
            o = None
            for _ in range(depth):
                o = fn(q)
            sync(o)
            return time.perf_counter() - t0
        total(2)
        tlo = min(total(lo) for _ in range(2))
        thi = min(total(hi) for _ in range(2))
        return (thi - tlo) / (hi - lo)

    per_call_512 = timed(run, queries)
    per_call_32 = timed(run, queries[:batch_lat])

    qps = batch_qps / per_call_512
    print(json.dumps({
        "metric": "dense_qps_per_chip_10m",
        "value": round(qps, 1),
        "unit": "queries/s",
        "n": n, "d": d, "recall_at_10_vs_exact_f32": round(recall, 4),
        "recall_at_10_f32_queries": round(recall_f32q, 4),
        "batch512_ms": round(per_call_512 * 1e3, 2),
        "batch32_ms": round(per_call_32 * 1e3, 2),
        "hbm_gb": round(n * d / 2**30, 2),
        "build_s": round(build_s, 1),
    }), flush=True)

    # bf16 corpus at the same row count (14.3 GB — the honest
    # "equal memory" configuration vs the reference's f32 HNSW at 29 GB+)
    del corpus
    import gc
    gc.collect()
    try:
        corpus16 = DenseCorpus(values=jnp.asarray(values_bf16), scales=None)
        del values_bf16
        gc.collect()

        def run16(q):
            return pallas_dense_topk(q, corpus16, k=k, tile=TILE,
                                     interpret=not on_tpu)

        o = run16(queries[:n_gold])
        sync(o)
        rec16 = recall_of(o[1])
        t16 = timed(run16, queries[:batch_lat])
        print(json.dumps({
            "metric": "dense_bf16_10m",
            "recall_at_10_vs_exact_f32": round(rec16, 4),
            "batch32_ms": round(t16 * 1e3, 2),
            "hbm_gb": round(n * d * 2 / 2**30, 2),
        }), flush=True)
    except Exception as e:  # noqa: BLE001 — HBM-dependent
        print(json.dumps({"metric": "dense_bf16_10m",
                          "skipped": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
