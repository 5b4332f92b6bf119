"""API-level serving benchmark: end-to-end HTTP search QPS + ingest rate.

Measures the full stack (HTTP parse -> auth -> nodeflow DAG -> device
programs -> JSON) rather than the bare kernels bench.py measures.
Run: python scripts/bench_serving.py [n_docs] [n_queries]
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:  # `python scripts/...` puts scripts/ first
    sys.path.insert(0, ROOT)


def main() -> None:
    import httpx

    from super_rag_tpu.app import App
    from super_rag_tpu.config import Settings
    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import tempfile

    cfg = Settings(data_dir=tempfile.mkdtemp(prefix="srv_bench_"), port=0)
    loop = asyncio.new_event_loop()
    app = None
    started = threading.Event()

    def run_server():
        nonlocal app
        asyncio.set_event_loop(loop)

        async def boot():
            nonlocal app
            app = App(cfg, background_tasks=False)
            await app.start(port=0)
            started.set()

        loop.run_until_complete(boot())
        loop.run_forever()

    threading.Thread(target=run_server, daemon=True).start()
    started.wait(30)
    base = f"http://127.0.0.1:{app.port}"

    c = httpx.Client(base_url=base, timeout=120)
    c.post("/api/v1/auth/register", json={"username": "b", "password": "pw123456"})
    tok = c.post("/api/v1/auth/login",
                 json={"username": "b", "password": "pw123456"}).json()["token"]
    c.headers["Authorization"] = f"Bearer {tok}"
    coll = c.post("/api/v1/collections", json={"title": "bench"}).json()

    # ingest
    t0 = time.perf_counter()
    batch = 50
    for i in range(0, n_docs, batch):
        docs = [{"name": f"d{j}.md",
                 "content": f"# Doc {j}\n\n" + " ".join(
                     f"term{(j * 13 + w) % 997}" for w in range(120))}
                for j in range(i, min(i + batch, n_docs))]
        r = c.post(f"/api/v1/collections/{coll['id']}/documents", json=docs)
        r.raise_for_status()
    ingest_s = time.perf_counter() - t0

    # warm the search path
    c.post(f"/api/v1/collections/{coll['id']}/searches",
           json={"query": "term1 term2", "top_k": 5})

    lat = []
    t0 = time.perf_counter()
    for i in range(n_queries):
        q = f"term{(i * 7) % 997} term{(i * 11) % 997}"
        t1 = time.perf_counter()
        r = c.post(f"/api/v1/collections/{coll['id']}/searches",
                   json={"query": q, "top_k": 5})
        r.raise_for_status()
        lat.append(time.perf_counter() - t1)
    total = time.perf_counter() - t0
    lat.sort()

    # concurrent phase: many requests in flight exercise the serving
    # micro-batcher (engine/batcher.py) — same-parameter searches
    # coalesce into one device dispatch per window
    async def concurrent_phase():
        async with httpx.AsyncClient(base_url=base, timeout=120) as ac:
            ac.headers["Authorization"] = f"Bearer {tok}"
            t0 = time.perf_counter()
            window = 64
            done = 0
            while done < n_queries:
                burst = min(window, n_queries - done)
                rs = await asyncio.gather(*[
                    ac.post(f"/api/v1/collections/{coll['id']}/searches",
                            json={"query": f"term{((done + i) * 7) % 997} "
                                           f"term{((done + i) * 11) % 997}",
                                  "top_k": 5})
                    for i in range(burst)
                ])
                for r in rs:
                    r.raise_for_status()
                done += burst
            return time.perf_counter() - t0

    b0 = app.ctx.batcher.stats() if app.ctx.batcher else {}
    conc_s = asyncio.run(concurrent_phase())
    b1 = app.ctx.batcher.stats() if app.ctx.batcher else {}
    d_disp = b1.get("dispatches", 0) - b0.get("dispatches", 0)
    d_q = b1.get("queries", 0) - b0.get("queries", 0)

    print(json.dumps({
        "ingest_docs_per_s": round(n_docs / ingest_s, 2),
        "search_qps_sequential": round(n_queries / total, 2),
        "search_qps_concurrent64": round(n_queries / conc_s, 2),
        "batcher_avg_batch": round(d_q / d_disp, 2) if d_disp else None,
        "search_p50_ms": round(lat[len(lat) // 2] * 1000, 2),
        "search_p95_ms": round(lat[int(len(lat) * 0.95)] * 1000, 2),
        "n_docs": n_docs,
    }))


if __name__ == "__main__":
    main()
