"""Churn benchmark: query while inserting/deleting at 1M rows (VERDICT
r2 item 6 / ROADMAP r3 item 4).

Measures, through the REAL mutable engine (DeviceIndex — capacity
classes, validity bitmap, fresh-tail scan, inverted+IVF snapshots):

  1. quiescent batch-32 hybrid latency after full compaction;
  2. latency as the UNCOMPACTED fresh tail grows (the NRT cost curve);
  3. hybrid fidelity vs an exact host-side gold ON THE MUTATED corpus
     (deleted rows must not surface, fresh rows must) with rescore on;
  4. latency + fidelity recovered after re-compaction.

The reference analog: SeekDB keeps serving during HNSW maintenance;
here the engine keeps serving exact results for the tail until the next
compaction pass.

Run on TPU:  python scripts/bench_churn.py
CPU sanity:  JAX_PLATFORMS=cpu python scripts/bench_churn.py
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

K1, B = 1.2, 0.75


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.engine.index import DeviceIndex, IndexSpec

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        n, dim, batch_add = 1_000_000, 768, 16384
        churn_rounds, churn_size = 4, 16384
        n_q, k = 32, 10
    else:
        n, dim, batch_add = 20_000, 64, 4096
        churn_rounds, churn_size = 2, 1024
        n_q, k = 32, 10  # 8 queries = 1.25-pt fidelity granularity: too noisy

    # serve at the PROMOTED operating point (tune_fidelity winner): the
    # engine defaults (uniform768, no deep terms) measure ~0.93 fidelity
    # where the serving config measures 0.95+ — churn decay must be
    # read against the real serving baseline, not a detuned one
    opts = {}
    cfg_path = os.path.join(ROOT, "BENCH_CONFIG.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            tuned = json.load(f)
        opts = {
            "postings_per_query_term": int(
                tuned.get("postings_per_query_term", 768)),
            "lex_deep_terms": int(tuned.get("lex_deep_terms", 0)),
            "lex_deep_postings": tuned.get("lex_deep_postings"),
            "lex_approx_topk": bool(tuned.get("lex_approx_topk", False)),
        }
        print(f"[churn] serving opts from BENCH_CONFIG.json: {opts}",
              flush=True)
    # the serving default at 1M is the FLAT dense tier (BENCH_P50_1M);
    # the IVF tier is a separate operating point — opt in via CHURN_IVF=1.
    # Skipping it also avoids two streaming IVF builds (3 GB host-chunk
    # uploads each, the r3 kill-mid-transfer wedge window).
    use_ivf = os.environ.get("CHURN_IVF", "0") == "1"

    rng = np.random.default_rng(0)
    # realistic shape: zipf word draws (a uniform draw ties half the
    # corpus on equal idf sums and fidelity measures tie-order noise,
    # not correctness) and CLUSTERED embeddings (uniform gaussians give
    # near-equal scores whose order bf16 storage scrambles)
    words = [f"w{i}" for i in range(4096)]
    centers = rng.standard_normal((256, dim), dtype=np.float32) * 3.0

    def mk_texts(m, base):
        picks = (rng.zipf(1.3, size=(m, 6)) - 1) % len(words)
        return [" ".join(words[j] for j in row) + f" doc{base + r}"
                for r, row in enumerate(picks)]

    def mk_emb(m):
        a = rng.integers(0, centers.shape[0], m)
        x = centers[a] + rng.standard_normal((m, dim), dtype=np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    t0 = time.perf_counter()
    idx = DeviceIndex(IndexSpec(dim=dim, vocab_size=1 << 17, bm25_slots=16))
    base = 0
    while base < n:
        m = min(batch_add, n - base)
        idx.add(mk_emb(m), mk_texts(m, base))
        base += m
        if base % (batch_add * 8) == 0:
            print(f"[churn] built {base}/{n}", flush=True)
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    idx.compact_lexical(postings_per_term=max(256, n // 500))
    if on_tpu and use_ivf:
        idx.compact_dense(nlist=1024, nprobe=32, recall_target=0.95)
    compact_s = time.perf_counter() - t0
    print(f"[churn] build {build_s:.0f}s compact {compact_s:.0f}s",
          flush=True)

    q_emb = mk_emb(n_q)
    # query terms come from the zipf TAIL (discriminative words), like
    # bench.py's df-cap (df <= n/50): head words like w0 sit in 30%+ of
    # a zipf(1.3) corpus, where the truncated top-2000 postings tier
    # structurally cannot match an untruncated gold — that measures the
    # eval's term choice, not ranking fidelity (first run read 0.73 on
    # head-word queries vs 0.95 serving fidelity in the headline bench)
    qrng = np.random.default_rng(17)
    queries = [" ".join(words[j] for j in qrng.integers(
        64, len(words), 4)) for _ in range(n_q)]

    def timed_batch(reps=8):
        out = None
        t_w = time.perf_counter()
        idx.search_hybrid(np.asarray(q_emb), queries, k=k, candidates=100,
                          **opts)
        t_w = time.perf_counter() - t_w
        if t_w > 10:  # warmup absorbed an auto-compact and/or a compile
            print(f"[churn] warmup (compact/compile) {t_w:.0f}s",
                  flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = idx.search_hybrid(np.asarray(q_emb), queries, k=k,
                                    candidates=100, **opts)
        np.asarray(out.indices)
        return (time.perf_counter() - t0) / reps * 1e3

    # host mirrors of the stored (quantized) corpus for the gold: rows
    # are append-only (deletes flip the validity bitmap, never rewrite
    # rows), so each fidelity call pulls ONLY the fresh tail — the full
    # 3 GB emb pull per call was both slow and a kill-mid-transfer
    # wedge window through the relay
    mirror = {"upto": 0, "emb": [], "terms": [], "tfs": [], "dl": []}

    def _mirror_sync():
        import jax.numpy as jnp

        lo, hi = mirror["upto"], idx.size
        if hi > lo:
            e = np.asarray(idx.emb[lo:hi].astype(jnp.float32))
            if idx.scales is not None:
                e = e * np.asarray(idx.scales[lo:hi])[:, None]
            mirror["emb"].append(e)
            mirror["terms"].append(np.asarray(idx.terms[lo:hi]))
            mirror["tfs"].append(
                np.asarray(idx.tfs[lo:hi].astype(jnp.float32)))
            mirror["dl"].append(np.asarray(idx.doc_len[lo:hi]))
            for key in ("emb", "terms", "tfs", "dl"):
                if len(mirror[key]) > 1:
                    mirror[key] = [np.concatenate(mirror[key])]
            mirror["upto"] = hi
        return (mirror["emb"][0], mirror["terms"][0], mirror["tfs"][0],
                mirror["dl"][0])

    def fidelity() -> float:
        """Exact hybrid gold on the CURRENT live corpus (host-side)."""
        from super_rag_tpu.ops.fusion import rrf_fuse
        import jax.numpy as jnp

        live = np.asarray(idx.valid[: idx.size])
        emb, terms, tfs, dl = _mirror_sync()
        qn = q_emb / np.linalg.norm(q_emb, axis=1, keepdims=True)
        s = qn @ emb.T
        s[:, ~live] = -np.inf
        kk = min(100, s.shape[1])
        di = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
        dv = np.take_along_axis(s, di, axis=1)
        order = np.argsort(-dv, axis=1)
        di = np.take_along_axis(di, order, axis=1)
        dv = np.take_along_axis(dv, order, axis=1)
        # exact bm25 host-side (mirrored stored arrays)
        avgdl = max(idx.df.avgdl, 1e-6)
        norm = K1 * (1.0 - B + B * dl / avgdl)
        gold_li = np.full((n_q, kk), -1, np.int64)
        gold_lv = np.full((n_q, kk), -np.inf, np.float32)
        for qi, qtext in enumerate(queries):
            qt, qidf = idx.analyzer.query_entry(qtext, idx.df, 16)
            scores = np.zeros(idx.size, np.float32)
            for t, w in zip(qt, qidf):
                if t == idx.analyzer.pad_id or w <= 0:
                    continue
                hit = (terms == t)
                tf = (tfs * hit).sum(1)
                sat = tf * (K1 + 1.0) / np.where(tf > 0, tf + norm, 1.0)
                scores += w * np.where(tf > 0, sat, 0.0)
            scores[~live] = 0.0
            loc = np.argpartition(-scores, kk - 1)[:kk]
            loc = loc[np.argsort(-scores[loc], kind="stable")]
            gold_lv[qi] = scores[loc]
            gold_li[qi] = loc
        gdi = np.where(np.isfinite(dv), di, -1).astype(np.int32)
        gli = np.where(gold_lv > 0, gold_li, -1).astype(np.int32)
        _, gold = rrf_fuse(jnp.asarray(gdi), jnp.asarray(gli), k=k)
        gold = np.asarray(gold)
        res = idx.search_hybrid(np.asarray(q_emb), queries, k=k,
                                candidates=100, **opts)
        got = np.asarray(res.indices)
        f = np.mean([
            len({x for x in a.tolist() if x >= 0}
                & {x for x in g.tolist() if x >= 0})
            / max(len({x for x in g.tolist() if x >= 0}), 1)
            for a, g in zip(got, gold)
        ])
        # safety: no deleted row may surface
        for row in got.reshape(-1):
            assert row < 0 or idx.row_meta[int(row)] is not None, \
                f"deleted row {row} surfaced"
        return float(f)

    partial: dict = {"metric": "churn_bench_1m", "unit": "ms_batch32",
                     "n": n, "partial": True}

    def flush(**kw) -> None:
        """Persist partial progress after every phase (VERDICT r4 item
        8): a timeout'd run still leaves a usable record."""
        partial.update(kw)
        if on_tpu:
            with open(os.path.join(ROOT, "BENCH_CHURN_1M.partial.json"),
                      "w") as f:
                json.dump(partial, f, indent=1)

    quiescent_ms = timed_batch()
    quiescent_fid = fidelity()
    print(f"[churn] quiescent batch32 {quiescent_ms:.2f} ms "
          f"fidelity {quiescent_fid:.4f}", flush=True)
    flush(quiescent={"batch32_ms": round(quiescent_ms, 2),
                     "fidelity": round(quiescent_fid, 4)})

    tail_curve = []
    # the tail curve measures FRESH-TAIL serving (exact tail-slice scan
    # alongside the inverted snapshot): suspend auto-compaction so the
    # warmup search doesn't silently rebuild postings and measure a
    # zero-tail index under a "tail N" label (first r5 run: every round
    # auto-compacted in the warmup — ~132 s rebuild + a new program
    # compile per round, and the curve never saw a tail)
    saved_auto = idx.auto_compact_rows
    idx.auto_compact_rows = 1 << 30
    live_rows = [r for r, m_ in enumerate(idx.row_meta) if m_ is not None]
    for round_ in range(churn_rounds):
        t0 = time.perf_counter()
        idx.add(mk_emb(churn_size), mk_texts(churn_size, n + round_ * churn_size))
        t_add = time.perf_counter() - t0
        kill = rng.choice(len(live_rows), churn_size, replace=False)
        t0 = time.perf_counter()
        idx.delete([live_rows[j] for j in sorted(kill)])
        t_del = time.perf_counter() - t0
        live_rows = [r for j, r in enumerate(live_rows)
                     if j not in set(kill.tolist())]
        tail = idx.size - idx._inverted_upto
        print(f"[churn] round {round_}: add {t_add:.1f}s del {t_del:.1f}s "
              f"tail {tail}", flush=True)
        ms = timed_batch()
        tail_curve.append({"tail_rows": int(tail),
                           "batch32_ms": round(ms, 2)})
        print(f"[churn] tail {tail}: {ms:.2f} ms", flush=True)
        flush(tail_curve=tail_curve)
    churn_fid = fidelity()
    flush(after_churn_fidelity=round(churn_fid, 4))
    idx.auto_compact_rows = saved_auto

    t0 = time.perf_counter()
    idx.compact_lexical(postings_per_term=max(256, n // 500))
    if on_tpu and use_ivf:
        idx.compact_dense(nlist=1024, nprobe=32, recall_target=0.95)
    recompact_s = time.perf_counter() - t0
    recompact_ms = timed_batch()
    recompact_fid = fidelity()

    result = {
        "metric": "churn_bench_1m",
        "value": round(quiescent_ms, 2),
        "unit": "ms_batch32",
        "n": n,
        "serving_opts": opts,
        "dense_tier": "ivf" if use_ivf else "flat",
        "quiescent": {"batch32_ms": round(quiescent_ms, 2),
                      "fidelity": round(quiescent_fid, 4)},
        "tail_curve": tail_curve,
        "after_churn_fidelity": round(churn_fid, 4),
        "recompact_s": round(recompact_s, 1),
        "recompacted": {"batch32_ms": round(recompact_ms, 2),
                        "fidelity": round(recompact_fid, 4)},
    }
    print(json.dumps(result), flush=True)
    if on_tpu:  # persist the record (CPU sanity must not clobber it)
        with open(os.path.join(ROOT, "BENCH_CHURN_1M.json"), "w") as f:
            json.dump(result, f, indent=1)
        part = os.path.join(ROOT, "BENCH_CHURN_1M.partial.json")
        if os.path.exists(part):  # superseded by the complete record
            os.remove(part)


if __name__ == "__main__":
    main()
