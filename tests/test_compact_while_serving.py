"""Compaction concurrent with serving: searches racing inserts, deletes,
compact_lexical and compact_dense must never see torn state — no
deleted row after delete returns, no phantom rows, and quiescent results
equal to a fresh engine over the same data (the SeekDB-serves-during-
HNSW-maintenance analog; VERDICT r2 item 6)."""

import threading

import numpy as np
import pytest

from super_rag_tpu.engine.index import DeviceIndex, IndexSpec


def mk_index(n0=64, dim=32):
    idx = DeviceIndex(IndexSpec(dim=dim, vocab_size=1 << 12, bm25_slots=16,
                                dtype=np.float32))
    rng = np.random.default_rng(0)
    texts = [f"seed doc {i} alpha topic{i % 7}" for i in range(n0)]
    emb = rng.standard_normal((n0, dim), dtype=np.float32)
    idx.add(emb, texts, metadata=[{"i": i} for i in range(n0)])
    return idx, rng


def test_search_during_compact_and_churn():
    idx, rng = mk_index()
    dim = idx.spec.dim
    stop = threading.Event()
    errors: list[str] = []
    deleted: set[int] = set()
    deleted_lock = threading.Lock()

    def churner():
        try:
            for round_ in range(6):
                emb = rng.standard_normal((8, dim), dtype=np.float32)
                rows = idx.add(
                    emb,
                    [f"fresh doc r{round_} n{j} bravo" for j in range(8)],
                    metadata=[{"r": round_}] * 8,
                )
                # delete a few of the fresh rows again
                kill = rows[::3]
                # record BEFORE deleting: a searcher that observes the
                # engine-side tombstone between delete() and the record
                # would otherwise flag a false phantom (test-side race,
                # seen ~1/30 full-suite runs)
                with deleted_lock:
                    deleted.update(kill)
                idx.delete(kill)
                idx.compact_lexical(postings_per_term=64)
                if round_ % 2 == 0:
                    idx.compact_dense(nlist=8, nprobe=4)
        except Exception as e:  # noqa: BLE001
            errors.append(f"churner: {e!r}")
        finally:
            stop.set()

    def searcher(tid: int):
        try:
            q = rng.standard_normal((1, dim), dtype=np.float32)
            while not stop.is_set():
                v, i = idx.search_dense(q, k=10, flt=None)
                rows = [int(r) for r in np.asarray(i)[0] if r >= 0]
                with deleted_lock:
                    dead = [r for r in rows if idx.row_meta[r] is None
                            and r not in deleted]
                if dead:
                    errors.append(f"searcher{tid}: phantom rows {dead}")
                    return
                lv, li = idx.search_bm25([f"alpha topic{tid}"], k=5,
                                         flt=None)
                hv = idx.search_hybrid(
                    q, [f"bravo topic{tid}"], k=5, candidates=16,
                )
                assert hv.indices.shape[0] == 1
        except Exception as e:  # noqa: BLE001
            errors.append(f"searcher{tid}: {e!r}")

    threads = [threading.Thread(target=churner)] + [
        threading.Thread(target=searcher, args=(t,)) for t in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
    assert not errors, errors

    # quiescence: deleted rows never surface, live rows all reachable
    live = [r for r, m in enumerate(idx.row_meta) if m is not None]
    q = rng.standard_normal((1, idx.spec.dim), dtype=np.float32)
    v, i = idx.search_dense(q, k=min(len(live), 64), flt=None)
    got = {int(r) for r in np.asarray(i)[0] if r >= 0}
    assert not (got & set(deleted) - {r for r in deleted
                                      if idx.row_meta[r] is not None})
    for r in got:
        assert idx.row_meta[r] is not None


def test_quiescent_equals_fresh_rebuild():
    """After interleaved add/delete/compact cycles, search results match
    a fresh engine built from the surviving rows (no lost updates)."""
    idx, rng = mk_index(n0=48, dim=16)
    emb2 = rng.standard_normal((16, 16), dtype=np.float32)
    rows2 = idx.add(emb2, [f"late doc {j} charlie" for j in range(16)],
                    metadata=[{"late": j} for j in range(16)])
    idx.compact_lexical(postings_per_term=64)
    idx.delete(rows2[:8])
    emb3 = rng.standard_normal((4, 16), dtype=np.float32)
    idx.add(emb3, [f"tail doc {j} delta" for j in range(4)],
            metadata=[{"tail": j} for j in range(4)])

    fresh = DeviceIndex(IndexSpec(dim=16, vocab_size=1 << 12, bm25_slots=16,
                                  dtype=np.float32))
    live_rows = [r for r, m in enumerate(idx.row_meta) if m is not None]
    texts = [idx.row_meta[r]["text"] for r in live_rows]
    vecs = np.stack([
        np.asarray(idx.emb[r].astype("float32"))
        * (float(idx.scales[r]) if idx.scales is not None else 1.0)
        for r in live_rows
    ])
    fresh.add(vecs, texts, metadata=[{} for _ in live_rows])

    lv, li = idx.search_bm25(["charlie"], k=8, flt=None)
    flv, fli = fresh.search_bm25(["charlie"], k=8, flt=None)
    mine = {idx.row_meta[int(r)]["text"]
            for s, r in zip(np.asarray(lv)[0], np.asarray(li)[0])
            if r >= 0 and np.isfinite(s) and s > 0}
    theirs = {fresh.row_meta[int(r)]["text"]
              for s, r in zip(np.asarray(flv)[0], np.asarray(fli)[0])
              if r >= 0 and np.isfinite(s) and s > 0}
    assert mine == theirs
    lv, li = idx.search_bm25(["delta"], k=8, flt=None)  # fresh tail rows
    tail_hits = {idx.row_meta[int(r)]["text"]
                 for s, r in zip(np.asarray(lv)[0], np.asarray(li)[0])
                 if r >= 0 and np.isfinite(s) and s > 0}
    assert {f"tail doc {j} delta" for j in range(4)} <= tail_hits
