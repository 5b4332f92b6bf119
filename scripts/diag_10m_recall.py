"""Host-side recall-ceiling diagnostic for the 10M IVF config.

BENCH_10M.json r3 run: dense recall@10 = 0.9391 for EVERY nprobe in
32..128 — nprobe-invariant, so the loss is not probing.  This script
loads the cached build artifacts (.bench10m_cache/) plus the exact gold
and measures, on the gold top-100 candidate sets only (rank > 100 can
never reach top-10: the rank-100 score deficit ~0.0014 dwarfs the
~1e-4 quantization noise):

  1. the actual stored-int8 reconstruction error and its recall@10
     (validates the simulation against what the TPU run scored);
  2. recall@10 for candidate quantizer variants at equal memory:
     per-64/128-dim-group scales, clipped absmax, residual-coded
     overflow — and a bf16 upper bound.

Pure host/numpy; does NOT claim the TPU.
Run:  MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824 \
      nice -n 10 python scripts/diag_10m_recall.py
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

CACHE = os.path.join(ROOT, ".bench10m_cache")
CHUNK = 262_144
N, D, NCEN = 8192 * 1221, 768, 2048
TAG = f"n{N}_d{D}_v131072_s48"
T0 = time.perf_counter()


def log(m):
    print(f"[diag +{time.perf_counter() - T0:6.0f}s] {m}", flush=True)


def main() -> None:
    g = np.load(os.path.join(CACHE, f"dense_gold_{TAG}.npz"))
    gold_dv, gold_di = g["dv"], g["di"]  # [64, 100]
    nq, cand = gold_di.shape

    centers = (np.random.default_rng([7, 0])
               .standard_normal((NCEN, D), dtype=np.float32) * 3.0)
    qrng = np.random.default_rng([7, 1])
    q_assign = qrng.integers(0, NCEN, 512)
    q_all = centers[q_assign] + qrng.standard_normal((512, D),
                                                     dtype=np.float32)
    qn = (q_all / np.linalg.norm(q_all, axis=1, keepdims=True))[:nq]
    log(f"queries regenerated; gold {gold_di.shape}")

    z = np.load(os.path.join(CACHE, f"ivf_{TAG}_l8192.npz"))
    row_ids = z["row_ids"]          # [nlist, cap]
    cen = z["centroids"]            # [nlist, D] (kmeans, unit-norm)
    of_rows = z["of_rows"]          # [M]
    log(f"ivf meta loaded: nlist={row_ids.shape[0]} cap={row_ids.shape[1]} "
        f"overflow={of_rows.size}")

    # --- locate each gold id: (cluster, slot) or overflow position --------
    ids = gold_di.ravel().astype(np.int64)
    flat = row_ids.ravel()
    order = np.argsort(flat, kind="stable")
    sflat = flat[order]
    pos = np.searchsorted(sflat, ids)
    in_cluster = (pos < sflat.size) & (sflat[np.minimum(pos, sflat.size - 1)]
                                       == ids)
    lin = order[np.minimum(pos, sflat.size - 1)]
    cl = (lin // row_ids.shape[1]).astype(np.int64)
    slot = (lin % row_ids.shape[1]).astype(np.int64)

    of_sorted = np.sort(of_rows)
    of_order = np.argsort(of_rows, kind="stable")
    opos = np.searchsorted(of_sorted, ids)
    in_of = (opos < of_sorted.size) & (of_sorted[np.minimum(
        opos, of_sorted.size - 1)] == ids)
    of_idx = of_order[np.minimum(opos, of_sorted.size - 1)]
    assert bool(np.all(in_cluster | in_of)), "gold id in neither segment"
    frac_of = float(in_of.mean())
    log(f"gold candidates in overflow: {frac_of:.3f}")

    # --- regenerate exact fp32 rows for all candidate ids ----------------
    x = np.empty((ids.size, D), np.float32)
    uniq_chunks = np.unique(ids // CHUNK)
    for ci in uniq_chunks:
        crng = np.random.default_rng([9, int(ci)])
        m = min(CHUNK, N - int(ci) * CHUNK)
        assign = crng.integers(0, NCEN, m)
        cx = centers[assign] + crng.standard_normal((m, D), dtype=np.float32)
        cx /= np.linalg.norm(cx, axis=1, keepdims=True)
        sel = (ids // CHUNK) == ci
        x[sel] = cx[ids[sel] - int(ci) * CHUNK]
    log(f"candidate rows regenerated ({uniq_chunks.size} chunks)")

    # exact scores per (query, candidate)
    s_exact = np.einsum("qd,qcd->qc", qn,
                        x.reshape(nq, cand, D)).astype(np.float32)
    # sanity vs cached gold values
    log(f"exact-score check max|Δ| vs gold_dv = "
        f"{np.abs(s_exact - gold_dv).max():.2e}")

    gap = gold_dv[:, 9] - gold_dv[:, 10]
    log(f"rank-10 gap: median {np.median(gap):.5f} p10 "
        f"{np.percentile(gap, 10):.5f}")

    # --- actual stored int8 reconstruction -------------------------------
    # stream the 8.8 GB values array cluster-block-wise to keep RSS low
    vals = z["values"]        # lazy npz member -> loads fully; 8.8 GB ok
    scales = z["scales"]
    log("stored int8 values loaded")
    stored_scores = np.zeros(ids.size, np.float32)
    q_rep = np.repeat(qn, cand, axis=0)           # [ids, D] query per cand
    icl = in_cluster
    vi = vals[cl[icl], slot[icl]].astype(np.float32)   # [m, D]
    si = scales[cl[icl], slot[icl]]
    stored_scores[icl] = (np.einsum("md,md->m", q_rep[icl], vi) * si
                         + np.einsum("md,md->m", q_rep[icl], cen[cl[icl]]))
    ofv = z["of_values"]; ofs = z["of_scales"]
    vo = ofv[of_idx[in_of]].astype(np.float32)
    stored_scores[in_of] = (np.einsum("md,md->m", q_rep[in_of], vo)
                            * ofs[of_idx[in_of]])
    del vals, ofv, vi, vo
    s_stored = stored_scores.reshape(nq, cand)

    def recall10(s_approx):
        top = np.argsort(-s_approx, axis=1)[:, :10]
        hit = 0
        for qi in range(nq):
            hit += len(set(gold_di[qi, top[qi]].tolist())
                       & set(gold_di[qi, :10].tolist()))
        return hit / (10 * nq)

    err = (s_stored - s_exact).ravel()
    incl_err = (s_stored - s_exact).ravel()[icl]
    of_err = (s_stored - s_exact).ravel()[in_of]
    log(f"stored-int8: recall@10 {recall10(s_stored):.4f}  "
        f"sigma all {err.std():.2e} in-cluster {incl_err.std():.2e} "
        f"overflow {of_err.std():.2e}")

    # --- quantizer variants (simulated at equal memory) -------------------
    # residual every candidate sees: in-cluster rows vs their placed
    # centroid; overflow rows vs their NEAREST centroid (the proposed
    # residual-overflow change — q@centroid for every list is already
    # computed by the search, so scoring cost is identical).
    c_near = np.empty(ids.size, np.int64)
    c_near[icl] = cl[icl]
    if in_of.any():
        sims = x[in_of] @ cen.T                     # [m_of, nlist]
        c_near[in_of] = np.argmax(sims, axis=1)
        del sims
    resid = x - cen[c_near]

    def sim(r, groups=1, clip=None, of_resid=True, bits=8):
        """Quantize r per-row (optionally per-group scales / clipped
        absmax), rebuild scores, return recall@10."""
        m = r.shape[0]
        use = r.copy()
        if not of_resid:
            use[in_of] = x[in_of]                  # plain int8 overflow
        g = use.reshape(m, groups, D // groups)
        if clip is None:
            amax = np.abs(g).max(axis=2)
        else:
            amax = clip * np.abs(g).std(axis=2) + 1e-12
        qmax = (1 << (bits - 1)) - 1
        sc = np.where(amax > 0, amax, 1.0) / qmax
        qv = np.clip(np.rint(g / sc[:, :, None]), -qmax, qmax)
        deq = (qv * sc[:, :, None]).reshape(m, D)
        s = np.einsum("md,md->m", q_rep, deq)
        s[icl] += np.einsum("md,md->m", q_rep[icl], cen[c_near[icl]])
        if of_resid:
            s[in_of] += np.einsum("md,md->m", q_rep[in_of],
                                  cen[c_near[in_of]])
        e = (s - s_exact.ravel()).std()
        return recall10(s.reshape(nq, cand)), e

    variants = [
        ("current (sim: row absmax, of plain)", dict(groups=1, of_resid=False)),
        ("of-residual", dict(groups=1)),
        ("group64 scales", dict(groups=D // 64, of_resid=False)),
        ("of-residual + group64", dict(groups=D // 64)),
        ("of-residual + group128", dict(groups=D // 128)),
        ("of-residual + clip2.5", dict(groups=1, clip=2.5)),
        ("of-residual + group64 + clip2.5", dict(groups=D // 64, clip=2.5)),
        ("of-residual + group64 + clip3.0", dict(groups=D // 64, clip=3.0)),
        ("bf16 bound (16-bit)", dict(groups=1, bits=16)),
    ]
    out = {"stored_recall": recall10(s_stored),
           "gold_overflow_frac": frac_of,
           "rank10_gap_median": float(np.median(gap)),
           "sigma_stored": float(err.std()), "variants": {}}
    for name, kw in variants:
        r, e = sim(resid, **kw)
        out["variants"][name] = {"recall10": round(r, 4),
                                 "sigma": float(e)}
        log(f"{name:38s} recall@10 {r:.4f} sigma {e:.2e}")

    with open(os.path.join(ROOT, ".bench10m_cache", "diag_recall.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    log("wrote .bench10m_cache/diag_recall.json")


if __name__ == "__main__":
    main()
