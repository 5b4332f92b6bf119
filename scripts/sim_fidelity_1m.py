"""NumPy simulator of the 1M hybrid-fidelity sweep (no TPU claim needed).

Re-implements the candidate-generation + exact-rescore + RRF semantics of
ops/hybrid.py + ops/bm25_inverted.py on the exact bench corpus recipe
(bench.py / scripts/tune_fidelity.py, seed 0), to PREDICT which sweep
config clears the fidelity>=0.95 bar BEFORE spending TPU claim time.

Faithfulness notes (what is and isn't bit-exact vs the device):
  - corpus, queries, df/idf, build-time truncation (impact-ordered,
    stable lowest-doc-first on tied impacts): exact same arrays.
  - int8 dense branch: per-row symmetric quantization + integer dot
    (f32 integer math is exact to 2^24 > max |sum|), per-tile-k
    extraction simulated tile-for-tile.
  - bf16 postings-impact rounding and approx_max_k generation are NOT
    simulated (both only perturb marginal pool membership; the exact
    rescore stage restores ranks — kernels.md measured approx as
    fidelity-neutral).  Expect ±0.01 noise vs device numbers.
  - calibration anchors: the round-2 measured frontier rows
    (docs/design/kernels.md) are re-simulated and printed next to their
    measured values so the sim's bias is visible in the output.

Run: MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824 \
     python -u scripts/sim_fidelity_1m.py [--small]
Writes SIM_FIDELITY_1M.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

K1, B = 1.2, 0.75
RRF_K = 60.0


def t(msg, t0=[time.time()]):
    now = time.time()
    print(f"[{now - t0[0]:7.1f}s] {msg}", flush=True)


def topk_lowid(scores: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Top-k ids by (score desc, id asc) — the device tie-break after an
    id-ascending pre-sort feeds lax.top_k (first position wins)."""
    order = np.lexsort((ids, -scores))[:k]
    return ids[order], scores[order]


def main() -> None:
    small = "--small" in sys.argv
    n = 50_000 if small else 1_000_000
    d = 64 if small else 768
    vocab = (1 << 14) if small else (1 << 17)
    slots = 64
    batch = 512
    sample = 16 if small else 64
    k, cand = 10, 100
    p_build = max(256, n // 500)

    rng = np.random.default_rng(0)
    t(f"n={n} d={d} vocab={vocab} p_build={p_build}")
    emb = rng.standard_normal((n, d), dtype=np.float32)
    nrm = np.linalg.norm(emb, axis=1, keepdims=True)
    emb /= np.where(nrm > 0, nrm, 1.0)
    # int8 per-row symmetric quantization (ops/quant.py)
    absmax = np.max(np.abs(emb), axis=1)
    scale_e = (absmax / 127.0).astype(np.float32)
    safe = np.where(scale_e > 0, scale_e, 1.0)
    emb_i8 = np.clip(np.round(emb / safe[:, None]), -127, 127).astype(np.int8)
    t("dense corpus built (f32 + int8)")

    zipf_raw = rng.zipf(1.3, size=(n, slots)).astype(np.int64)
    terms = ((zipf_raw - 1) % vocab).astype(np.int32)
    del zipf_raw
    tfs = np.minimum(rng.zipf(2.0, size=(n, slots)), 8).astype(np.float32)
    pad_mask = rng.random((n, slots)) < 0.2
    terms[pad_mask] = vocab
    tfs[pad_mask] = 0.0
    del pad_mask
    doc_len = tfs.sum(1) * 2.0 + 1.0
    avgdl = float(doc_len.mean())
    norm_doc = K1 * (1.0 - B + B * doc_len / max(avgdl, 1e-6))
    t("lexical corpus built")

    # df over per-doc UNIQUE terms (tune_fidelity.py recipe)
    sorted_terms = np.sort(terms, axis=1)
    first = np.ones_like(sorted_terms, bool)
    first[:, 1:] = sorted_terms[:, 1:] != sorted_terms[:, :-1]
    uniq_flat = sorted_terms[first]
    df = np.bincount(uniq_flat[uniq_flat < vocab], minlength=vocab + 1)
    idf_table = np.log(1.0 + (n - df + 0.5) / (df + 0.5)).astype(np.float32)
    del sorted_terms, first, uniq_flat
    t("df/idf built")

    queries = rng.standard_normal((batch, d), dtype=np.float32)
    q_rows = rng.integers(0, n, batch)
    df_cap = max(64, n // 50)

    def build_queries(qn: int):
        q_terms = np.full((sample, qn), vocab, np.int32)
        for bi in range(sample):
            row = q_rows[bi]
            uniq = [x for x in dict.fromkeys(terms[row].tolist())
                    if x != vocab and df[x] <= df_cap][:qn]
            q_terms[bi, : len(uniq)] = uniq
        q_idf = np.where(q_terms != vocab,
                         idf_table[np.minimum(q_terms, vocab)],
                         0.0).astype(np.float32)
        return q_terms, q_idf

    # full postings, impact-ordered per term (build_inverted semantics:
    # lexsort by (term asc, impact desc), stable -> lowest doc id first
    # among tied impacts)
    impact = (tfs * (K1 + 1.0) / (tfs + norm_doc[:, None])).astype(np.float32)
    flat_terms = terms.reshape(-1)
    keep = flat_terms < vocab
    flat_terms = flat_terms[keep]
    flat_impact = impact.reshape(-1)[keep]
    flat_docs = np.repeat(np.arange(n, dtype=np.int32), slots)[keep]
    t(f"flat postings: {len(flat_terms)} entries; sorting")
    order = np.lexsort((-flat_impact, flat_terms))
    flat_terms = flat_terms[order]
    flat_impact = flat_impact[order]
    flat_docs = flat_docs[order]
    del order, impact
    # CSR run boundaries per term
    run_start = np.searchsorted(flat_terms, np.arange(vocab + 1))
    run_end = np.searchsorted(flat_terms, np.arange(vocab + 1), side="right")
    t("postings sorted")

    # dense branches (config-independent)
    qn_ = queries[:sample].copy()
    qnrm = np.linalg.norm(qn_, axis=1, keepdims=True)
    qn_ /= np.where(qnrm > 0, qnrm, 1.0)
    s_exact = qn_ @ emb.T  # [S, n] f32 exact cosine
    dense_gold = np.argsort(-s_exact, axis=1, kind="stable")[:, :cand]
    t("dense exact gold done")

    q_absmax = np.max(np.abs(qn_), axis=1)
    q_scale = np.where(q_absmax > 0, q_absmax / 127.0, 1.0)
    q_i8 = np.clip(np.round(qn_ / q_scale[:, None]), -127, 127)
    s_int = np.empty((sample, n), np.float32)
    blk = 1 << 18
    for lo in range(0, n, blk):
        s_int[:, lo: lo + blk] = q_i8 @ emb_i8[lo: lo + blk].astype(
            np.float32).T
    s_int *= scale_e[None, :]  # per-doc dequant (per-query scale is rank-inert)
    t("dense int8 scores done")

    def dense_int8_branch(ptk: int, refine_pool: int = 0) -> np.ndarray:
        """Per-tile top-ptk extraction then global top-cand (pallas_topk).

        ``refine_pool`` > 0 re-scores the top-``refine_pool`` phase-1
        candidates with the 1-bit error-refinement plane (ops/ivf.py
        pack_error_signs semantics: score = scale * (codes + 0.25*sign)
        · f32 query) and returns the refined top-cand — the IVF tier's
        refine stage applied to the flat path."""
        tile = 8192
        pad = (-n) % tile
        s_p = np.pad(s_int, ((0, 0), (0, pad)), constant_values=-np.inf)
        ntiles = s_p.shape[1] // tile
        # pallas_topk widens per-tile k so tiles can cover cand in total
        pool_k = max(cand, refine_pool)
        ptk = max(ptk, -(-pool_k // max(ntiles, 1)))
        s_t = s_p.reshape(sample, ntiles, tile)
        part = np.argpartition(-s_t, min(ptk, tile - 1), axis=2)[:, :, :ptk]
        cand_ids = (part + (np.arange(ntiles) * tile)[None, :, None]).reshape(
            sample, -1)
        cand_v = np.take_along_axis(s_p, cand_ids, axis=1)
        out = np.empty((sample, cand), np.int64)
        for i in range(sample):
            if refine_pool:
                ids_i, _ = topk_lowid(cand_v[i], cand_ids[i], refine_pool)
                ids_i = ids_i[ids_i < n]
                codes = emb_i8[ids_i].astype(np.float32)
                sgn = np.where(
                    emb[ids_i] / np.where(scale_e[ids_i] > 0,
                                          scale_e[ids_i], 1.0)[:, None]
                    - codes > 0, 1.0, -1.0).astype(np.float32)
                ref = ((codes + 0.25 * sgn) @ qn_[i]) * scale_e[ids_i]
                ids_i, _ = topk_lowid(ref, ids_i, cand)
            else:
                ids_i, _ = topk_lowid(cand_v[i], cand_ids[i], cand)
            out[i] = ids_i
        return out

    # exact BM25 gold (doc-major semantics: sum over slots idf*sat)
    def exact_scores_for(q_terms, q_idf):
        out_ids = np.empty((sample, cand), np.int64)
        acc = np.empty(n, np.float32)
        for i in range(sample):
            acc[:] = 0.0
            for tq, w in zip(q_terms[i], q_idf[i]):
                if tq >= vocab or w <= 0:
                    continue
                s0, s1 = run_start[tq], run_end[tq]
                np.add.at(acc, flat_docs[s0:s1], flat_impact[s0:s1] * w)
            pos = np.flatnonzero(acc > 0)
            if len(pos) == 0:
                out_ids[i] = -1
                continue
            ids_i, _ = topk_lowid(acc[pos], pos, cand)
            if len(ids_i) < cand:
                ids_i = np.pad(ids_i, (0, cand - len(ids_i)),
                               constant_values=-1)
            out_ids[i] = ids_i
        return out_ids

    def rrf(ids_a, ids_b, kk):
        """rrf_fuse semantics: dup merged at list-a slot, -1 never wins,
        tie-break = first concat position."""
        ka, kb = ids_a.shape[1], ids_b.shape[1]
        ca = 1.0 / (RRF_K + np.arange(ka) + 1.0)
        cb = 1.0 / (RRF_K + np.arange(kb) + 1.0)
        out = np.empty((sample, kk), np.int64)
        for i in range(sample):
            va = ids_a[i] >= 0
            vb = ids_b[i] >= 0
            match = (ids_a[i][:, None] == ids_b[i][None, :]) & va[:, None] \
                & vb[None, :]
            sa = np.where(va, ca + match @ cb, -np.inf)
            dup_b = match.any(axis=0)
            sb = np.where(vb & ~dup_b, cb, -np.inf)
            scores = np.concatenate([sa, sb])
            ids = np.concatenate([ids_a[i], ids_b[i]])
            pos = np.argsort(-scores, kind="stable")[:kk]
            got = np.where(scores[pos] > -np.inf, ids[pos], -1)
            out[i] = got
        return out

    def overlap(got, gold):
        return float(np.mean([
            len({x for x in a.tolist() if x >= 0}
                & {x for x in b.tolist() if x >= 0})
            / max(np.unique(b[b >= 0]).size, 1)
            for a, b in zip(got, gold)
        ]))

    # lexical generation under (ppq, deep_terms, deep_postings)
    def generate(q_terms, q_idf, ppq, dt, dp, lg):
        ppq = min(ppq, p_build)
        dp = min(dp or p_build, p_build)
        out = []
        for i in range(sample):
            ti, wi = q_terms[i], q_idf[i]
            live = [(x, w) for x, w in zip(ti, wi) if x < vocab and w > 0]
            # deep budget goes to the dt LOWEST-idf live terms
            by_idf = sorted(range(len(live)), key=lambda j: live[j][1])
            deep = set(by_idf[:dt])
            ids_list, w_list = [], []
            for j, (tq, w) in enumerate(live):
                capj = dp if j in deep else ppq
                s0 = run_start[tq]
                s1 = min(run_end[tq], s0 + capj)
                ids_list.append(flat_docs[s0:s1])
                w_list.append(flat_impact[s0:s1] * w)
            if not ids_list:
                out.append(np.full(lg, -1, np.int64))
                continue
            gid = np.concatenate(ids_list)
            gw = np.concatenate(w_list)
            uniq, inv = np.unique(gid, return_inverse=True)
            tot = np.bincount(inv, weights=gw)
            ids_i, _ = topk_lowid(tot.astype(np.float32), uniq.astype(np.int64),
                                  lg)
            if len(ids_i) < lg:
                ids_i = np.pad(ids_i, (0, lg - len(ids_i)), constant_values=-1)
            out.append(ids_i)
        return np.stack(out)

    # exact rescore of the pooled candidates (hybrid.py _rescored_lexical_branch)
    def rescored_branch(dense_ids, lex_ids, q_terms, q_idf):
        out = np.empty((sample, cand), np.int64)
        for i in range(sample):
            pool = np.unique(np.concatenate([dense_ids[i], lex_ids[i]]))
            pool = pool[pool >= 0]
            tr = terms[pool]  # [P, L]
            fr = tfs[pool]
            sat = fr * (K1 + 1.0) / (fr + norm_doc[pool][:, None])
            hit = tr[:, :, None] == q_terms[i][None, None, :]  # [P, L, Q]
            w = (hit * q_idf[i][None, None, :]).sum(2)
            s = (w * sat).sum(1)
            keep_ = s > 0
            if not keep_.any():
                out[i] = -1
                continue
            ids_i, _ = topk_lowid(s[keep_], pool[keep_], cand)
            if len(ids_i) < cand:
                ids_i = np.pad(ids_i, (0, cand - len(ids_i)),
                               constant_values=-1)
            out[i] = ids_i
        return out

    results = []

    def run_config(label, qn, ppq, dt, dp, lg, ptk, measured=None,
                   refine_pool=0):
        q_terms, q_idf = build_queries(qn)
        gold_lex = exact_scores_for(q_terms, q_idf)
        gold = rrf(dense_gold, gold_lex, k)
        d_branch = dense_int8_branch(ptk, refine_pool=refine_pool)
        lex_gen_ids = generate(q_terms, q_idf, ppq, dt, dp, lg)
        lex_branch = rescored_branch(d_branch, lex_gen_ids, q_terms, q_idf)
        got = rrf(d_branch, lex_branch, k)
        fid = overlap(got, gold)
        row = {"label": label, "qterms": qn, "ppq": ppq, "deep_terms": dt,
               "deep_postings": dp, "lex_gen": lg, "per_tile_k": ptk,
               "refine_pool": refine_pool,
               "sim_fidelity": round(fid, 4)}
        if measured is not None:
            row["measured_r2"] = measured
        results.append(row)
        t(json.dumps(row))

    # -- calibration anchors: round-2 measured frontier (kernels.md) -------
    run_config("cal 6t pq512 lg200 ptk8", 6, 512, 0, None, 200, 8,
               measured=0.894)
    run_config("cal 6t pq768 lg250 ptk2 (headline)", 6, 768, 0, None, 250, 2,
               measured=0.916)
    run_config("cal 6t pq1024 lg300 ptk4", 6, 1024, 0, None, 300, 4,
               measured=0.925)
    run_config("cal 6t full lg300 ptk4", 6, p_build, 0, None, 300, 4,
               measured=0.953)
    run_config("cal 16t pq256 lg200 ptk8", 16, 256, 0, None, 200, 8,
               measured=0.828)
    run_config("cal 16t full lg300 ptk8", 16, p_build, 0, None, 300, 8,
               measured=0.956)

    # -- the staged tune_fidelity sweep (16-term, lg250, ptk8) -------------
    run_config("sweep uniform256", 16, 256, 0, None, 250, 8)
    run_config("sweep uniform1024", 16, 1024, 0, None, 250, 8)
    run_config("sweep da256+4x1024", 16, 256, 4, 1024, 250, 8)
    run_config("sweep da256+4x2000", 16, 256, 4, 2000, 250, 8)

    # -- candidate configs beyond the staged list ---------------------------
    run_config("cand da256+6x2000", 16, 256, 6, 2000, 250, 8)
    run_config("cand da256+8x2000", 16, 256, 8, 2000, 250, 8)
    run_config("cand da512+4x2000", 16, 512, 4, 2000, 250, 8)
    run_config("cand da512+6x2000", 16, 512, 6, 2000, 250, 8)
    run_config("cand da256+4x2000 lg400", 16, 256, 4, 2000, 400, 8)
    run_config("cand da256+6x2000 lg400", 16, 256, 6, 2000, 400, 8)
    run_config("cand uniform2000 (full)", 16, p_build, 0, None, 250, 8)

    # -- 6-term candidates (bench.py serves BENCH_QTERMS=6 — the
    # reference analyzer emits 3-8 discriminative terms; the sweep's 16
    # uniform terms is the adversarial case).  Deep budgets on the 2-3
    # lowest-idf terms should reach full-depth fidelity at ~headline
    # sort width.
    run_config("cand6 da256+2x2000", 6, 256, 2, 2000, 250, 2)
    run_config("cand6 da256+3x2000", 6, 256, 3, 2000, 250, 2)
    run_config("cand6 da512+2x2000", 6, 512, 2, 2000, 250, 2)
    run_config("cand6 da512+3x2000", 6, 512, 3, 2000, 250, 2)
    run_config("cand6 da768+3x2000", 6, 768, 3, 2000, 250, 2)
    run_config("cand6 da512+3x2000 lg300", 6, 512, 3, 2000, 300, 2)
    run_config("cand6 da512+4x2000 lg300", 6, 512, 4, 2000, 300, 2)
    run_config("cand6 uniform2000 lg300 ptk2", 6, p_build, 0, None, 300, 2)
    run_config("cand6 da512+3x2000 lg300 ptk8", 6, 512, 3, 2000, 300, 8)

    # -- sign-plane refined dense branch (the IVF tier's refine stage on
    # the flat path): phase-1 int8 keeps winners in the pool, refine
    # re-ranks with half the quantization noise + full f32 query.
    run_config("ref6 headline pq768 lg250 +r200", 6, 768, 0, None, 250, 2,
               refine_pool=200)
    run_config("ref6 da512+3x2000 lg300 +r200", 6, 512, 3, 2000, 300, 2,
               refine_pool=200)
    run_config("ref6 da512+3x2000 lg300 +r300", 6, 512, 3, 2000, 300, 2,
               refine_pool=300)
    run_config("ref6 uniform2000 lg300 +r300", 6, p_build, 0, None, 300, 2,
               refine_pool=300)
    run_config("ref16 da256+6x2000 lg250 +r200", 16, 256, 6, 2000, 250, 8,
               refine_pool=200)
    run_config("ref16 uniform2000 lg300 +r300", 16, p_build, 0, None, 300, 8,
               refine_pool=300)

    with open(os.path.join(ROOT, "SIM_FIDELITY_1M.json"), "w") as f:
        json.dump({"n": n, "d": d, "vocab": vocab, "sample": sample,
                   "note": "NumPy simulation of tune_fidelity.py fidelity "
                           "(QPS not simulated); calibration rows carry the "
                           "round-2 measured device values",
                   "results": results}, f, indent=1)
    t("wrote SIM_FIDELITY_1M.json")


if __name__ == "__main__":
    main()
