"""CPU re-evaluation of the saved retriever + reranker checkpoints.

Recomputes the retrieve-20 -> rerank -> recall@10 numbers (pure-CE and
the serving-default fused ranking) from checkpoints on disk — no TPU
claim, so it can run while the device benches something else.

    JAX_PLATFORMS=cpu python scripts/rerank_eval_cpu.py [ckpt_base]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main() -> None:
    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)

    from super_rag_tpu.models.cross_encoder import CrossEncoder
    from super_rag_tpu.models.encoder_service import (
        EncoderService,
        load_params,
    )
    from super_rag_tpu.models.subword import BPETokenizer
    from super_rag_tpu.train.corpus import harvest_docstrings
    from super_rag_tpu.train.pairs import ict_pairs
    from super_rag_tpu.train.rerank import rerank_with_ce

    base = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "checkpoints", "encoder_semantic")

    # identical split to scripts/semantic_eval.py (same seeds)
    rng = np.random.default_rng(0)
    docs = harvest_docstrings()
    rng.shuffle(docs)
    n_eval = min(1000, len(docs) // 5)
    eval_docs, train_docs = docs[:n_eval], docs[n_eval:]
    eval_pairs = list(ict_pairs(eval_docs, np.random.default_rng(1),
                                min_sentences=3))[:500]
    distractors = train_docs[:4000]
    texts = [p.positive for p in eval_pairs] + distractors
    gold = list(range(len(eval_pairs)))
    queries = [p.query for p in eval_pairs]

    svc = EncoderService.from_checkpoint(base)
    tok = svc.tokenizer
    q_emb = np.asarray(svc.embed(queries))
    d_emb = np.asarray(svc.embed(texts))

    ce_params, ce_cfg = load_params(base + "_reranker")
    ce_model = CrossEncoder(ce_cfg)
    ce_tok_path = base + "_reranker.tokenizer.json"
    ce_tok = (BPETokenizer.load(ce_tok_path)
              if os.path.exists(ce_tok_path) else tok)

    sims = q_emb @ d_emb.T  # [500, 4500]
    top = 20
    n = len(queries)
    hits10 = hits_rr = hits_fused = hits_top = 0

    def zs(x):
        x = np.asarray(x, np.float64)
        s = x.std()
        return (x - x.mean()) / (s if s > 1e-9 else 1.0)

    for j in range(n):
        cand = np.argsort(-sims[j])[:top].tolist()
        g = gold[j]
        hits10 += g in cand[:10]
        hits_top += g in cand
        if g in cand:
            s = rerank_with_ce(ce_model, ce_params, ce_tok, queries[j],
                               [texts[c] for c in cand], max_len=128)
            if g in [cand[i] for i in np.argsort(-s)[:10]]:
                hits_rr += 1
            fused = zs(s) + zs(sims[j][cand])
            if g in [cand[i] for i in np.argsort(-fused)[:10]]:
                hits_fused += 1
    out = {
        "retriever_recall_at_10": round(hits10 / n, 4),
        "rerank_recall_at_10": round(hits_rr / n, 4),
        "fused_rerank_recall_at_10": round(hits_fused / n, 4),
        "retriever_recall_at_20_ceiling": round(hits_top / n, 4),
        "n_queries": n,
    }
    print(json.dumps(out))
    # fold into the published record
    sem_path = os.path.join(ROOT, "SEMANTIC_EVAL.json")
    if os.path.exists(sem_path) and os.environ.get("SEM_PUBLISH", "1") == "1":
        with open(sem_path) as fh:
            rec = json.load(fh)
        rec.update(out)
        with open(sem_path, "w") as fh:
            json.dump(rec, fh, indent=1)


if __name__ == "__main__":
    main()
