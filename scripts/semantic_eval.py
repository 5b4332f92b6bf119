"""Train the on-TPU encoder on in-domain ICT pairs, then measure held-out
semantic recall@10 vs the hash embedder (VERDICT r1 item 5).

Corpus: package docstrings (train/corpus.py — offline, always present).
Split: eval docs are NEVER seen in training.  Eval task: a held-out
sentence queries its source paragraph among all eval paragraphs plus
train-paragraph distractors — the standard ICT evaluation.

    python scripts/semantic_eval.py [steps] [out_ckpt]

Writes SEMANTIC_EVAL.json at the repo root; bench.py folds it into its
extras when present.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:  # `python scripts/...` puts scripts/ first
    sys.path.insert(0, ROOT)


def _norm_text(t: str) -> str:
    return " ".join(t.split()).lower()


def gold_sets(gold: list[int], corpus_texts: list[str]) -> list[set[int]]:
    """Text-aware gold: the docstring corpus contains EXACT duplicate
    passages (the same docstring shipped by several packages), so an
    index-level gold counts a text-identical duplicate of the right
    answer as a miss — metric noise that penalizes retriever and
    reranker alike (and the reranker more, since duplicates of the
    positive are its hardest candidates).  A hit is any returned index
    whose normalized text equals the gold passage's text — the same
    text-equality contract the reference's merge dedup uses
    (super_rag/nodeflow/runners/merge.py:61)."""
    by_text: dict[str, set[int]] = {}
    for i, t in enumerate(corpus_texts):
        by_text.setdefault(_norm_text(t), set()).add(i)
    return [by_text[_norm_text(corpus_texts[g])] for g in gold]


def recall_at_k(query_emb, doc_emb, gold_ok: list[set[int]], k=10,
                block=8192):
    import jax
    import jax.numpy as jnp

    from super_rag_tpu.ops.dense import build_corpus, dense_search

    corpus = build_corpus(jnp.asarray(doc_emb), dtype=jnp.float32)
    hits = 0
    for i in range(0, len(query_emb), 256):
        qb = jnp.asarray(query_emb[i: i + 256])
        _, idx = dense_search(qb, corpus, k=k, block_size=block)
        idx = np.asarray(idx)
        for j, ok in enumerate(gold_ok[i: i + 256]):
            if ok.intersection(idx[j].tolist()):
                hits += 1
    return hits / len(query_emb)


def main() -> None:
    import jax

    # the axon sitecustomize overrides JAX_PLATFORMS; re-force it so
    # `JAX_PLATFORMS=cpu python scripts/semantic_eval.py` really runs CPU
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.models.encoder import EncoderConfig, TextEncoder
    from super_rag_tpu.models.encoder_service import (
        EncoderService,
        save_params,
    )
    from super_rag_tpu.models.hash_embedder import HashEmbedder
    from super_rag_tpu.models.tokenization import HashTokenizer
    from super_rag_tpu.train.contrastive import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )
    from super_rag_tpu.train.corpus import (
        DEFAULT_PACKAGES,
        harvest_docstrings,
    )
    from super_rag_tpu.train.pairs import Pair, ict_pairs, pairs_to_batches

    on_tpu = jax.default_backend() not in ("cpu",)
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else (4000 if on_tpu else 60)
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ROOT, "checkpoints", "encoder_semantic"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)

    rng = np.random.default_rng(0)
    # SEM_CORPUS=all widens the harvest to every site-packages package
    # (round-3 scaling run; ~2x the curated-list corpus)
    docs = harvest_docstrings(
        packages=None if os.environ.get("SEM_CORPUS") == "all"
        else DEFAULT_PACKAGES)
    rng.shuffle(docs)
    n_eval = min(1000, len(docs) // 5)
    eval_docs, train_docs = docs[:n_eval], docs[n_eval:]
    print(f"corpus: {len(train_docs)} train / {len(eval_docs)} eval docs")

    # -- eval set: held-out sentence -> source paragraph -------------------
    eval_pairs = list(ict_pairs(eval_docs, np.random.default_rng(1),
                                min_sentences=3))[:500]
    distractors = train_docs[:4000]
    eval_corpus_texts = [p.positive for p in eval_pairs] + distractors
    gold = list(range(len(eval_pairs)))
    g_ok = gold_sets(gold, eval_corpus_texts)
    dup_rate = sum(len(s) > 1 for s in g_ok) / len(g_ok)
    queries = [p.query for p in eval_pairs]
    print(f"eval: {len(eval_pairs)} queries over "
          f"{len(eval_corpus_texts)} passages "
          f"({dup_rate:.1%} of golds have text duplicates)")

    # -- baseline: hash embedder -------------------------------------------
    dim = 256
    hasher = HashEmbedder(dim=dim)
    r_hash = recall_at_k(
        np.asarray(hasher.embed(queries)),
        np.asarray(hasher.embed(eval_corpus_texts)), g_ok,
    )
    print(f"hash embedder recall@10: {r_hash:.4f}")

    # -- train ---------------------------------------------------------------
    n_layers = int(os.environ.get("SEM_LAYERS", "4"))
    enc_cfg = EncoderConfig(
        vocab_size=30522, hidden_dim=dim, num_layers=n_layers, num_heads=8,
        mlp_dim=1024, max_len=128,
    )
    model = TextEncoder(enc_cfg)
    tok_kind = os.environ.get("SEM_TOKENIZER", "bpe")
    reuse_encoder = (os.environ.get("SEM_REUSE_ENCODER") == "1"
                     and os.path.exists(out + ".tokenizer.json"))
    if reuse_encoder and tok_kind == "bpe":
        # the checkpoint's token ids are only meaningful under the
        # tokenizer it was TRAINED with: retraining BPE here is safe
        # only while the harvest corpus is byte-identical (deterministic
        # merges) — the r5 CE-only run hit exactly that trap (corpus
        # grew, fresh BPE clobbered the copied sidecar via the save
        # below, reused encoder read the new ids, recall 0.532 -> 0.054)
        from super_rag_tpu.models.subword import BPETokenizer

        tok = BPETokenizer.load(out + ".tokenizer.json")
        print(f"BPE tokenizer: sidecar reused ({tok.vocab_size} ids)",
              flush=True)
    elif tok_kind == "bpe":
        # in-domain subword vocabulary trained on the TRAIN split only
        # (models/subword.py): morphological sharing + no hash collisions
        from super_rag_tpu.models.subword import train_bpe

        t0 = time.time()
        tok = train_bpe(train_docs, vocab_size=enc_cfg.vocab_size)
        tok.save(out + ".tokenizer.json")
        print(f"BPE tokenizer: {tok.vocab_size} ids "
              f"({len(tok.merges)} merges, {time.time() - t0:.0f}s)",
              flush=True)
    else:
        tok = HashTokenizer(vocab_size=enc_cfg.vocab_size)
    tcfg = TrainConfig(learning_rate=3e-4,
                       warmup_steps=max(20, steps // 20),
                       total_steps=steps)
    state = create_train_state(model, jax.random.PRNGKey(0), tcfg)
    step = make_train_step(model, tcfg)

    # two ICT draws per chunk + the ORQA 10% keep rate: more pairs, and
    # a slice of the objective that rewards lexical matching too
    pairs = list(ict_pairs(train_docs, rng, samples_per_chunk=2,
                           keep_prob=0.1))
    rng.shuffle(pairs)
    print(f"{len(pairs)} train pairs")
    t0 = time.time()
    done = 0
    epoch = 0
    batch_size = 256 if on_tpu else 16
    last = {}
    if os.environ.get("SEM_REUSE_ENCODER") == "1":
        # iterate on the downstream stages (reranker) without re-running
        # the 12k-step encoder train: load the saved checkpoint + its
        # tokenizer sidecar
        from super_rag_tpu.models.encoder_service import load_params
        from super_rag_tpu.models.subword import BPETokenizer

        enc_params, enc_cfg = load_params(out)
        model = TextEncoder(enc_cfg)
        if not isinstance(tok, BPETokenizer):
            tok = BPETokenizer.load(out + ".tokenizer.json")
        state = state._replace(params=enc_params)
        steps = 0  # skip the training loop below
        last = {"accuracy": float("nan")}
        # carry the ORIGINAL training run's stats forward: the shipped
        # eval json must reflect how the reused checkpoint was trained,
        # not this run's zero steps (VERDICT r2 weak #4)
        try:
            with open(out + ".eval.json") as f:
                prior = json.load(f)
            report_steps = int(prior.get("train_steps", 0))
            prior_train_s = float(prior.get("train_seconds", 0.0))
            last = {"accuracy": prior.get("final_train_accuracy",
                                          float("nan"))}
        except (OSError, ValueError):
            report_steps = 0
            prior_train_s = 0.0
        print("reusing encoder checkpoint", flush=True)
    else:
        report_steps = steps
        prior_train_s = None
    while done < steps:
        epoch += 1
        rng.shuffle(pairs)  # fresh in-batch negative composition per epoch
        for batch in pairs_to_batches(pairs, tok, batch_size=batch_size,
                                      max_len=128):
            state, metrics = step(
                state, {k: jnp.asarray(v) for k, v in batch.items()}
            )
            done += 1
            if done % 100 == 0 or done == steps:
                last = {k: float(v) for k, v in metrics.items()}
                print(f"step {done}/{steps} epoch {epoch}: "
                      f"loss={last.get('loss', 0):.4f} "
                      f"acc={last.get('accuracy', 0):.3f}", flush=True)
            if done >= steps:
                break
    train_s = time.time() - t0

    save_params(state.params, out, enc_cfg)
    svc = EncoderService(cfg=enc_cfg, params=state.params, tokenizer=tok)
    q_emb_tr = np.asarray(svc.embed(queries))
    d_emb_tr = np.asarray(svc.embed(eval_corpus_texts))
    r_trained = recall_at_k(q_emb_tr, d_emb_tr, g_ok)
    print(f"trained encoder recall@10: {r_trained:.4f}")

    # -- stage 2 (SEM_RERANK=1): train the cross-encoder on hard negatives
    # mined from the trained retriever, then measure retrieve-20 ->
    # rerank -> recall@10 end to end (VERDICT r1: reranker weights)
    rerank_metrics = {}
    if os.environ.get("SEM_RERANK") == "1":
        from super_rag_tpu.models.cross_encoder import CrossEncoder
        from super_rag_tpu.train.rerank import (
            RerankTrainConfig,
            ce_batches,
            create_ce_state,
            make_ce_train_step,
            mine_hard_negatives,
            rerank_with_ce,
        )

        reuse_ce = os.environ.get("SEM_REUSE_CE") == "1"
        ce_steps = int(os.environ.get("SEM_RERANK_STEPS",
                                      "1500" if on_tpu else "3"))
        # keep CE training under ~one epoch of the mined set: 2500 steps
        # x 16 queries/step = 40k query-groups; a 12k-pair set meant ~4
        # epochs and a memorized CE that generalized below the retriever
        mine_cap = int(os.environ.get("SEM_MINE_PAIRS",
                                      str(max(40000, ce_steps * 16))))
        mine_pairs = pairs[: (mine_cap if on_tpu else 200)]
        # train the CE on the SERVING distribution: groups are the
        # retriever's own top candidates (1 pos + n hard wrong answers),
        # the exact 20-way task it faces at rerank time.  r3's 4-hard +
        # 3-random groups trained an 8-way classifier dominated by easy
        # negatives and it generalized below the retriever.
        n_negs = int(os.environ.get("SEM_CE_NEGS", "19" if on_tpu else "7"))
        # ONE pair length everywhere (train = eval = serving): the
        # backbone position table is Embed(cfg.max_len) and XLA clips
        # OOB gathers, so any longer tokenization silently reuses the
        # last position embedding — r3 trained at 160 over a 128 table.
        ce_len = enc_cfg.max_len
        ce_model = CrossEncoder(enc_cfg)
        if reuse_ce:
            # iterate on the EVAL without re-mining/re-training the CE:
            # load the saved reranker checkpoint + carry its train stats
            from super_rag_tpu.models.encoder_service import load_params
            from super_rag_tpu.train.rerank import CEState

            ce_params, _ = load_params(out + "_reranker")
            ce_state = CEState(params=ce_params, opt_state=None,
                               step=jnp.zeros((), jnp.int32))
            ce_last = {}
            try:
                with open(out + ".eval.json") as f:
                    prior = json.load(f)
                ce_steps = int(prior.get("rerank_train_steps", ce_steps))
                ce_last = {"accuracy": prior.get("final_ce_accuracy")}
            except (OSError, ValueError):
                pass
            print("reusing CE checkpoint", flush=True)
        else:
            t0 = time.time()
            # false-negative denoising (RocketQA recipe): sample the
            # group from a wider band after dropping the very hardest —
            # SEM_NEG_BAND=0 restores take-the-hardest
            neg_band = int(os.environ.get("SEM_NEG_BAND", "0")) or None
            neg_skip = int(os.environ.get("SEM_NEG_SKIP", "0"))
            hard = mine_hard_negatives(
                mine_pairs, svc.embed, n_hard=n_negs, band=neg_band,
                skip_hardest=neg_skip, rng=np.random.default_rng(7))
            print(f"mined {n_negs} negatives (band={neg_band} "
                  f"skip={neg_skip}) for {len(mine_pairs)} pairs "
                  f"({time.time() - t0:.0f}s)", flush=True)

            ce_cfg = RerankTrainConfig(
                total_steps=ce_steps, warmup_steps=max(10, ce_steps // 20),
                n_negatives=n_negs,
                # warm-started backbone: the r2 default 2e-4 left CE
                # accuracy noise-bound at ~0.35; fine-tune-scale lr trains
                learning_rate=float(os.environ.get("SEM_CE_LR", "7e-5")),
            )
            ce_state = create_ce_state(
                ce_model, jax.random.PRNGKey(1), ce_cfg,
                backbone_params=state.params["backbone"])
            ce_step = make_ce_train_step(ce_model, ce_cfg)
            done_ce, ce_last = 0, {}
            crng = np.random.default_rng(2)
            bq = max(1, (160 if on_tpu else 32) // (1 + n_negs))
            while done_ce < ce_steps:
                for batch in ce_batches(mine_pairs, hard, tok, crng, ce_cfg,
                                        batch_queries=bq, max_len=ce_len):
                    ce_state, m = ce_step(
                        ce_state,
                        {k: jnp.asarray(v) for k, v in batch.items()}
                    )
                    done_ce += 1
                    if done_ce % 100 == 0 or done_ce == ce_steps:
                        ce_last = {k: float(v) for k, v in m.items()}
                        print(f"ce step {done_ce}/{ce_steps}: "
                              f"loss={ce_last['loss']:.4f} "
                              f"acc={ce_last['accuracy']:.3f}", flush=True)
                    if done_ce >= ce_steps:
                        break
            save_params(ce_state.params, out + "_reranker", enc_cfg)
            tok.save(out + "_reranker.tokenizer.json")  # serving sidecar

        # retrieve top-20 with the trained encoder, rerank, recall@10
        from super_rag_tpu.ops.dense import build_corpus, dense_search
        import jax.numpy as jnp_

        corpus = build_corpus(jnp_.asarray(d_emb_tr), dtype=jnp_.float32)
        top = 20
        hits10, hits_rr, hits_fused, hits_top = 0, 0, 0, 0
        n_eval_rr = len(queries) if on_tpu else 20

        def zs(x):
            x = np.asarray(x, np.float64)
            s = x.std()
            return (x - x.mean()) / (s if s > 1e-9 else 1.0)

        for lo in range(0, n_eval_rr, 128):
            # clamp to n_eval_rr: the CPU sanity path evaluates 20
            # queries — slicing a full 128 here inflated every rerank
            # ratio by 6.4x (denominator stayed n_eval_rr)
            qb = jnp_.asarray(q_emb_tr[lo : min(lo + 128, n_eval_rr)])
            _, ids = dense_search(qb, corpus, k=top)
            ids = np.asarray(ids)
            for j in range(ids.shape[0]):
                ok = g_ok[lo + j]
                cand = ids[j].tolist()
                hits10 += bool(ok.intersection(cand[:10]))
                hits_top += bool(ok.intersection(cand))
                if ok.intersection(cand):
                    s = rerank_with_ce(
                        ce_model, ce_state.params, tok, queries[lo + j],
                        [eval_corpus_texts[c] for c in cand],
                        max_len=ce_len,
                    )
                    if ok.intersection(
                            cand[i] for i in np.argsort(-s)[:10]):
                        hits_rr += 1
                    # serving default: z-scored CE + retriever fusion
                    # (engine/collection._maybe_rerank)
                    cos = d_emb_tr[cand] @ q_emb_tr[lo + j]
                    fused = zs(s) + zs(cos)
                    if ok.intersection(
                            cand[i] for i in np.argsort(-fused)[:10]):
                        hits_fused += 1
        _acc = ce_last.get("accuracy")
        rerank_metrics = {
            "rerank_recall_at_10": round(hits_rr / n_eval_rr, 4),
            "fused_rerank_recall_at_10": round(hits_fused / n_eval_rr, 4),
            "retriever_recall_at_10": round(hits10 / n_eval_rr, 4),
            "retriever_recall_at_20_ceiling": round(hits_top / n_eval_rr, 4),
            "rerank_train_steps": ce_steps,
            "ce_reused": reuse_ce,
            "final_ce_accuracy": (round(_acc, 4)
                                  if isinstance(_acc, float)
                                  and np.isfinite(_acc) else None),
        }
        print("rerank:", rerank_metrics)

    result = {
        "eval": "ICT held-out sentence -> source paragraph",
        "eval_queries": len(eval_pairs),
        "eval_passages": len(eval_corpus_texts),
        "train_pairs": len(pairs),
        "train_steps": report_steps,
        "encoder_reused": os.environ.get("SEM_REUSE_ENCODER") == "1",
        "train_seconds": round(prior_train_s if prior_train_s is not None
                               else train_s, 1),
        "backend": jax.default_backend(),
        "semantic_recall_at_10_trained": round(r_trained, 4),
        "semantic_recall_at_10_hash": round(r_hash, 4),
        "gold_dup_rate": round(dup_rate, 4),
        # None (not NaN — NaN is not valid JSON) when no record exists
        "final_train_accuracy": (
            round(last["accuracy"], 4)
            if isinstance(last.get("accuracy"), float)
            and np.isfinite(last["accuracy"]) else None),
        "checkpoint": out + ".npz",
        **rerank_metrics,
    }
    with open(out + ".eval.json", "w") as f:
        json.dump(result, f, indent=1)
    # publish to the repo-root file bench.py folds into its extras only
    # for real (TPU or explicitly requested) runs — CPU sanity runs must
    # not clobber the recorded result; SEM_PUBLISH=0 suppresses even on
    # TPU (the r5 stage publishes via its own improved-only promotion)
    pub = os.environ.get("SEM_PUBLISH")
    if (jax.default_backend() != "cpu" and pub != "0") or pub == "1":
        with open(os.path.join(ROOT, "SEMANTIC_EVAL.json"), "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
