"""Cross-encoder reranker training: listwise softmax over mined negatives.

The reference's reranker is a remote API (super_rag/llm/rerank/
rerank_service.py:95-104); an on-TPU reranker needs trainable weights.
Standard recipe: for each (query, positive) pair, score the positive
against N negatives in one forward batch and cross-entropy the softmax
toward the positive.  Negatives are HARD — mined from the trained dual
encoder's own top-k (the two-stage retrieve-then-rerank training loop) —
plus random ones for stability.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterator, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from super_rag_tpu.models.cross_encoder import CrossEncoder
from super_rag_tpu.train.pairs import Pair


@dataclass(frozen=True)
class RerankTrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    warmup_steps: int = 100
    grad_clip: float = 1.0
    total_steps: Optional[int] = None
    n_negatives: int = 7


class CEState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _optimizer(cfg: RerankTrainConfig) -> optax.GradientTransformation:
    if cfg.total_steps:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps,
            max(cfg.total_steps, cfg.warmup_steps + 1),
            end_value=cfg.learning_rate * 0.02,
        )
    else:
        sched = optax.linear_schedule(0.0, cfg.learning_rate,
                                      cfg.warmup_steps)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(sched, weight_decay=cfg.weight_decay),
    )


def create_ce_state(model: CrossEncoder, rng: jax.Array,
                    cfg: RerankTrainConfig,
                    backbone_params=None) -> CEState:
    """``backbone_params``: warm-start the transformer backbone from the
    TRAINED dual encoder (same Backbone module) — a from-scratch CE has
    to relearn token matching and stays at chance for thousands of
    steps, while a retriever-initialized one only learns the pair head
    (the standard retriever->reranker init)."""
    params = model.init_params(rng)
    if backbone_params is not None:
        params = dict(params)
        params["backbone"] = jax.tree.map(jnp.asarray, backbone_params)
    return CEState(params=params, opt_state=_optimizer(cfg).init(params),
                   step=jnp.zeros((), jnp.int32))


def make_ce_train_step(model: CrossEncoder, cfg: RerankTrainConfig):
    """batch: ids/mask/type_ids of shape [B*(1+n), S]; candidate 0 of each
    group is the positive.  Returns (state, {loss, accuracy})."""
    opt = _optimizer(cfg)
    group = 1 + cfg.n_negatives

    def loss_fn(params, batch):
        scores = model.apply(
            {"params": params}, batch["ids"], batch["mask"],
            batch.get("type_ids"),
        )  # [B*group]
        scores = scores.reshape(-1, group)
        labels = jnp.zeros(scores.shape[0], jnp.int32)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            scores, labels
        ).mean()
        acc = jnp.mean(jnp.argmax(scores, axis=-1) == labels)
        return loss, acc

    @jax.jit
    def step_fn(state: CEState, batch: dict):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            CEState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "accuracy": acc},
        )

    return step_fn


def mine_hard_negatives(
    pairs: Sequence[Pair],
    embed_fn,  # callable texts -> [N, D] unit-norm np array
    n_hard: int = 4,
    block: int = 2048,
    max_overlap: float = 0.6,
    band: Optional[int] = None,
    skip_hardest: int = 0,
    rng: Optional[np.random.Generator] = None,
) -> list[list[int]]:
    """For each pair, indices (into ``pairs``) of the encoder's strongest
    WRONG positives for its query — the negatives that actually teach the
    reranker to out-rank its own retriever.

    ``band``/``skip_hardest`` denoise false negatives (the RocketQA
    observation: the retriever's VERY top wrong answers are often
    actually relevant, and training against them teaches the CE to
    suppress right answers).  With ``band=B``, negatives are sampled
    from the filtered top-B candidates after dropping the first
    ``skip_hardest``, instead of taking the absolute hardest ones.

    ``max_overlap`` drops candidates whose word-set Jaccard overlap with
    the true positive exceeds the threshold: corpora with boilerplate
    (docstrings, legal templates) surface near-duplicates of the positive
    as the retriever's top wrong answers, and labeling those "negative"
    is noise that pins the listwise loss at chance level."""
    import jax.numpy as jnp_

    from super_rag_tpu.ops.dense import build_corpus, dense_search

    docs = [p.positive for p in pairs]
    d_emb = np.asarray(embed_fn(docs))
    q_emb = np.asarray(embed_fn([p.query for p in pairs]))
    corpus = build_corpus(jnp_.asarray(d_emb), dtype=jnp_.float32)
    word_sets = [frozenset(d.lower().split()) for d in docs]
    out: list[list[int]] = []
    # extra headroom: some candidates get filtered
    k = band if band else (n_hard * 2 + 1)
    k = max(k, n_hard + skip_hardest + 1)
    for lo in range(0, len(pairs), block):
        q = jnp_.asarray(q_emb[lo : lo + block])
        _, ids = dense_search(q, corpus, k=min(k, len(pairs)))
        ids = np.asarray(ids)
        for row, qi in enumerate(range(lo, min(lo + block, len(pairs)))):
            pos_words = word_sets[qi]
            cands = []
            for x in ids[row]:
                x = int(x)
                if x == qi or x < 0:
                    continue
                inter = len(pos_words & word_sets[x])
                union = len(pos_words | word_sets[x]) or 1
                if inter / union > max_overlap:
                    continue  # near-duplicate of the positive: skip
                cands.append(x)
            cands = cands[skip_hardest:]
            if band and rng is not None and len(cands) > n_hard:
                sel = rng.choice(len(cands), size=n_hard, replace=False)
                negs = [cands[i] for i in sorted(sel)]
            else:
                negs = cands[:n_hard]
            out.append(negs)
    return out


def ce_batches(
    pairs: Sequence[Pair],
    hard_negs: Sequence[Sequence[int]],
    tokenizer,
    rng: np.random.Generator,
    cfg: RerankTrainConfig,
    batch_queries: int = 16,
    max_len: int = 160,
) -> Iterator[dict]:
    """Pack [B*(1+n), S] pair batches: positive first, then hard negatives
    topped up with random ones."""
    order = rng.permutation(len(pairs))
    for lo in range(0, len(order) - batch_queries + 1, batch_queries):
        qs, ds = [], []
        for qi in order[lo : lo + batch_queries]:
            qi = int(qi)
            cands = [qi] + list(hard_negs[qi])[: cfg.n_negatives]
            # top up with random negatives; once the distinct pool is
            # exhausted (tiny corpora, large n_negatives) repeat existing
            # negatives instead of spinning forever on uniqueness
            while len(cands) < 1 + cfg.n_negatives and len(cands) < len(pairs):
                r = int(rng.integers(0, len(pairs)))
                if r != qi and r not in cands:
                    cands.append(r)
            while len(cands) < 1 + cfg.n_negatives:
                cands.append(cands[1 + int(rng.integers(0, len(cands) - 1))]
                             if len(cands) > 1 else qi)
            for ci in cands:
                qs.append(pairs[qi].query)
                ds.append(pairs[ci].positive)
        ids, mask, tt = tokenizer.encode_pairs(qs, ds, max_len=max_len)
        yield {"ids": ids, "mask": mask, "type_ids": tt}


def rerank_with_ce(
    model: CrossEncoder,
    params,
    tokenizer,
    query: str,
    docs: Sequence[str],
    max_len: int = 160,
    batch: int = 256,
) -> np.ndarray:
    """Scores for one query against candidate docs (descending = better)."""
    scores = []
    for lo in range(0, len(docs), batch):
        chunk = docs[lo : lo + batch]
        ids, mask, tt = tokenizer.encode_pairs([query] * len(chunk), chunk,
                                               max_len=max_len)
        s = model.apply({"params": params}, jnp.asarray(ids),
                        jnp.asarray(mask), jnp.asarray(tt))
        scores.append(np.asarray(s))
    return np.concatenate(scores)
