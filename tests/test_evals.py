"""Retrieval evaluation metrics + nodeflow registry."""

import jax.numpy as jnp

from super_rag_tpu.engine.collection import CollectionEngine
from super_rag_tpu.engine.index import IndexSpec
from super_rag_tpu.evals import LabeledQuery, evaluate_engine


def test_evaluate_engine():
    eng = CollectionEngine(IndexSpec(dim=64, dtype=jnp.float32,
                                     vocab_size=1 << 14))
    eng.ingest(
        ["the fox jumps over the dog",
         "systolic arrays multiply matrices",
         "reciprocal rank fusion merges lists"],
        metadata=[{"document_id": f"doc{i}"} for i in range(3)],
    )
    labeled = [
        LabeledQuery("fox and dog", {"doc0"}),
        LabeledQuery("matrix multiplication hardware", {"doc1"}),
        LabeledQuery("rank fusion", {"doc2"}),
    ]
    report = evaluate_engine(eng, labeled, ks=(1, 3))
    assert report.n_queries == 3
    assert report.recall_at_k[3] >= report.recall_at_k[1]
    assert report.recall_at_k[1] >= 2 / 3  # hash embedder finds most
    assert 0 < report.mrr <= 1
    assert 0 < report.ndcg_at_10 <= 1
    d = report.to_dict()
    assert set(d) == {"n_queries", "recall_at_k", "mrr", "ndcg_at_10"}


def test_registry_summary_and_packs():
    import super_rag_tpu.nodeflow.runners  # noqa: F401
    from super_rag_tpu.nodeflow.registry import (
        load_pack_module,
        load_packs,
        registry_summary,
    )

    load_packs()  # no external packs installed: must not raise
    summary = registry_summary()
    assert "hybrid_search" in summary["registered_types"]
    assert not load_pack_module("nonexistent.module.path")
