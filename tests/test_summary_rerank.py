"""Summary index + on-device rerank service."""

import numpy as np
import pytest

from super_rag_tpu.index.summary import extractive_summary, summarize_document
from super_rag_tpu.service.rerank_service import RerankService
from super_rag_tpu.config import Settings
from super_rag_tpu.service.context import build_context
from super_rag_tpu.service.collection_service import CollectionService
from super_rag_tpu.service.document_service import DocumentService


def test_extractive_summary_budget():
    chunks = [f"Sentence number {i} about topic {i}. More detail here." for i in range(50)]
    s = extractive_summary(chunks, budget_tokens=50)
    assert s and len(s.split(".")) < 20


def test_summarize_with_completion_map_reduce():
    calls = []

    def completion(prompt: str):
        calls.append(prompt)
        return "A summary."

    out = summarize_document([f"chunk {i}" for i in range(20)],
                             completion=completion, title="Doc")
    assert out == "A summary."
    assert len(calls) >= 3  # 3 map batches + 1 reduce


def test_summarize_degrades_on_error():
    def broken(prompt: str):
        raise RuntimeError("api down")

    out = summarize_document(["First sentence. Second."], completion=broken)
    assert out.startswith("First sentence.")


def test_summary_index_lifecycle(tmp_path):
    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    ctx = build_context(cfg)
    collections = CollectionService(ctx)
    documents = DocumentService(ctx, collections)
    coll = collections.create("u", "kb", config={"enable_summary": True})
    doc = documents.create(
        "u", coll["id"], "d.md",
        b"# T\n\nWombats dig burrows. They are marsupials from Australia.",
    )
    statuses = {i["index_type"]: i["status"] for i in doc["indexes"]}
    assert statuses == {"vector": "ACTIVE", "summary": "ACTIVE"}
    eng = ctx.engines.get(coll["id"], coll["config"])
    hits = eng.search("wombat burrows", top_k=3, mode="dense",
                      index_types=["summary"])
    assert hits and all(h.metadata.get("document_id") == doc["id"] for h in hits)


def test_rerank_service_shapes_and_determinism():
    svc = RerankService(batch_size=4)
    texts = [f"document {i} about foxes" for i in range(7)]
    s1 = svc("fox question", texts)
    s2 = svc("fox question", texts)
    assert s1.shape == (7,)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
    assert svc("q", []).shape == (0,)


def test_rerank_service_from_trained_checkpoint(tmp_path):
    """Trained on-TPU CE checkpoint + BPE tokenizer sidecar round-trips
    into a serving RerankService (the no-remote-provider default)."""
    import jax
    import jax.numpy as jnp

    from super_rag_tpu.models.cross_encoder import CrossEncoder
    from super_rag_tpu.models.encoder import EncoderConfig
    from super_rag_tpu.models.encoder_service import save_params
    from super_rag_tpu.models.subword import train_bpe
    from super_rag_tpu.service.rerank_service import RerankService

    cfg = EncoderConfig(vocab_size=200, hidden_dim=32, num_layers=1,
                        num_heads=4, mlp_dim=64, max_len=64,
                        dtype=jnp.float32)
    tok = train_bpe(["alpha beta gamma delta epsilon"] * 5, vocab_size=200)
    model = CrossEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ce")
    save_params(params, path, cfg)
    tok.save(path + ".tokenizer.json")

    svc = RerankService.from_checkpoint(path, batch_size=4, max_len=64)
    scores = svc("alpha beta", ["gamma delta", "beta alpha", "epsilon"])
    assert scores.shape == (3,)
    assert type(svc.tokenizer).__name__ == "BPETokenizer"
