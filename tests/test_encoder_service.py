"""EncoderService: bucketing, checkpoint round trip, engine integration."""

import numpy as np
import jax.numpy as jnp

from super_rag_tpu.models.encoder import EncoderConfig
from super_rag_tpu.models.encoder_service import (
    EncoderService,
    load_params,
    save_params,
)

TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1,
                     num_heads=4, mlp_dim=64, max_len=64, dtype=jnp.float32)


def test_embed_shapes_and_determinism():
    svc = EncoderService(cfg=TINY, batch_size=4)
    texts = [f"text number {i}" for i in range(7)]
    e1 = svc.embed(texts)
    e2 = svc.embed(texts)
    assert e1.shape == (7, 32) and svc.dim == 32
    np.testing.assert_allclose(e1, e2, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(e1, axis=1), 1.0, rtol=1e-5)
    assert svc.embed([]).shape == (0, 32)


def test_batch_padding_no_crosstalk():
    svc = EncoderService(cfg=TINY, batch_size=4)
    alone = svc.embed(["solo text"])
    batched = svc.embed(["solo text", "another", "third", "fourth", "fifth"])
    np.testing.assert_allclose(alone[0], batched[0], atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    svc = EncoderService(cfg=TINY)
    path = str(tmp_path / "ck")
    save_params(svc.params, path, TINY)
    params2, cfg2 = load_params(path)
    assert cfg2.hidden_dim == 32
    svc2 = EncoderService(cfg=cfg2, params=params2)
    np.testing.assert_allclose(svc.embed(["same text"]),
                               svc2.embed(["same text"]), atol=1e-6)


def test_onboard_engine_integration(tmp_path):
    from super_rag_tpu.config import Settings
    from super_rag_tpu.service.context import build_context
    from super_rag_tpu.service.collection_service import CollectionService

    cfg = Settings(data_dir=str(tmp_path), vocab_size=1 << 14)
    ctx = build_context(cfg)
    cs = CollectionService(ctx)
    coll = cs.create("u", "kb", config={
        "embedding": {"provider": "onboard"}, "index_dtype": "float32",
        "vocab_size": 1 << 14,
    })
    eng = ctx.engines.get(coll["id"], coll["config"])
    assert type(eng.embedder).__name__ == "EncoderService"
    assert eng.index.spec.dim == eng.embedder.dim
    eng.ingest(["the onboard encoder embeds this text"])
    hits = eng.search("onboard encoder text", top_k=1, mode="dense")
    assert hits


def test_default_checkpoint_preferred_over_hash(tmp_path, monkeypatch):
    """With SUPER_RAG_ENCODER_CKPT set to a trained checkpoint of the
    right dim, the no-provider embedder factory returns the encoder
    service; dim mismatch falls back to hash."""
    import jax
    import numpy as np

    from super_rag_tpu.config import Settings
    from super_rag_tpu.models.encoder import EncoderConfig, TextEncoder
    from super_rag_tpu.models.encoder_service import EncoderService, save_params
    from super_rag_tpu.models.hash_embedder import HashEmbedder
    from super_rag_tpu.service.context import build_context

    cfg_small = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1,
                              num_heads=4, mlp_dim=64, max_len=32)
    params = TextEncoder(cfg_small).init_params(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "enc")
    save_params(params, ckpt, cfg_small)

    cfg = Settings(data_dir=str(tmp_path / "data"), encoder_checkpoint=ckpt)
    ctx = build_context(cfg)
    emb = ctx.engines._embedder_factory({"embedding": {"dim": 32}})
    assert isinstance(emb, EncoderService)
    assert np.asarray(emb.embed(["hello world"])).shape == (1, 32)

    emb2 = ctx.engines._embedder_factory({"embedding": {"dim": 64}})
    assert isinstance(emb2, HashEmbedder)
