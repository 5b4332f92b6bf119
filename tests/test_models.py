"""Encoder / cross-encoder / hash embedder tests.

The HF-parity test builds a *random-init* torch BertModel from config (no
downloads), maps its weights through hf_loader, and checks our flax
forward matches torch to float tolerance — validating the architecture
against the de-facto checkpoint format.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.models.encoder import EncoderConfig, TextEncoder, bucket_length
from super_rag_tpu.models.cross_encoder import CrossEncoder
from super_rag_tpu.models.hash_embedder import HashEmbedder
from super_rag_tpu.models.tokenization import HashTokenizer

TINY = EncoderConfig(
    vocab_size=512, hidden_dim=64, num_layers=2, num_heads=4, mlp_dim=128,
    max_len=128, dtype=jnp.float32,
)


def test_encoder_shapes_and_norm():
    model = TextEncoder(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (3, 16)), jnp.int32)
    mask = jnp.ones((3, 16), bool)
    out = model.apply({"params": params}, ids, mask)
    assert out.shape == (3, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5
    )


def test_mask_invariance():
    """Padding tokens must not change the embedding."""
    model = TextEncoder(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 512, (1, 8)).astype(np.int32)
    padded = np.concatenate([ids, rng.integers(3, 512, (1, 8)).astype(np.int32)], 1)
    m1 = np.ones((1, 8), bool)
    m2 = np.concatenate([m1, np.zeros((1, 8), bool)], 1)
    e1 = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(m1))
    e2 = model.apply({"params": params}, jnp.asarray(padded), jnp.asarray(m2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_cross_encoder_shape():
    model = CrossEncoder(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    ids = jnp.zeros((5, 24), jnp.int32)
    mask = jnp.ones((5, 24), bool)
    s = model.apply({"params": params}, ids, mask)
    assert s.shape == (5,)


def test_hash_embedder_deterministic_and_similar():
    emb = HashEmbedder(dim=128)
    e = np.asarray(emb.embed([
        "the quick brown fox",
        "the quick brown fox",
        "quick brown foxes run",
        "matrix multiplication on TPUs",
    ]))
    np.testing.assert_allclose(e[0], e[1], atol=1e-6)
    sim_related = e[0] @ e[2]
    sim_unrelated = e[0] @ e[3]
    assert sim_related > sim_unrelated + 0.2


def test_hash_tokenizer_buckets():
    tok = HashTokenizer(vocab_size=1000)
    ids, mask = tok.encode_batch(["hello world", "a longer sentence with more words"])
    assert ids.shape[1] == bucket_length(ids.shape[1])
    assert ids[0, 0] == tok.cls_id
    assert mask.dtype == bool
    ids2, mask2, tt = tok.encode_pairs(["q one"], ["document body text"])
    assert tt.max() == 1 and tt[0, 0] == 0


@pytest.mark.slow
def test_hf_bert_parity():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from super_rag_tpu.models.hf_loader import (
        config_from_hf,
        encoder_params_from_bert,
    )

    hf_cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()

    cfg_ = config_from_hf(hf_cfg)
    cfg = EncoderConfig(**{**cfg_.__dict__, "dtype": jnp.float32})
    params = encoder_params_from_bert(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        hidden = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    # mean-pool + normalize, mirroring TextEncoder
    m = mask[..., None].astype(np.float32)
    gold = (hidden * m).sum(1) / m.sum(1)
    gold = gold / np.linalg.norm(gold, axis=-1, keepdims=True)

    model = TextEncoder(cfg)
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask.astype(bool)),
    )
    np.testing.assert_allclose(np.asarray(out), gold, atol=2e-5)
