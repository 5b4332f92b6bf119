"""Trainable BPE tokenizer (models/subword.py): merge learning, greedy
encoding, persistence, and protocol compatibility with the encoders."""

import numpy as np

from super_rag_tpu.models.subword import BPETokenizer, train_bpe

CORPUS = [
    "the retrieval engine retrieves retrieved retrievable documents",
    "the engine searches the document index for the query",
    "retrieval quality depends on the encoder and the index",
    "the query encoder embeds the query into the index space",
] * 50


def test_frequent_words_become_single_tokens():
    tok = train_bpe(CORPUS, vocab_size=400)
    ids = tok._encode_word("the")
    assert len(ids) == 1  # fully merged: most frequent word
    assert len(tok._encode_word("retrieval")) < len("retrieval") + 1


def test_subword_sharing_for_unseen_forms():
    # limited merge budget: words stay multi-piece, so morphological
    # variants — including 'retrievals', never in the corpus — share
    # learned stem subwords (what hashing can never do)
    tok = train_bpe(CORPUS, vocab_size=80)
    b = tok._encode_word("retrieves")
    unseen = tok._encode_word("retrievals")
    assert len(b) > 1
    assert set(b) & set(unseen)  # common 'retriev' stem piece
    assert tok.unk_id not in unseen  # covered by learned subwords


def test_encode_batch_shapes_and_specials():
    tok = train_bpe(CORPUS, vocab_size=300)
    ids, mask = tok.encode_batch(["the query", "the document index"],
                                 max_len=64)
    assert ids.shape == mask.shape
    assert ids.dtype == np.int32
    for r, m in zip(ids, mask):
        row = r[m]
        assert row[0] == tok.cls_id and row[-1] == tok.sep_id
    assert ids.max() < tok.vocab_size


def test_unknown_characters_map_to_unk():
    tok = train_bpe(["plain ascii words only"], vocab_size=200)
    ids = tok._encode_word("zebraÿ")
    assert tok.unk_id in ids


def test_save_load_roundtrip(tmp_path):
    tok = train_bpe(CORPUS, vocab_size=300)
    p = str(tmp_path / "tok.json")
    tok.save(p)
    back = BPETokenizer.load(p)
    texts = ["retrieval engine query", "unseen retrievals everywhere"]
    a_ids, a_mask = tok.encode_batch(texts, max_len=32)
    b_ids, b_mask = back.encode_batch(texts, max_len=32)
    np.testing.assert_array_equal(a_ids, b_ids)
    np.testing.assert_array_equal(a_mask, b_mask)


def test_encode_pairs_type_ids():
    tok = train_bpe(CORPUS, vocab_size=300)
    ids, mask, tt = tok.encode_pairs(["the query"], ["the document"],
                                     max_len=64)
    row, m, t = ids[0], mask[0], tt[0]
    seps = np.where(row == tok.sep_id)[0]
    assert len(seps) == 2
    assert t[: seps[0] + 1].max() == 0  # segment A
    assert t[seps[0] + 1 : seps[1] + 1].min() == 1  # segment B
    assert not t[~m].any()


def test_drop_in_for_encoder_service():
    import jax.numpy as jnp

    from super_rag_tpu.models.encoder import EncoderConfig
    from super_rag_tpu.models.encoder_service import EncoderService

    tok = train_bpe(CORPUS, vocab_size=300)
    cfg = EncoderConfig(vocab_size=tok.vocab_size, hidden_dim=32,
                        num_layers=1, num_heads=4, mlp_dim=64, max_len=64,
                        dtype=jnp.float32)
    svc = EncoderService(cfg=cfg, tokenizer=tok, batch_size=4, max_len=64)
    emb = np.asarray(svc.embed(["the query", "retrieval engine"]))
    assert emb.shape == (2, 32)
    norms = np.linalg.norm(emb, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
