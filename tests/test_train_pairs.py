"""ICT pair generation + end-to-end fine-tune improves in-domain retrieval."""

import jax
import jax.numpy as jnp
import numpy as np

from super_rag_tpu.models.encoder import EncoderConfig, TextEncoder
from super_rag_tpu.models.tokenization import HashTokenizer
from super_rag_tpu.train.contrastive import TrainConfig, create_train_state, make_train_step
from super_rag_tpu.train.pairs import Pair, ict_pairs, pairs_to_batches, title_pairs


def test_ict_pairs():
    chunks = ["First sentence here. Second one follows. Third closes.",
              "too short"]
    rng = np.random.default_rng(0)
    pairs = list(ict_pairs(chunks, rng))
    assert len(pairs) == 1
    assert pairs[0].query not in pairs[0].positive


def test_title_pairs():
    metas = [{"text": "body text with quite a few words in it for training",
              "title_path": "Guide > Install"},
             {"text": "short", "title_path": "X"}]
    pairs = list(title_pairs(metas))
    assert len(pairs) == 1 and pairs[0].query == "Guide Install"


def test_finetune_improves_retrieval():
    """A few steps on in-domain pairs must raise pair alignment."""
    cfg = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1,
                        num_heads=4, mlp_dim=64, max_len=64,
                        dtype=jnp.float32)
    model = TextEncoder(cfg)
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.default_rng(0)
    topics = ["alpha beta gamma", "delta epsilon zeta", "eta theta iota",
              "kappa lam mu"]
    pairs = [Pair(query=t, positive=f"{t} body content {i}")
             for i, t in enumerate(topics * 8)]
    batches = list(pairs_to_batches(pairs, tok, batch_size=8))
    assert batches

    tcfg = TrainConfig(learning_rate=3e-3, warmup_steps=1)
    state = create_train_state(model, jax.random.PRNGKey(0), tcfg)
    step = make_train_step(model, tcfg)

    def alignment(params):
        q_ids, q_mask = tok.encode_batch(topics, max_len=64)
        d_ids, d_mask = tok.encode_batch(
            [f"{t} body content 0" for t in topics], max_len=64)
        q = model.apply({"params": params}, jnp.asarray(q_ids),
                        jnp.asarray(q_mask))
        d = model.apply({"params": params}, jnp.asarray(d_ids),
                        jnp.asarray(d_mask))
        sims = np.asarray(q) @ np.asarray(d).T
        return float(np.mean(np.diag(sims)) - np.mean(sims))

    before = alignment(state.params)
    for _ in range(3):
        for b in batches:
            state, metrics = step(state, {k: jnp.asarray(v)
                                          for k, v in b.items()})
    after = alignment(state.params)
    assert after > before, (before, after)
