"""Contrastive training: loss decreases; dp x tp sharded step runs on the
8-device CPU mesh and matches the unsharded step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_rag_tpu.models.encoder import EncoderConfig, TextEncoder
from super_rag_tpu.train.contrastive import (
    TrainConfig,
    create_train_state,
    make_train_step,
    param_shardings,
    train_mesh,
)

TINY = EncoderConfig(vocab_size=256, hidden_dim=32, num_layers=2,
                     num_heads=4, mlp_dim=64, max_len=32, dtype=jnp.float32)


def make_batch(rng, b=16, s=12):
    # paired q/d share a token prefix so there is signal to learn
    base = rng.integers(3, 256, (b, 4)).astype(np.int32)
    q_extra = rng.integers(3, 256, (b, s - 4)).astype(np.int32)
    d_extra = rng.integers(3, 256, (b, s - 4)).astype(np.int32)
    return {
        "q_ids": np.concatenate([base, q_extra], 1),
        "q_mask": np.ones((b, s), bool),
        "d_ids": np.concatenate([base, d_extra], 1),
        "d_mask": np.ones((b, s), bool),
    }


def test_loss_decreases():
    model = TextEncoder(TINY)
    cfg = TrainConfig(learning_rate=1e-3, warmup_steps=1)
    state = create_train_state(model, jax.random.PRNGKey(0), cfg)
    step = make_train_step(model, cfg)
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng).items()}
    first = None
    for i in range(8):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert int(state.step) == 8


def test_sharded_matches_unsharded(eight_devices):
    model = TextEncoder(TINY)
    cfg = TrainConfig(learning_rate=1e-3, warmup_steps=1)
    mesh = train_mesh(eight_devices, tp=2)  # 4 x 2 dp x tp
    rng = np.random.default_rng(1)
    batch_np = make_batch(rng, b=16)

    state_s = create_train_state(model, jax.random.PRNGKey(0), cfg, mesh=mesh)
    step_s = make_train_step(model, cfg, mesh=mesh)
    batch_s = step_s.place_batch(batch_np)
    state_s, m_s = step_s(state_s, batch_s)

    state_u = create_train_state(model, jax.random.PRNGKey(0), cfg)
    step_u = make_train_step(model, cfg)
    batch_u = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state_u, m_u = step_u(state_u, batch_u)

    np.testing.assert_allclose(float(m_s["loss"]), float(m_u["loss"]),
                               rtol=1e-4)
    # spot-check one parameter tensor agrees after the update
    p_s = np.asarray(
        state_s.params["backbone"]["layer_0"]["attention"]["query"]["kernel"]
    )
    p_u = np.asarray(
        state_u.params["backbone"]["layer_0"]["attention"]["query"]["kernel"]
    )
    np.testing.assert_allclose(p_s, p_u, atol=1e-5)


def test_param_shardings_cover_tree(eight_devices):
    model = TextEncoder(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = train_mesh(eight_devices, tp=2)
    ps = param_shardings(params, mesh)
    flat = jax.tree.leaves(ps)
    assert len(flat) == len(jax.tree.leaves(params))
    # at least the QKV kernels must be tp-sharded
    qk = ps["backbone"]["layer_0"]["attention"]["query"]["kernel"]
    assert "tp" in str(qk.spec)


def test_ce_train_step_learns():
    """Cross-encoder listwise step: loss falls to near-zero on a fixed
    separable batch (positive docs repeat the query's tokens) — the
    memorization sanity check that proves gradients flow through the
    scoring head, listwise loss, and optimizer."""
    from super_rag_tpu.models.cross_encoder import CrossEncoder
    from super_rag_tpu.train.rerank import (
        RerankTrainConfig,
        create_ce_state,
        make_ce_train_step,
    )

    rng = np.random.default_rng(0)
    model = CrossEncoder(TINY)
    cfg = RerankTrainConfig(n_negatives=3, learning_rate=3e-3,
                            warmup_steps=2, total_steps=80)
    state = create_ce_state(model, jax.random.PRNGKey(0), cfg)
    step = make_ce_train_step(model, cfg)

    # 4 queries x (1 pos + 3 negs); pos repeats the query tokens
    ids = np.zeros((16, 16), np.int32)
    tt = np.zeros((16, 16), np.int32)
    for qi in range(4):
        qtok = rng.integers(3, 256, 4)
        for ci in range(4):
            row = qi * 4 + ci
            dtok = qtok if ci == 0 else rng.integers(3, 256, 4)
            ids[row, :11] = [1, *qtok, 2, *dtok, 2]
            tt[row, 6:11] = 1
    batch = {"ids": jnp.asarray(ids),
             "mask": jnp.asarray(np.ones((16, 16), bool)),
             "type_ids": jnp.asarray(tt)}

    first = None
    for i in range(80):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first * 0.5
    assert float(m["accuracy"]) >= 0.75


def test_mine_hard_negatives_excludes_self():
    from super_rag_tpu.models.hash_embedder import HashEmbedder
    from super_rag_tpu.train.pairs import Pair
    from super_rag_tpu.train.rerank import mine_hard_negatives

    pairs = [Pair(query=f"alpha topic{i}", positive=f"doc about topic{i}")
             for i in range(30)]
    emb = HashEmbedder(dim=64)
    negs = mine_hard_negatives(pairs, emb.embed, n_hard=3, block=8)
    assert len(negs) == 30
    for qi, ns in enumerate(negs):
        assert qi not in ns
        assert len(ns) <= 3


def test_ce_batches_shapes():
    from super_rag_tpu.models.tokenization import HashTokenizer
    from super_rag_tpu.train.pairs import Pair
    from super_rag_tpu.train.rerank import RerankTrainConfig, ce_batches

    pairs = [Pair(query=f"q {i}", positive=f"positive doc {i} words")
             for i in range(20)]
    hard = [[(i + 1) % 20] for i in range(20)]
    cfg = RerankTrainConfig(n_negatives=3)
    tok = HashTokenizer(vocab_size=512)
    b = next(ce_batches(pairs, hard, tok, np.random.default_rng(0), cfg,
                        batch_queries=4, max_len=32))
    assert b["ids"].shape[0] == 4 * 4  # B * (1 + n)
    assert b["mask"].shape == b["ids"].shape
    assert b["type_ids"].shape == b["ids"].shape
