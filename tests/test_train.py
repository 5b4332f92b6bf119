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
