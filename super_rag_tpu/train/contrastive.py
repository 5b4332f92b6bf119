"""Contrastive fine-tuning of the dual encoder (dp x tp sharded).

The reference has no training at all — embeddings come from remote APIs
(SURVEY.md section 2.10: every parallelism row is 'No').  A TPU-native
retrieval stack owns its encoder, so it must be trainable in place:
InfoNCE with in-batch negatives (the standard dense-retrieval recipe —
query i's positive is doc i, negatives are the other docs in the global
batch).

Parallelism is expressed once, declaratively:
  * mesh ("dp", "tp") — batch shards over dp, weights over tp;
  * param_shardings maps the encoder tree onto the mesh (column-split
    QKV/mlp_in kernels, row-split attention-out/mlp_out kernels,
    replicated embeddings/norms);
  * the train step is a single jit with in/out shardings — XLA/GSPMD
    inserts the ICI collectives (all-gather for the cross-shard logits
    matrix, reduce-scatter/psum for grads), no hand-written NCCL-style
    code (the TPU-native answer to SURVEY.md section 5.8).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from super_rag_tpu.models.encoder import EncoderConfig, TextEncoder


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-5
    weight_decay: float = 0.01
    temperature: float = 0.05
    warmup_steps: int = 100
    grad_clip: float = 1.0
    # when set, the LR follows warmup -> cosine decay to ~0 over this many
    # steps (the standard dense-retrieval schedule); None = warmup -> const
    total_steps: Optional[int] = None


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def train_mesh(devices: Optional[Sequence[jax.Device]] = None,
               tp: int = 1) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.asarray(devs).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def _spec_for(path: tuple, leaf) -> P:
    """Partition rule for one encoder parameter."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    if leaf.ndim == 2:
        if any(k in joined for k in ("query/kernel", "key/kernel",
                                     "value/kernel", "mlp_in/kernel")):
            return P(None, "tp")  # column parallel
        if any(k in joined for k in ("out/kernel", "mlp_out/kernel")):
            return P("tp", None)  # row parallel
        if "embed" in joined and "embedding" in joined:
            return P(None, None)  # replicate embeddings (small vocabs)
        return P(None, None)
    if leaf.ndim == 1:
        if any(k in joined for k in ("query/bias", "key/bias", "value/bias",
                                     "mlp_in/bias")):
            return P("tp")
        return P(None)
    return P()


def param_shardings(params: Any, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params
    )


def _optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
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


def create_train_state(
    model: TextEncoder,
    rng: jax.Array,
    cfg: TrainConfig = TrainConfig(),
    mesh: Optional[Mesh] = None,
) -> TrainState:
    params = model.init_params(rng)
    opt_state = _optimizer(cfg).init(params)
    if mesh is not None:
        ps = param_shardings(params, mesh)
        params = jax.device_put(params, ps)
        # optimizer state mirrors param sharding where shapes match
        opt_state = jax.device_put(
            opt_state,
            jax.tree.map(
                lambda l: NamedSharding(mesh, P())
                if not hasattr(l, "ndim")
                else NamedSharding(mesh, P()),
                opt_state,
            ),
        )
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


def info_nce_loss(q_emb: jax.Array, d_emb: jax.Array,
                  temperature: float) -> tuple[jax.Array, jax.Array]:
    """Symmetric InfoNCE over the GLOBAL batch (in-batch negatives)."""
    logits = q_emb @ d_emb.T / temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    loss_q = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_d = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = 0.5 * (loss_q.mean() + loss_d.mean())
    acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    return loss, acc


def make_train_step(model: TextEncoder, cfg: TrainConfig = TrainConfig(),
                    mesh: Optional[Mesh] = None):
    """Returns jitted train_step(state, batch) -> (state, metrics).

    batch = dict(q_ids, q_mask, d_ids, d_mask) — [B, S] int32/bool arrays.
    With a mesh, batch arrays shard over dp and the step compiles as one
    SPMD program over the mesh.
    """
    opt = _optimizer(cfg)

    def loss_fn(params, batch):
        q = model.apply({"params": params}, batch["q_ids"], batch["q_mask"])
        d = model.apply({"params": params}, batch["d_ids"], batch["d_mask"])
        return info_nce_loss(q, d, cfg.temperature)

    def step_fn(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1),
            {"loss": loss, "accuracy": acc},
        )

    if mesh is None:
        return jax.jit(step_fn)

    batch_sharding = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())

    def place_batch(batch: dict) -> dict:
        return {k: jax.device_put(jnp.asarray(v), batch_sharding)
                for k, v in batch.items()}

    jitted = jax.jit(
        step_fn,
        in_shardings=(None, {k: batch_sharding
                             for k in ("q_ids", "q_mask", "d_ids", "d_mask")}),
        out_shardings=(None, {"loss": repl, "accuracy": repl}),
    )
    jitted.place_batch = place_batch  # convenience for callers
    return jitted
