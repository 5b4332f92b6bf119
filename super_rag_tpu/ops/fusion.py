"""Rank fusion of dense and lexical candidate lists, on device.

The reference fuses dense+lexical inside SeekDB (opaque) and merges DAG
branches with a host-side union + text dedup (reference:
super_rag/nodeflow/runners/merge.py:45-65).  Here fusion is reciprocal
rank fusion (RRF) compiled into the same XLA program as the searches:
tiny [B, K] candidate tensors, equality-matrix dedup, one final top-k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("k", "rrf_k"))
def rrf_fuse(
    idx_a: jax.Array,  # [B, Ka] int32, -1 = empty slot
    idx_b: jax.Array,  # [B, Kb] int32, -1 = empty slot
    k: int,
    rrf_k: int = 60,
    weight_a: float = 1.0,
    weight_b: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Fuse two ranked id lists with RRF; returns (scores, ids) top-k.

    score(d) = weight_a / (rrf_k + rank_a(d) + 1)
             + weight_b / (rrf_k + rank_b(d) + 1)

    Duplicates are merged: an id present in both lists is scored once with
    both contributions (kept at its list-a slot; its list-b slot is
    suppressed).  Slots with id -1 (searches returning < K results pad
    with -1) never win.
    """
    b, ka = idx_a.shape
    kb = idx_b.shape[1]
    ra = jnp.arange(ka, dtype=jnp.float32)
    rb = jnp.arange(kb, dtype=jnp.float32)
    contrib_a = weight_a / (rrf_k + ra + 1.0)  # [Ka]
    contrib_b = weight_b / (rrf_k + rb + 1.0)  # [Kb]

    valid_a = idx_a >= 0
    valid_b = idx_b >= 0
    match = (idx_a[:, :, None] == idx_b[:, None, :]) & valid_a[:, :, None] & valid_b[:, None, :]

    score_a = jnp.where(
        valid_a,
        contrib_a[None, :] + jnp.einsum("bij,j->bi", match.astype(jnp.float32), contrib_b),
        NEG_INF,
    )
    dup_b = jnp.any(match, axis=1)  # [B, Kb] id already scored via list a
    score_b = jnp.where(valid_b & ~dup_b, contrib_b[None, :], NEG_INF)

    scores = jnp.concatenate([score_a, score_b], axis=1)
    ids = jnp.concatenate([idx_a, idx_b], axis=1)
    k_eff = min(k, ka + kb)
    fv, pos = jax.lax.top_k(scores, k_eff)
    fi = jnp.take_along_axis(ids, pos, axis=-1)
    # Losing slots with -inf keep id -1 so callers can detect short lists.
    fi = jnp.where(fv > NEG_INF, fi, -1)
    return fv, fi
