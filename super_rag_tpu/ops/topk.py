"""Hierarchical top-k selection for TPU.

TPUs have no efficient global sort; `jax.lax.top_k` over a huge axis is
O(N*k) on the VPU and forces the full score row to be resident.  The
standard recipe (SURVEY.md section 7.4) is blockwise partial top-k followed
by a merge over the per-block candidates, which keeps every sort tiny and
lets XLA pipeline the blocks.

All functions are shape-polymorphic in the batch dimension but require
static `k` and block sizes (XLA static-shape rule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def _pad_last(x: jax.Array, multiple: int, fill) -> jax.Array:
    n = x.shape[-1]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, rem)]
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("k", "block_size"))
def blockwise_topk(
    scores: jax.Array, k: int, block_size: int = 2048
) -> tuple[jax.Array, jax.Array]:
    """Top-k over the last axis of ``scores`` via two-stage selection.

    Stage 1 runs `top_k` independently over blocks of ``block_size``
    (cheap: k << block_size), stage 2 merges the ``num_blocks * k``
    survivors.  Returns ``(values, indices)`` of shape ``[..., k]``.
    Padded positions never win because they are filled with -inf.
    """
    *lead, n = scores.shape
    if n <= block_size or n <= 4 * k:
        return jax.lax.top_k(scores, min(k, n))

    kb = min(k, block_size)
    s = _pad_last(scores, block_size, NEG_INF)
    num_blocks = s.shape[-1] // block_size
    s = s.reshape(*lead, num_blocks, block_size)
    v, i = jax.lax.top_k(s, kb)  # [..., num_blocks, kb]
    base = (jnp.arange(num_blocks, dtype=jnp.int32) * block_size)[:, None]
    gi = (i.astype(jnp.int32) + base).reshape(*lead, num_blocks * kb)
    v = v.reshape(*lead, num_blocks * kb)
    fv, fi = jax.lax.top_k(v, k)
    out_idx = jnp.take_along_axis(gi, fi, axis=-1)
    return fv, out_idx


def merge_topk(
    values: jax.Array, indices: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Merge concatenated candidate lists ``[..., m]`` down to top-k.

    Used for the cross-shard merge: each shard contributes its local top-k
    (already translated to global ids); the gathered ``m = shards * k``
    candidates reduce to the global top-k with one tiny sort.
    """
    v, pos = jax.lax.top_k(values, k)
    idx = jnp.take_along_axis(indices, pos, axis=-1)
    return v, idx
