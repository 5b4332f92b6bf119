"""Sharded dense search: per-chip top-k + all_gather merge over ICI.

Replaces the reference's opaque in-database distribution (SeekDB handles
sharding internally — SURVEY.md section 2.10 'Index sharding') with an
explicit SPMD program: every chip holds ``N / n_dev`` corpus rows, scores
them locally with the same fused kernel as the single-chip path, and the
tiny ``[n_dev, B, k]`` candidate tensor — not the scores — crosses ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from super_rag_tpu.ops.dense import DenseCorpus, Metric, dense_search
from super_rag_tpu.parallel.mesh import CORPUS_AXIS


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "metric", "block_size", "has_mask"),
)
def _sharded_search_impl(
    queries: jax.Array,
    values: jax.Array,
    scales: Optional[jax.Array],
    norms_sq: Optional[jax.Array],
    mask: Optional[jax.Array],
    *,
    mesh: Mesh,
    k: int,
    metric: Metric,
    block_size: int,
    has_mask: bool,
):
    n_dev = mesh.devices.size
    shard_rows = values.shape[0] // n_dev

    row = P(CORPUS_AXIS)
    in_specs = (
        P(),  # queries replicated
        P(CORPUS_AXIS, None),  # values row-sharded
        row if scales is not None else P(),
        row if norms_sq is not None else P(),
        row if has_mask else P(),
    )

    def local_search(q, v, s, ns, m):
        corpus = DenseCorpus(
            values=v,
            scales=s if scales is not None else None,
            norms_sq=ns if norms_sq is not None else None,
        )
        lv, li = dense_search(
            q,
            corpus,
            k=k,
            metric=metric,
            mask=m if has_mask else None,
            block_size=block_size,
        )
        shard_id = jax.lax.axis_index(CORPUS_AXIS)
        li = li + shard_id * shard_rows
        # [n_dev, B, k] candidates ride ICI; scores stay on-chip.
        av = jax.lax.all_gather(lv, CORPUS_AXIS)
        ai = jax.lax.all_gather(li, CORPUS_AXIS)
        b = q.shape[0]
        av = jnp.moveaxis(av, 0, 1).reshape(b, n_dev * lv.shape[-1])
        ai = jnp.moveaxis(ai, 0, 1).reshape(b, n_dev * lv.shape[-1])
        fv, pos = jax.lax.top_k(av, k)
        fi = jnp.take_along_axis(ai, pos, axis=-1)
        return fv, fi

    dummy = jnp.zeros((), jnp.float32)
    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(
        queries,
        values,
        scales if scales is not None else dummy,
        norms_sq if norms_sq is not None else dummy,
        mask if has_mask else dummy,
    )


def sharded_dense_search(
    queries: jax.Array,
    corpus: DenseCorpus,
    k: int,
    mesh: Mesh,
    metric: Metric = Metric.COSINE,
    mask: Optional[jax.Array] = None,
    block_size: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Search a row-sharded corpus; returns replicated ``[B, k]`` results.

    ``corpus`` arrays must already be placed with
    ``parallel.mesh.shard_corpus`` (row count divisible by mesh size);
    ``mask`` rides the same sharding and also covers padding rows.
    """
    return _sharded_search_impl(
        queries,
        corpus.values,
        corpus.scales,
        corpus.norms_sq,
        mask,
        mesh=mesh,
        k=k,
        metric=Metric(metric),
        block_size=block_size,
        has_mask=mask is not None,
    )
