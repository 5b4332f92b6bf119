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
from super_rag_tpu.parallel.mesh import CORPUS_AXIS, SLICE_AXIS, row_axes


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
    raxes = row_axes(mesh)
    multi_slice = SLICE_AXIS in raxes

    row = P(raxes)
    in_specs = (
        P(),  # queries replicated
        P(raxes, None),  # values row-sharded
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
        if multi_slice:
            shard_id = (jax.lax.axis_index(SLICE_AXIS)
                        * mesh.shape[CORPUS_AXIS] + shard_id)
        li = li + shard_id * shard_rows
        b = q.shape[0]

        def merge_axis(vals, ids, axis):
            # candidates ride the link; scores stay per-shard
            av = jnp.moveaxis(jax.lax.all_gather(vals, axis), 0, 1)
            ai = jnp.moveaxis(jax.lax.all_gather(ids, axis), 0, 1)
            av = av.reshape(b, -1)
            ai = ai.reshape(b, -1)
            fv, pos = jax.lax.top_k(av, k)
            return fv, jnp.take_along_axis(ai, pos, axis=-1)

        # hierarchical merge: ICI (corpus axis) first, then only k
        # winners per slice cross the DCN (slice axis)
        fv, fi = merge_axis(lv, li, CORPUS_AXIS)
        if multi_slice:
            fv, fi = merge_axis(fv, fi, SLICE_AXIS)
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
