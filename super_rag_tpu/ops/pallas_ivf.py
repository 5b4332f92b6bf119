"""Pallas IVF kernel: probe-list-driven cluster streaming.

The XLA IVF path (ops/ivf.py) gathers the probed cluster tiles with
jnp.take, which materializes a [B, nprobe, C, D] tensor in HBM — measured
SLOWER than the flat scan at 1M x 768 (22 ms vs 8.6 ms at batch 32).
This kernel never materializes the gather: the probe lists ride in as
scalar-prefetch operands, the BlockSpec index maps select each (query,
probe) step's cluster tile, and the Pallas pipeline double-buffers the
HBM->VMEM streams.  Per step: one [C, D] tile matvec'd against one query
row with dequant scales, top-k extracted in VMEM; the [B, nprobe, k]
candidates merge outside with one small top_k.

Bytes touched per query = nprobe * C * D — the true IVF promise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from super_rag_tpu.ops.ivf import IVFIndex
from super_rag_tpu.ops.dense import Metric

NEG_INF = float("-inf")


def _make_kernel(k: int, cap: int, has_scales: bool):
    def kernel(*refs):
        it = iter(refs)
        _probes = next(it)  # scalar-prefetch ref (used by index maps)
        q_ref = next(it)  # [1, D]
        v_ref = next(it)  # [1, C, D]
        scales_ref = next(it) if has_scales else None  # [1, C]
        ids_ref = next(it)  # [1, C]
        vals_ref = next(it)  # [1, 1, k]
        idx_ref = next(it)  # [1, 1, k]

        v = v_ref[0]
        if v.dtype == jnp.int8:
            v = v.astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q_ref[:].astype(v.dtype), v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, C]
        if has_scales:
            s = s * scales_ref[0][None, :]
        ids = ids_ref[0]
        s = jnp.where((ids >= 0)[None, :], s, NEG_INF)

        col = jax.lax.broadcasted_iota(jnp.int32, (1, cap), dimension=1)
        work = s
        for j in range(k):
            m = jnp.max(work, axis=1)
            am = jnp.argmax(work, axis=1).astype(jnp.int32)
            vals_ref[0, 0, j] = m[0]
            idx_ref[0, 0, j] = jnp.take(ids, am[0])
            work = jnp.where(col == am[:, None], NEG_INF, work)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "metric", "interpret")
)
def pallas_ivf_topk(
    queries: jax.Array,  # [B, D] f32
    index: IVFIndex,
    k: int,
    nprobe: int = 32,
    metric: Metric = Metric.COSINE,
    mask: Optional[jax.Array] = None,  # [N] bool over global rows
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Approximate top-k via probe-driven cluster streaming.

    The optional global keep-mask applies to the merged candidates (tiny)
    rather than inside the kernel; heavy filtering should raise nprobe.
    """
    metric = Metric(metric)
    q = queries.astype(jnp.float32)
    if metric == Metric.COSINE:
        nrm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        q = q / jnp.where(nrm > 0, nrm, 1.0)

    b, d = q.shape
    nlist, cap, _ = index.values.shape
    nprobe = min(nprobe, nlist)
    # the keep-mask applies AFTER per-cluster extraction (the kernel never
    # reads the [N] mask); extract deeper per cluster so filtered rows
    # cannot displace every kept candidate
    kt = min(cap, max(k, 32)) if mask is not None else min(k, cap)

    cs = q @ index.centroids.T  # [B, nlist] — tiny
    _, probes = jax.lax.top_k(cs, nprobe)
    probes = probes.astype(jnp.int32)

    has_scales = index.scales is not None
    q_in = q.astype(
        jnp.bfloat16 if index.values.dtype != jnp.float32 else jnp.float32
    )

    inputs = [q_in, index.values]
    in_specs = [
        pl.BlockSpec((1, d), lambda bi, j, p: (bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cap, d), lambda bi, j, p: (p[bi, j], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_scales:
        inputs.append(index.scales.astype(jnp.float32))
        in_specs.append(
            pl.BlockSpec((1, cap), lambda bi, j, p: (p[bi, j], 0),
                         memory_space=pltpu.VMEM)
        )
    inputs.append(index.row_ids)
    in_specs.append(
        pl.BlockSpec((1, cap), lambda bi, j, p: (p[bi, j], 0),
                     memory_space=pltpu.VMEM)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, kt), lambda bi, j, p: (bi, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kt), lambda bi, j, p: (bi, j, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    vals, ids = pl.pallas_call(
        _make_kernel(kt, cap, has_scales),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, nprobe, kt), jnp.float32),
            jax.ShapeDtypeStruct((b, nprobe, kt), jnp.int32),
        ),
        interpret=interpret,
    )(probes, *inputs)

    cv = vals.reshape(b, nprobe * kt)
    ci = ids.reshape(b, nprobe * kt)
    if mask is not None:
        keep = jnp.take(mask, jnp.maximum(ci, 0)) & (ci >= 0)
        cv = jnp.where(keep, cv, NEG_INF)
    k_eff = min(k, nprobe * kt)
    fv, pos = jax.lax.top_k(cv, k_eff)
    fi = jnp.take_along_axis(ci, pos, axis=-1)
    fi = jnp.where(jnp.isfinite(fv), fi, -1)

    # overflow segment (rows that spilled fixed-capacity clusters)
    if index.overflow is not None:
        from super_rag_tpu.ops.dense import dense_search

        ov, oi_local = dense_search(
            q, index.overflow, k=min(k_eff, index.overflow.size),
            metric=Metric.DOT,
            mask=(jnp.take(mask, index.overflow_rows)
                  if mask is not None else None),
        )
        oi = jnp.take(index.overflow_rows, oi_local)
        fv = jnp.concatenate([fv, ov], axis=1)
        fi = jnp.concatenate([fi, oi], axis=1)
        fv, pos = jax.lax.top_k(fv, k_eff)
        fi = jnp.take_along_axis(fi, pos, axis=-1)
    return fv, fi
