"""Pallas IVF kernel: probe-list-driven cluster streaming.

The XLA IVF path (ops/ivf.py) gathers the probed cluster tiles with
jnp.take, which materializes a [B, nprobe, C, D] tensor in HBM — measured
SLOWER than the flat scan at 1M x 768 (22 ms vs 8.6 ms at batch 32).

This kernel never materializes the gather.  Grid = one step per query;
the probe list rides in as a scalar-prefetch operand; cluster tiles
(values / scales / row ids) stay in HBM and are DMA'd into double-buffered
VMEM scratch per probe — DMA for probe j+1 overlaps scoring of probe j.
Per probe: one [C, D] tile matvec'd against the query row with dequant
scales, top-k extracted in VMEM into the [1, nprobe, k] output block.
Bytes touched per query = nprobe * C * D — the true IVF promise.

(An earlier variant used BlockSpec index maps over the probe dimension;
Mosaic requires the last two block dims to be (8k, 128k)-conforming or
whole-array, which (1, D) query rows and (1, 1, k) outputs violate —
hence the hand-pipelined form.)
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


def _make_kernel(k: int, cap: int, d: int, nprobe: int, has_scales: bool,
                 compute_dtype):
    def kernel(*refs):
        it = iter(refs)
        probes_ref = next(it)  # [B, nprobe] SMEM (scalar prefetch)
        q_ref = next(it)  # [B, D] VMEM (whole array)
        values_hbm = next(it)  # [nlist, C, D] ANY/HBM
        scales_hbm = next(it) if has_scales else None  # [nlist, C]
        ids_hbm = next(it)  # [nlist, C]
        vals_ref = next(it)  # [1, nprobe, k] VMEM
        idx_ref = next(it)  # [1, nprobe, k] VMEM
        v_scr = next(it)  # [2, C, D] VMEM scratch
        s_scr = next(it) if has_scales else None  # [2, 1, C]
        i_scr = next(it)  # [2, 1, C]
        v_sem = next(it)
        s_sem = next(it) if has_scales else None
        i_sem = next(it)

        b = pl.program_id(0)

        def start_dma(slot, j):
            cluster = probes_ref[b, j]
            pltpu.make_async_copy(
                values_hbm.at[cluster], v_scr.at[slot], v_sem.at[slot]
            ).start()
            if has_scales:
                pltpu.make_async_copy(
                    scales_hbm.at[pl.ds(cluster, 1)], s_scr.at[slot],
                    s_sem.at[slot],
                ).start()
            pltpu.make_async_copy(
                ids_hbm.at[pl.ds(cluster, 1)], i_scr.at[slot],
                i_sem.at[slot],
            ).start()

        def wait_dma(slot, j):
            cluster = probes_ref[b, j]
            pltpu.make_async_copy(
                values_hbm.at[cluster], v_scr.at[slot], v_sem.at[slot]
            ).wait()
            if has_scales:
                pltpu.make_async_copy(
                    scales_hbm.at[pl.ds(cluster, 1)], s_scr.at[slot],
                    s_sem.at[slot],
                ).wait()
            pltpu.make_async_copy(
                ids_hbm.at[pl.ds(cluster, 1)], i_scr.at[slot],
                i_sem.at[slot],
            ).wait()

        start_dma(0, 0)
        q_row = q_ref[pl.ds(b, 1), :]  # [1, D]

        def loop_body(j, _):
            slot = jax.lax.rem(j, 2)
            nxt = jax.lax.rem(j + 1, 2)

            @pl.when(j + 1 < nprobe)
            def _():
                start_dma(nxt, j + 1)

            wait_dma(slot, j)

            tile = v_scr[slot].astype(compute_dtype)  # [C, D]
            s = jax.lax.dot_general(
                q_row.astype(compute_dtype), tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, C]
            if has_scales:
                s = s * s_scr[slot]
            ids = i_scr[slot]  # [1, C]
            s = jnp.where(ids >= 0, s, NEG_INF)

            col = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
            work = s
            for jj in range(k):
                m = jnp.max(work, axis=1)
                am = jnp.argmax(work, axis=1).astype(jnp.int32)
                vals_ref[0, j, jj] = m[0]
                idx_ref[0, j, jj] = jnp.take(ids[0], am[0])
                work = jnp.where(col == am[:, None], NEG_INF, work)
            return 0

        jax.lax.fori_loop(0, nprobe, loop_body, 0)

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
    rather than inside the kernel; per-cluster extraction goes deeper when
    a mask is present so filtered rows cannot displace every candidate.
    Heavy filtering should also raise nprobe.
    """
    metric = Metric(metric)
    q = queries.astype(jnp.float32)
    if metric == Metric.COSINE:
        nrm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        q = q / jnp.where(nrm > 0, nrm, 1.0)

    b, d = q.shape
    nlist, cap, _ = index.values.shape
    nprobe = min(nprobe, nlist)
    kt = min(cap, max(k, 32)) if mask is not None else min(k, cap)

    cs = q @ index.centroids.T  # [B, nlist] — tiny
    _, probes = jax.lax.top_k(cs, nprobe)
    probes = probes.astype(jnp.int32)

    has_scales = index.scales is not None
    compute_dtype = (
        jnp.float32 if index.values.dtype == jnp.float32 else jnp.bfloat16
    )
    q_in = q.astype(compute_dtype)

    inputs = [q_in, index.values]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # whole q array
        pl.BlockSpec(memory_space=pl.ANY),  # values stay in HBM
    ]
    if has_scales:
        inputs.append(index.scales.astype(jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    inputs.append(index.row_ids)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    scratch = [pltpu.VMEM((2, cap, d), index.values.dtype)]
    if has_scales:
        scratch.append(pltpu.VMEM((2, 1, cap), jnp.float32))
    scratch.append(pltpu.VMEM((2, 1, cap), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if has_scales:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, nprobe, kt), lambda bi, p: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nprobe, kt), lambda bi, p: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
    )
    vals, ids = pl.pallas_call(
        _make_kernel(kt, cap, d, nprobe, has_scales, compute_dtype),
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
