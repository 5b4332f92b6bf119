"""Pallas IVF kernel: probe-list-driven cluster streaming.

The XLA IVF path (ops/ivf.py) gathers the probed cluster tiles with
jnp.take, which materializes a [B, nprobe, C, D] tensor in HBM — measured
SLOWER than the flat scan at 1M x 768 (22 ms vs 8.6 ms at batch 32).

This kernel never materializes the gather.  Grid = one step per query;
the probe list rides in as a scalar-prefetch operand; cluster value tiles
stay in HBM and are DMA'd into double-buffered VMEM scratch per probe —
the DMA for probe j+1 overlaps scoring of probe j.  Per probe the [C, D]
tile is matvec'd against the query row and the raw score row is written
to the [1, nprobe, C] output block.  Bytes touched per query =
nprobe * C * D — the true IVF promise.

Everything else (dequant scales, tombstone masking, top-k) happens
OUTSIDE the kernel on the tiny [B, nprobe*C] candidate array: Mosaic
forbids scalar stores to VMEM, so per-element in-kernel top-k extraction
does not lower; hoisting it costs nothing because the candidate set is
~6k floats per query.

(An earlier variant used BlockSpec index maps over the probe dimension;
Mosaic requires the last two block dims to be (8k, 128k)-conforming or
whole-array, which (1, D) query rows violate — hence the hand-pipelined
form.)
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

# the tile-parallel (union) path materializes a [U, B, C] f32 score array
# in HBM; cap its round-trip so the traffic stays a fraction of the tile
# stream itself (b32/np32 at the 10M shape: 184 MB -> ~0.5 ms)
UNION_OUT_BYTES_MAX = 400 << 20


def _make_kernel(cap: int, d: int, nprobe: int, compute_dtype):
    def kernel(probes_ref, q_ref, values_hbm, out_ref, v_scr, v_sem):
        # probes_ref: [B, nprobe] SMEM (scalar prefetch)
        # q_ref:      [B, 1, D] VMEM (whole array; the query's dynamic
        #             index rides the LEADING dim — Mosaic only allows
        #             unaligned dynamic indices off the tiled last-two)
        # values_hbm: [nlist, C, D] ANY/HBM
        # out_ref:    [1, nprobe, 1, C] VMEM (probe index j is dim 1,
        #             again off the tiled pair)
        # v_scr:      [2, C, D] VMEM scratch; v_sem: [2] DMA semaphores
        b = pl.program_id(0)

        def copy(slot, j):
            return pltpu.make_async_copy(
                values_hbm.at[probes_ref[b, j]], v_scr.at[slot],
                v_sem.at[slot],
            )

        copy(0, 0).start()
        q_row = q_ref[b]  # [1, D]

        def loop_body(j, _):
            slot = jax.lax.rem(j, 2)
            nxt = jax.lax.rem(j + 1, 2)

            @pl.when(j + 1 < nprobe)
            def _():
                copy(nxt, j + 1).start()

            copy(slot, j).wait()

            tile = v_scr[slot].astype(compute_dtype)  # [C, D]
            s = jax.lax.dot_general(
                q_row.astype(compute_dtype), tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, C]
            out_ref[0, j] = s
            return 0

        jax.lax.fori_loop(0, nprobe, loop_body, 0)

    return kernel


def _make_union_kernel(cap: int, d: int, n_union: int, nbuf: int,
                       compute_dtype):
    """Tile-parallel form: one grid step per UNION cluster tile, the whole
    query block matmul'd against it.

    The per-query kernel below feeds the MXU one [1, D] row at a time —
    127/128 of the systolic array idle, measured 752 ms for b512/np32 at
    10M (scripts/tpu_profile_ivf.py) where the bytes it streams fit in
    ~20 ms.  Here the unit of work is the cluster tile: [B, D] @ [D, C]
    uses B systolic rows and each tile is read ONCE for the whole batch.
    ``nbuf``-deep DMA pipelining keeps HBM busy; the [B, C] score block is
    copied out asynchronously (double-buffered) so the output never holds
    VMEM hostage.
    """

    def kernel(union_ref, q_ref, values_hbm, out_ref, v_scr, s_scr,
               v_sem, o_sem):
        # union_ref: [U] SMEM (scalar prefetch) — cluster ids to scan
        # q_ref:     [B, D] VMEM (whole query block)
        # values_hbm:[nlist, C, D] ANY/HBM
        # out_ref:   [U, B, C] ANY/HBM (async-copied per tile)
        # v_scr:     [nbuf, C, D] VMEM; s_scr: [2, B, C] f32 VMEM
        def copy_in(slot, j):
            return pltpu.make_async_copy(
                values_hbm.at[union_ref[j]], v_scr.at[slot], v_sem.at[slot])

        def copy_out(slot, j):
            return pltpu.make_async_copy(
                s_scr.at[slot], out_ref.at[j], o_sem.at[slot])

        for j in range(min(nbuf, n_union)):
            copy_in(j, j).start()

        def loop_body(j, _):
            slot = jax.lax.rem(j, nbuf)
            oslot = jax.lax.rem(j, 2)

            copy_in(slot, j).wait()
            tile = v_scr[slot].astype(compute_dtype)  # [C, D]

            # the copy-out of iteration j-2 must have drained before this
            # iteration overwrites its half of s_scr
            @pl.when(j >= 2)
            def _():
                copy_out(oslot, j - 2).wait()

            s_scr[oslot] = jax.lax.dot_general(
                q_ref[...].astype(compute_dtype), tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, C]
            copy_out(oslot, j).start()

            @pl.when(j + nbuf < n_union)
            def _():
                copy_in(slot, j + nbuf).start()

            return 0

        jax.lax.fori_loop(0, n_union, loop_body, 0)
        # drain the last two output copies
        copy_out(jax.lax.rem(n_union - 1, 2), n_union - 1).wait()

        @pl.when(n_union >= 2)
        def _():
            copy_out(jax.lax.rem(n_union, 2), n_union - 2).wait()

    return kernel


def _union_scores(q_in, union, values, interpret, nbuf=None):
    """[U, B, C] raw scores of every query against every union tile."""
    nlist, cap, d = values.shape
    b = q_in.shape[0]
    n_union = union.shape[0]
    if nbuf is None:
        # scoped VMEM is 16 MiB on v5e; leave room for s_scr + q
        tile_bytes = cap * d * values.dtype.itemsize
        nbuf = max(2, min(8, (12 << 20) // tile_bytes))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole q block
            pl.BlockSpec(memory_space=pl.ANY),  # values stay in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nbuf, cap, d), values.dtype),
            pltpu.VMEM((2, b, cap), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    compute_dtype = (
        jnp.float32 if values.dtype == jnp.float32 else jnp.bfloat16)
    return pl.pallas_call(
        _make_union_kernel(cap, d, n_union, nbuf, compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_union, b, cap), jnp.float32),
        interpret=interpret,
    )(union, q_in, values)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "metric", "interpret", "approx_topk"),
)
def pallas_ivf_topk(
    queries: jax.Array,  # [B, D] f32
    index: IVFIndex,
    k: int,
    nprobe: int = 32,
    metric: Metric = Metric.COSINE,
    mask: Optional[jax.Array] = None,  # [N] bool over global rows
    interpret: bool = False,
    approx_topk: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Approximate top-k via probe-driven cluster streaming.

    The optional global keep-mask applies to the full candidate set
    (nprobe * cluster_capacity per query), so filtering cannot displace
    candidates the way a per-cluster-truncated extraction would; heavy
    filtering should still raise nprobe.

    ``approx_topk`` swaps the exact final ``lax.top_k`` over the
    [B, nprobe*cap] candidate array for ``lax.approx_max_k`` — on TPU
    the exact form lowers to a full bitonic sort whose cost rivals the
    kernel itself at 10M scale, while approx_max_k's tiled reduction
    has recall >= 0.999 at these shapes (same trade bm25_inverted
    makes for generation; measured in scripts/tpu_profile_ivf.py).
    """
    metric = Metric(metric)
    q = queries.astype(jnp.float32)
    if metric == Metric.COSINE:
        nrm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        q = q / jnp.where(nrm > 0, nrm, 1.0)

    b, d = q.shape
    nlist, cap, _ = index.values.shape
    nprobe = min(nprobe, nlist)

    cs = q @ index.centroids.T  # [B, nlist] — tiny
    _, probes = jax.lax.top_k(cs, nprobe)
    probes = probes.astype(jnp.int32)

    compute_dtype = (
        jnp.float32 if index.values.dtype == jnp.float32 else jnp.bfloat16
    )
    q_in = q.astype(compute_dtype)

    # Tile-parallel dispatch: when the batch's probe lists union into few
    # enough tiles that the raw [U, B, C] score array stays modest, scan
    # the UNION once with full-query-block matmuls (MXU-shaped) instead
    # of per-query matvecs.  Queries see candidates from every union tile
    # — a strict superset of their own probe list, so recall only rises.
    n_union = min(nlist, b * nprobe)
    use_union = n_union * b * cap * 4 <= UNION_OUT_BYTES_MAX

    if use_union:
        flags = jnp.zeros((nlist,), jnp.float32).at[
            probes.reshape(-1)].set(1.0)
        _, union = jax.lax.top_k(flags, n_union)  # probed tiles first
        union = union.astype(jnp.int32)
        raw = _union_scores(q_in, union, index.values, interpret)
        cv = jnp.moveaxis(raw, 1, 0)  # [B, U, C]
        ci = jnp.broadcast_to(
            jnp.take(index.row_ids, union, axis=0)[None],
            (b, n_union, cap))
        if index.scales is not None:
            cv = cv * jnp.take(index.scales, union, axis=0)[None]
        if index.residual:
            cv = cv + jnp.take(cs, union, axis=1)[:, :, None]
        width = n_union
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole q array
                pl.BlockSpec(memory_space=pl.ANY),  # values stay in HBM
            ],
            out_specs=pl.BlockSpec((1, nprobe, 1, cap),
                                   lambda bi, p: (bi, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, cap, d), index.values.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        raw = pl.pallas_call(
            _make_kernel(cap, d, nprobe, compute_dtype),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, nprobe, 1, cap),
                                           jnp.float32),
            interpret=interpret,
        )(probes, q_in.reshape(b, 1, d), index.values)
        raw = raw.reshape(b, nprobe, cap)

        # dequant + tombstone mask + top-k on the tiny candidate set
        ci = jnp.take(index.row_ids, probes, axis=0)  # [B, np, cap] i32
        cv = raw
        if index.scales is not None:
            cv = cv * jnp.take(index.scales, probes, axis=0)
        if index.residual:
            # values hold x - centroid[cluster]; the probe score q@c
            # (already computed for probe selection) restores the full dot
            cv = cv + jnp.take_along_axis(cs, probes, axis=1)[:, :, None]
        width = nprobe

    keep = ci >= 0
    if mask is not None:
        keep &= jnp.take(mask, jnp.maximum(ci, 0))
    cv = jnp.where(keep, cv, NEG_INF)

    cv = cv.reshape(b, width * cap)
    ci = ci.reshape(b, width * cap)
    k_eff = min(k, width * cap)
    if approx_topk:
        fv, pos = jax.lax.approx_max_k(cv, k_eff)
    else:
        fv, pos = jax.lax.top_k(cv, k_eff)
    fi = jnp.take_along_axis(ci, pos, axis=-1)
    fi = jnp.where(jnp.isfinite(fv), fi, -1)
    # candidate location (cluster*cap + slot) for the refine stage
    if use_union:
        floc = (jnp.take(union, pos // cap) * cap
                + (pos % cap).astype(jnp.int32))
    else:
        floc = (jnp.take_along_axis(probes, pos // cap, axis=1) * cap
                + (pos % cap).astype(jnp.int32))

    # overflow segment merge + 1-bit sign-plane refine (shared tail)
    from super_rag_tpu.ops.ivf import attach_overflow_and_refine

    return attach_overflow_and_refine(q, cs, index, fv, fi, floc, k_eff,
                                      mask=mask, approx=approx_topk)
