"""Fused dense-search kernel: matmul + in-VMEM partial top-k epilogue.

The XLA path (ops/dense.py) writes [B, block] score tiles to HBM and runs
`lax.top_k` over them — top_k over a wide axis is VPU-serial and becomes
the bottleneck (measured ~10 TFLOP/s effective on v5e).  This kernel keeps
each score tile in VMEM and extracts the tile-local top-k in the matmul
epilogue, so HBM traffic is corpus-read-only and the only output is the
tiny [num_tiles, B, k] candidate tensor, merged afterwards with one small
top_k (SURVEY.md section 7.4 'Streaming top-k on TPU').

Extraction is k rounds of (max, argmax, suppress) over the [B, T] tile —
vectorized across B and lanes, O(k*T) per tile which is within ~2x of the
matmul cost for T=1024, D=768, k<=16.

Supports: bf16/f32 corpora, int8 corpora with per-row scales, cosine/ip
(pre-normalized corpus) and l2 (via per-row squared norms), and a per-row
boolean keep-mask.  All variants share one kernel; absent features are
compiled out statically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from super_rag_tpu.ops.dense import DenseCorpus, Metric

NEG_INF = float("-inf")


def _make_kernel(
    k: int,
    tile: int,
    has_scales: bool,
    has_norms: bool,
    has_mask: bool,
    int8_queries: bool = False,
):
    def kernel(*refs):
        it = iter(refs)
        q_ref = next(it)  # [B, D]
        qscale_ref = next(it) if int8_queries else None  # [B, 1] f32
        c_ref = next(it)  # [T, D]
        scales_ref = next(it) if has_scales else None  # [1, T]
        norms_ref = next(it) if has_norms else None  # [1, T]
        mask_ref = next(it) if has_mask else None  # [1, T]
        vals_ref = next(it)  # [1, B, k]
        idx_ref = next(it)  # [1, B, k]

        i = pl.program_id(0)

        c = c_ref[:]
        if int8_queries:
            # full int8 x int8 MXU matmul (2x bf16 throughput on v5e);
            # dequantize in the epilogue with per-query * per-row scales
            s = jax.lax.dot_general(
                q_ref[:], c,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            s = s * qscale_ref[:]  # [B, 1] broadcasts over T
        else:
            if c.dtype == jnp.int8:
                c = c.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q_ref[:].astype(c.dtype),
                c,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, T]
        if has_scales:
            s = s * scales_ref[0, :][None, :]
        if has_norms:
            s = 2.0 * s - norms_ref[0, :][None, :]
        if has_mask:
            s = jnp.where(mask_ref[0, :][None, :] != 0, s, NEG_INF)

        b = s.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (b, tile), dimension=1)
        base = i * tile

        def body(j, work):
            m = jnp.max(work, axis=1)  # [B]
            am = jnp.argmax(work, axis=1).astype(jnp.int32)  # [B]
            vals_ref[0, :, j] = m
            idx_ref[0, :, j] = am + base
            return jnp.where(col == am[:, None], NEG_INF, work)

        work = s
        for j in range(k):
            work = body(j, work)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile", "interpret", "int8_queries",
                     "per_tile_k"),
)
def pallas_dense_topk(
    queries: jax.Array,
    corpus: DenseCorpus,
    k: int,
    metric: Metric = Metric.COSINE,
    mask: Optional[jax.Array] = None,
    tile: int = 1024,
    interpret: bool = False,
    int8_queries: bool = False,
    per_tile_k: Optional[int] = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused top-k search; same contract as ops.dense.dense_search.

    Corpus rows are processed in ``tile``-row blocks streamed HBM->VMEM by
    the Pallas pipeline; rows are padded to a tile multiple (padding is
    masked out).  ``interpret=True`` runs the kernel in interpreter mode
    for CPU tests.  ``int8_queries=True`` (int8 corpora only) quantizes
    queries per-row and runs a full int8 x int8 MXU matmul.
    """
    metric = Metric(metric)
    q = queries.astype(jnp.float32)
    if metric == Metric.COSINE:
        nrm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        q = q / jnp.where(nrm > 0, nrm, 1.0)

    n = corpus.size
    k_eff = min(k, n)
    # The in-kernel extraction costs k rounds of (max, argmax, suppress)
    # per tile; for deep candidate lists (k ~ 100) cap the per-tile
    # extraction and recover the global top-k from the tile-local
    # candidates.  Exactness holds unless one tile holds more than
    # ``kt`` of the global top-k (rows are insertion-ordered, so winners
    # spread across tiles; the benches measure recall to keep this
    # honest).  per_tile_k=None keeps the exact per-tile k.
    kt = min(k_eff, per_tile_k) if per_tile_k is not None else k_eff
    pad = (-n) % tile
    # the tile-local candidates must be able to cover k_eff in total
    # (small corpora / few tiles would otherwise underfeed the merge)
    num_tiles_ = (n + pad) // tile
    kt = max(kt, -(-k_eff // max(num_tiles_, 1)))
    # skip no-op pads: at 10M rows a pad copy transiently doubles HBM
    values = (jnp.pad(corpus.values, ((0, pad), (0, 0))) if pad
              else corpus.values)
    has_scales = corpus.scales is not None
    has_norms = metric == Metric.L2
    needs_mask = mask is not None or pad > 0
    keep = jnp.ones((n,), jnp.bool_) if mask is None else mask
    if pad:
        keep = jnp.pad(keep, (0, pad), constant_values=False)

    num_tiles = values.shape[0] // tile
    b, d = q.shape

    int8_queries = int8_queries and values.dtype == jnp.int8
    if int8_queries:
        from super_rag_tpu.ops.quant import quantize_int8

        q_i8, q_scale = quantize_int8(q)
        inputs = [q_i8, q_scale.reshape(b, 1), values]
        in_specs = [
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    else:
        inputs = [
            q.astype(jnp.bfloat16 if values.dtype != jnp.float32 else jnp.float32),
            values,
        ]
        in_specs = [
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    row_spec = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    if has_scales:
        inputs.append(
            jnp.pad(corpus.scales, (0, pad)).reshape(1, -1).astype(jnp.float32)
        )
        in_specs.append(row_spec)
    if has_norms:
        inputs.append(
            jnp.pad(corpus.norms_sq, (0, pad)).reshape(1, -1).astype(jnp.float32)
        )
        in_specs.append(row_spec)
    if needs_mask:
        inputs.append(keep.reshape(1, -1).astype(jnp.int8))
        in_specs.append(row_spec)

    kernel = _make_kernel(
        kt, tile, has_scales, has_norms, needs_mask,
        int8_queries=int8_queries,
    )
    bytes_per = jnp.dtype(values.dtype).itemsize
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, b, kt), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, kt), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, b, kt), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, b, kt), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            # default scoped-vmem cap is 16MB; large tiles need more
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * tile * num_tiles,
            bytes_accessed=num_tiles * tile * d * bytes_per + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)

    # Merge tile-local candidates: [num_tiles, B, kt] -> [B, k].
    cv = jnp.moveaxis(vals, 0, 1).reshape(b, num_tiles * kt)
    ci = jnp.moveaxis(idxs, 0, 1).reshape(b, num_tiles * kt)
    fv, pos = jax.lax.top_k(cv, k_eff)
    fi = jnp.take_along_axis(ci, pos, axis=-1)
    return fv, fi
