"""IVF (inverted-file) index: on-device k-means + nprobe search.

The flat kernels (ops/dense.py, ops/pallas_topk.py) read the whole corpus
per query — HBM-bandwidth-bound at large N.  IVF bounds bytes-touched per
query to nprobe/nlist of the corpus (BASELINE.md config #5: the
recall@10 >= 0.95-at-equal-memory target lives here).

TPU-shaped layout — variable-length postings are hostile to XLA, so
clusters are FIXED-CAPACITY tiles:

    centroids [nlist, D] f32
    values    [nlist, C, D] int8/bf16   (C = capacity per cluster)
    scales    [nlist, C] f32            (int8 rows)
    row_ids   [nlist, C] int32          (-1 = empty slot)

Rows that overflow a full cluster go to a flat overflow segment that is
always scanned exactly (bounded by construction to a small fraction).
k-means runs on device: assignment is a blocked matmul argmax, the
centroid update is a blocked one-hot matmul — both MXU work.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from super_rag_tpu.ops.dense import DenseCorpus, Metric, dense_search
from super_rag_tpu.ops.quant import quantize_int8

NEG_INF = float("-inf")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class IVFIndex:
    centroids: jax.Array  # [nlist, D] f32 (unit-norm for cosine)
    values: jax.Array  # [nlist, C, D] storage dtype
    scales: Optional[jax.Array]  # [nlist, C] f32 for int8
    row_ids: jax.Array  # [nlist, C] int32, -1 empty
    overflow: Optional[DenseCorpus]  # flat remainder, always scanned
    overflow_rows: Optional[jax.Array]  # [M] int32 global ids
    # residual coding: values store x - centroid[cluster]; the search adds
    # the (already computed) q @ centroid probe score back, so the int8
    # step size shrinks with the residual norm — on clustered corpora the
    # quantization error drops severalfold at identical memory (the
    # classic IVF residual-coding trick, done the TPU way: the correction
    # is a take_along_axis on the [B, nprobe] probe scores, not a kernel
    # change).  Static pytree metadata so jitted searches can branch on it.
    residual: bool = False

    def tree_flatten(self):
        return (
            (self.centroids, self.values, self.scales, self.row_ids,
             self.overflow, self.overflow_rows),
            self.residual,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, residual=aux)

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def capacity(self) -> int:
        return self.values.shape[1]


# -- k-means --------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block",))
def _assign(x: jax.Array, centroids: jax.Array, block: int = 65536) -> jax.Array:
    """Nearest-centroid assignment by dot product (unit-norm data)."""
    n = x.shape[0]
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    nb = xp.shape[0] // block

    def body(_, xb):
        s = jax.lax.dot_general(
            xb, centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return None, jnp.argmax(s, axis=1).astype(jnp.int32)

    _, a = jax.lax.scan(body, None, xp.reshape(nb, block, x.shape[1]))
    return a.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("nlist", "block"))
def _update(x: jax.Array, assign: jax.Array, nlist: int,
            block: int = 65536) -> tuple[jax.Array, jax.Array]:
    """Centroid sums + counts via blocked one-hot matmuls (MXU)."""
    n, d = x.shape
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    ap = jnp.pad(assign, (0, pad), constant_values=nlist)  # pad bucket
    nb = xp.shape[0] // block

    def body(carry, inp):
        sums, counts = carry
        xb, ab = inp
        onehot = jax.nn.one_hot(ab, nlist, dtype=jnp.float32)  # [blk, nlist]
        sums = sums + jax.lax.dot_general(
            onehot, xb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = counts + jnp.sum(onehot, axis=0)
        return (sums, counts), None

    (sums, counts), _ = jax.lax.scan(
        body,
        (jnp.zeros((nlist, d), jnp.float32), jnp.zeros((nlist,), jnp.float32)),
        (xp.reshape(nb, block, d), ap.reshape(nb, block)),
    )
    return sums, counts


@functools.partial(jax.jit, static_argnames=("c", "block"))
def _assign_topc(x: jax.Array, centroids: jax.Array, c: int,
                 block: int = 16384) -> jax.Array:
    """Top-c nearest centroids per row (dot product, unit-norm data)."""
    n = x.shape[0]
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    nb = xp.shape[0] // block

    def body(_, xb):
        s = jax.lax.dot_general(
            xb, centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v, ids = jax.lax.top_k(s, c)
        return None, (ids.astype(jnp.int32), v)

    _, (a, v) = jax.lax.scan(body, None, xp.reshape(nb, block, x.shape[1]))
    return a.reshape(-1, c)[:n], v.reshape(-1, c)[:n]


def kmeans(
    x: jax.Array, nlist: int, iters: int = 10, seed: int = 0,
    metric: Metric = Metric.COSINE,
) -> jax.Array:
    """Lloyd's k-means on device; returns [nlist, D] centroids.

    Cosine metric uses spherical k-means (centroids re-normalized each
    iteration).  Empty clusters are re-seeded from random points.
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    if metric == Metric.COSINE:
        nrm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = x / jnp.where(nrm > 0, nrm, 1.0)
    rng = np.random.default_rng(seed)
    centroids = x[jnp.asarray(rng.choice(n, size=nlist, replace=False))]
    for it in range(iters):
        a = _assign(x, centroids)
        sums, counts = _update(x, a, nlist)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # reseed empties
        empty = counts < 0.5
        reseed = x[jnp.asarray(rng.choice(n, size=nlist, replace=False))]
        new = jnp.where(empty[:, None], reseed, new)
        if metric == Metric.COSINE:
            nrm = jnp.linalg.norm(new, axis=-1, keepdims=True)
            new = new / jnp.where(nrm > 0, nrm, 1.0)
        centroids = new
    return centroids


# -- build ------------------------------------------------------------------------


def build_ivf(
    embeddings: jax.Array,  # [N, D] f32 (raw; normalized here for cosine)
    nlist: int,
    capacity_factor: float = 1.5,
    dtype=jnp.int8,
    metric: Metric = Metric.COSINE,
    kmeans_iters: int = 10,
    seed: int = 0,
    sample: Optional[int] = 200_000,
    residual: Optional[bool] = None,  # default: on for int8
) -> IVFIndex:
    x = jnp.asarray(embeddings, jnp.float32)
    n, d = x.shape
    if metric == Metric.COSINE:
        nrm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = x / jnp.where(nrm > 0, nrm, 1.0)

    train = x
    if sample is not None and n > sample:
        rng = np.random.default_rng(seed)
        train = x[jnp.asarray(rng.choice(n, size=sample, replace=False))]
    centroids = kmeans(train, nlist, iters=kmeans_iters, seed=seed,
                       metric=metric)
    assign = np.asarray(_assign(x, centroids))

    capacity = max(8, int(np.ceil(n / nlist * capacity_factor)))
    capacity = -(-capacity // 64) * 64  # VMEM-tile-friendly (pallas_ivf)
    x_np = np.asarray(x)
    values = np.zeros((nlist, capacity, d), np.float32)
    row_ids = np.full((nlist, capacity), -1, np.int32)
    # vectorized cluster fill: sort rows by cluster, rank within each
    # cluster run, place rank < capacity, spill the rest to overflow
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    idx = np.arange(n, dtype=np.int64)
    is_start = np.empty(n, bool)
    if n:
        is_start[0] = True
        is_start[1:] = sorted_assign[1:] != sorted_assign[:-1]
    run_start = np.maximum.accumulate(np.where(is_start, idx, 0))
    rank = idx - run_start
    keep = rank < capacity
    if residual is None:
        residual = dtype == jnp.int8
    stored = x_np[order[keep]]
    if residual:
        stored = stored - np.asarray(centroids)[sorted_assign[keep]]
    values[sorted_assign[keep], rank[keep]] = stored
    row_ids[sorted_assign[keep], rank[keep]] = order[keep].astype(np.int32)
    overflow_rows = order[~keep].tolist()

    scales = None
    if dtype == jnp.int8:
        # quantize on the host: a device-side pass would materialize a
        # [nlist*capacity, d] f32 transient (several GB) next to the
        # training arrays and can OOM HBM during builds
        flat = values.reshape(-1, d)
        absmax = np.abs(flat).max(axis=-1)
        s_np = (absmax / 127.0).astype(np.float32)
        safe = np.where(s_np > 0, s_np, 1.0)
        q_np = np.clip(np.round(flat / safe[:, None]), -127, 127).astype(np.int8)
        vals = jnp.asarray(q_np.reshape(nlist, capacity, d))
        scales = s_np.reshape(nlist, capacity)
    else:
        vals = jnp.asarray(values, dtype)

    overflow = None
    overflow_ids = None
    if overflow_rows:
        of = x_np[np.asarray(overflow_rows)]
        if dtype == jnp.int8:
            oq, os_ = quantize_int8(jnp.asarray(of))
            overflow = DenseCorpus(values=oq, scales=os_)
        else:
            overflow = DenseCorpus(values=jnp.asarray(of, dtype))
        overflow_ids = jnp.asarray(np.asarray(overflow_rows, np.int32))

    return IVFIndex(
        centroids=centroids,
        values=vals,
        scales=jnp.asarray(scales) if scales is not None else None,
        row_ids=jnp.asarray(row_ids),
        overflow=overflow,  # overflow stores FULL vectors (scanned flat)
        overflow_rows=overflow_ids,
        residual=residual,
    )


def _balanced_place(
    cand: np.ndarray,  # [m, c] candidate clusters, best first
    counts: np.ndarray,  # [nlist] running fill counts (mutated)
    capacity: int,
    allowed: Optional[np.ndarray] = None,  # [m, c] bool: candidate usable
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy balanced placement: each row goes to its best candidate
    cluster with a free slot.  Returns (cluster, slot, unplaced_rows);
    vectorized rank-in-run per candidate round (no Python row loop)."""
    m, c = cand.shape
    placed_cl = np.full(m, -1, np.int64)
    placed_slot = np.full(m, -1, np.int64)
    todo = np.arange(m)
    for j in range(c):
        if todo.size == 0:
            break
        if allowed is not None:
            # a row whose j-th candidate is out of margin spills: later
            # candidates score even lower (top-k order), so none qualify
            todo = todo[allowed[todo, j]]
            if todo.size == 0:
                break
        cl = cand[todo, j].astype(np.int64)
        order = np.argsort(cl, kind="stable")
        scl = cl[order]
        idx = np.arange(scl.size, dtype=np.int64)
        is_start = np.empty(scl.size, bool)
        is_start[0] = True
        is_start[1:] = scl[1:] != scl[:-1]
        run_start = np.maximum.accumulate(np.where(is_start, idx, 0))
        rank = idx - run_start
        ok = rank < (capacity - counts[scl])
        rows = todo[order[ok]]
        placed_cl[rows] = scl[ok]
        placed_slot[rows] = counts[scl[ok]] + rank[ok]
        np.add.at(counts, scl[ok], 1)
        todo = todo[order[~ok]]
    return placed_cl, placed_slot, np.flatnonzero(placed_cl < 0)


def _quant_rows(stored: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    absmax = np.abs(stored).max(axis=1)
    s = np.where(absmax > 0, absmax, 1.0) / 127.0
    q = np.clip(np.rint(stored / s[:, None]), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def build_ivf_streaming(
    chunks,  # callable -> iterator of [m, D] float32 numpy chunks
    nlist: int,
    capacity_factor: float = 1.2,
    dtype=jnp.int8,
    metric: Metric = Metric.COSINE,
    kmeans_iters: int = 10,
    seed: int = 0,
    train_sample: int = 200_000,
    residual: Optional[bool] = None,
    assign_candidates: int = 4,
    spill_margin: float = 0.15,
) -> IVFIndex:
    """Corpus-scale IVF build that never materializes the f32 matrix.

    ``build_ivf`` places the whole [N, D] f32 corpus on device — 29 GB at
    the 10M x 768 north-star scale (SURVEY.md section 6).  This variant
    streams host chunks through three passes: (1) reservoir-sample a
    k-means training set, (2) top-c centroid assignment on device, and
    (3) BALANCED placement — a row whose nearest cluster is full goes to
    its next-nearest cluster with a free slot instead of the flat
    overflow segment.  With residual coding the stored value is
    x - centroid[placed], so scores stay exact regardless of which
    cluster holds the row (the probe score of the *storing* cluster is
    added back); only the probe-hit probability shifts, vs. an overflow
    scan that costs full-corpus-fraction bandwidth on every query.
    ``spill_margin`` bounds the relocation distance: a row only moves to
    a cluster whose centroid scores within that margin of its best — a
    relocation outside the margin would rarely be probed by the row's
    own neighborhood queries, so those rows go to the exactly-scanned
    overflow instead.  ``chunks`` is a zero-arg callable returning a
    fresh iterator (the stream is consumed twice).
    """
    if residual is None:
        residual = dtype == jnp.int8

    def norm(a: np.ndarray) -> np.ndarray:
        if metric == Metric.COSINE:
            nrm = np.linalg.norm(a, axis=1, keepdims=True)
            return a / np.where(nrm > 0, nrm, 1.0)
        return a

    # pass 1: count + reservoir sample for k-means training
    rng = np.random.default_rng(seed)
    reservoir: Optional[np.ndarray] = None
    filled = 0
    n = 0
    for chunk in chunks():
        chunk = norm(np.asarray(chunk, np.float32))
        m, d = chunk.shape
        if reservoir is None:
            reservoir = np.empty((train_sample, d), np.float32)
        take = min(train_sample - filled, m)
        if take > 0:
            reservoir[filled : filled + take] = chunk[:take]
            filled += take
            start = take
        else:
            start = 0
        if start < m:
            # vectorized reservoir replacement for the tail
            pos = rng.integers(0, n + start + np.arange(m - start) + 1)
            repl = pos < train_sample
            reservoir[pos[repl]] = chunk[start:][repl]
        n += m
    assert n > 0 and reservoir is not None, "empty corpus stream"
    train = reservoir[:filled]

    centroids = kmeans(jnp.asarray(train), nlist, iters=kmeans_iters,
                       seed=seed, metric=metric)
    cen_np = np.asarray(centroids)

    capacity = max(8, int(np.ceil(n / nlist * capacity_factor)))
    capacity = -(-capacity // 64) * 64  # VMEM-tile-friendly (pallas_ivf)

    store_int8 = dtype == jnp.int8
    if store_int8:
        values = np.zeros((nlist, capacity, cen_np.shape[1]), np.int8)
        scales = np.zeros((nlist, capacity), np.float32)
    else:
        import ml_dtypes

        np_dtype = (ml_dtypes.bfloat16 if dtype == jnp.bfloat16
                    else np.float32)
        values = np.zeros((nlist, capacity, cen_np.shape[1]), np_dtype)
        scales = None
    row_ids = np.full((nlist, capacity), -1, np.int32)
    counts = np.zeros(nlist, np.int64)
    of_vals: list[np.ndarray] = []
    of_scales: list[np.ndarray] = []
    of_rows: list[np.ndarray] = []

    # pass 2: assign + balanced fill
    base = 0
    cand_c = min(assign_candidates, nlist)
    for chunk in chunks():
        chunk = norm(np.asarray(chunk, np.float32))
        m = chunk.shape[0]
        cand_j, cscore_j = _assign_topc(jnp.asarray(chunk), centroids, cand_c)
        cand = np.asarray(cand_j)
        cscore = np.asarray(cscore_j)
        allowed = cscore >= (cscore[:, :1] - spill_margin)
        cl, slot, spill = _balanced_place(cand, counts, capacity, allowed)
        ok = cl >= 0
        stored = chunk[ok]
        if residual:
            stored = stored - cen_np[cl[ok]]
        if store_int8:
            q, s = _quant_rows(stored)
            values[cl[ok], slot[ok]] = q
            scales[cl[ok], slot[ok]] = s
        else:
            values[cl[ok], slot[ok]] = stored.astype(values.dtype)
        row_ids[cl[ok], slot[ok]] = (base + np.flatnonzero(ok)).astype(np.int32)
        if spill.size:
            sv = chunk[spill]
            if store_int8:
                q, s = _quant_rows(sv)
                of_vals.append(q)
                of_scales.append(s)
            else:
                of_vals.append(sv.astype(values.dtype))
            of_rows.append((base + spill).astype(np.int32))
        base += m

    overflow = None
    overflow_ids = None
    if of_vals:
        if store_int8:
            overflow = DenseCorpus(
                values=jnp.asarray(np.concatenate(of_vals)),
                scales=jnp.asarray(np.concatenate(of_scales)),
            )
        else:
            overflow = DenseCorpus(values=jnp.asarray(np.concatenate(of_vals)))
        overflow_ids = jnp.asarray(np.concatenate(of_rows))

    return IVFIndex(
        centroids=centroids,
        values=jnp.asarray(values),
        scales=jnp.asarray(scales) if scales is not None else None,
        row_ids=jnp.asarray(row_ids),
        overflow=overflow,
        overflow_rows=overflow_ids,
        residual=residual,
    )


# -- search -----------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "query_block", "has_mask", "residual"),
)
def _ivf_search_core(
    queries: jax.Array,  # [B, D] f32 unit-norm
    centroids: jax.Array,
    values: jax.Array,
    scales: Optional[jax.Array],
    row_ids: jax.Array,
    mask: Optional[jax.Array],  # [N] bool over global rows
    k: int,
    nprobe: int,
    query_block: int,
    has_mask: bool,
    residual: bool = False,
):
    b, d = queries.shape
    nlist, cap, _ = values.shape
    pad = (-b) % query_block
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    nqb = qp.shape[0] // query_block

    def per_block(_, qb):  # qb: [QB, D]
        cs = qb @ centroids.T  # [QB, nlist]
        _, probes = jax.lax.top_k(cs, nprobe)  # [QB, nprobe]
        # gather cluster tiles: [QB, nprobe, C, D]
        v = jnp.take(values, probes, axis=0)
        ids = jnp.take(row_ids, probes, axis=0)  # [QB, nprobe, C]
        vf = v.astype(jnp.bfloat16) if v.dtype == jnp.int8 else v
        s = jnp.einsum(
            "qd,qpcd->qpc", qb.astype(vf.dtype), vf,
            preferred_element_type=jnp.float32,
        )
        if scales is not None:
            s = s * jnp.take(scales, probes, axis=0)
        if residual:
            # values hold x - centroid[cluster]; add the probe score back
            s = s + jnp.take_along_axis(cs, probes, axis=1)[:, :, None]
        valid = ids >= 0
        if has_mask:
            valid = valid & jnp.take(mask, jnp.maximum(ids, 0))
        s = jnp.where(valid, s, NEG_INF)
        s = s.reshape(query_block, nprobe * cap)
        ids = ids.reshape(query_block, nprobe * cap)
        kk = min(k, nprobe * cap)
        v_top, pos = jax.lax.top_k(s, kk)
        i_top = jnp.take_along_axis(ids, pos, axis=-1)
        return None, (v_top, i_top)

    _, (vals_, ids_) = jax.lax.scan(
        per_block, None, qp.reshape(nqb, query_block, d)
    )
    kk = vals_.shape[-1]
    vals_ = vals_.reshape(nqb * query_block, kk)[:b]
    ids_ = ids_.reshape(nqb * query_block, kk)[:b]
    return vals_, ids_


def ivf_search(
    queries: jax.Array,
    index: IVFIndex,
    k: int,
    nprobe: int = 16,
    mask: Optional[jax.Array] = None,
    metric: Metric = Metric.COSINE,
    query_block: int = 32,
) -> tuple[jax.Array, jax.Array]:
    """Approximate top-k; returns (scores [B,k], global row ids [B,k])."""
    q = jnp.asarray(queries, jnp.float32)
    if metric == Metric.COSINE:
        nrm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        q = q / jnp.where(nrm > 0, nrm, 1.0)
    nprobe = min(nprobe, index.nlist)
    v, i = _ivf_search_core(
        q, index.centroids, index.values, index.scales, index.row_ids,
        mask, k=k, nprobe=nprobe, query_block=min(query_block, q.shape[0]),
        has_mask=mask is not None, residual=index.residual,
    )
    if index.overflow is not None:
        ov, oi_local = dense_search(
            q, index.overflow, k=min(k, index.overflow.size),
            metric=Metric.DOT,  # rows already unit-norm
            mask=(jnp.take(mask, index.overflow_rows)
                  if mask is not None else None),
        )
        oi = jnp.take(index.overflow_rows, oi_local)
        v = jnp.concatenate([v, ov], axis=1)
        i = jnp.concatenate([i, oi], axis=1)
        v, pos = jax.lax.top_k(v, k)
        i = jnp.take_along_axis(i, pos, axis=-1)
    return v, i
