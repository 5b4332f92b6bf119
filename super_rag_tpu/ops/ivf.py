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
    # 1-bit error-refinement plane: sign of the int8 quantization error
    # per element, bit-packed ([nlist, C, D//8] uint8, little bit order).
    # Search re-scores its candidate pool with codes + 0.25*sign — half
    # the quantization noise for 1/8 the memory of the codes — entirely
    # OUTSIDE the streaming kernel (a [B, k, D] gather + einsum on the
    # tiny pool).  Measured on the 10M north-star corpus: recall@10
    # 0.945 -> ~0.98 (scripts/diag_10m_recall.py).
    sign_plane: Optional[jax.Array] = None
    of_sign_plane: Optional[jax.Array] = None  # [M, D//8] uint8
    # residual-coded overflow: overflow values store x - centroid[nearest]
    # and of_assign [M] int32 names that centroid; the probe-score row
    # q @ C^T (already computed) restores the full dot.  Overflow rows
    # are the quantization-noisiest segment without this (no residual
    # shrink): sigma 2.8e-4 vs 8.8e-5 in-cluster on the 10M corpus.
    of_assign: Optional[jax.Array] = None

    def tree_flatten(self):
        return (
            (self.centroids, self.values, self.scales, self.row_ids,
             self.overflow, self.overflow_rows, self.sign_plane,
             self.of_sign_plane, self.of_assign),
            self.residual,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (cen, vals, scl, rid, of, ofr, sp, ofsp, ofa) = children
        return cls(cen, vals, scl, rid, of, ofr, residual=aux,
                   sign_plane=sp, of_sign_plane=ofsp, of_assign=ofa)

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


def kmeans_twolevel(
    x: jax.Array, nlist: int, coarse: int, iters: int = 10, seed: int = 0,
    metric: Metric = Metric.COSINE, coarse_train: int = 32768,
) -> tuple[jax.Array, jax.Array]:
    """Hierarchical spherical k-means: ``coarse`` top-level clusters, then
    ``nlist // coarse`` fine centroids per coarse group (coarse-major
    layout: fine centroid ``g * fpb + j`` belongs to coarse group ``g``).

    Returns ``(centroids [nlist, D], coarse_centroids [coarse, D])``.

    Why: flat Lloyd's at nlist=16384 over a 200k train set is
    ~5e16 FLOPs — infeasible on this image's 1-core CPU backend
    (~1e11 FLOP/s measured, CLAUDE.md round-5 addendum).  Hierarchical
    training costs coarse_train x coarse + n_train x (coarse + fpb)
    per iteration — ~64x less at nlist 16384 / coarse 128.
    """
    fpb, rem = divmod(nlist, coarse)
    assert rem == 0, f"nlist {nlist} must be a multiple of coarse {coarse}"
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    if metric == Metric.COSINE:
        nrm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = x / jnp.where(nrm > 0, nrm, 1.0)
    rng = np.random.default_rng(seed)
    sub = x if n <= coarse_train else x[jnp.asarray(
        rng.choice(n, size=coarse_train, replace=False))]
    cen_c = kmeans(sub, coarse, iters=iters, seed=seed, metric=metric)
    a = np.asarray(_assign(x, cen_c))
    x_np = np.asarray(x)
    centroids = np.empty((nlist, d), np.float32)
    order = np.argsort(a, kind="stable")
    bounds = np.searchsorted(a[order], np.arange(coarse + 1))
    for g in range(coarse):
        rows = order[bounds[g] : bounds[g + 1]]
        if rows.size == 0:
            # empty coarse group: reseed its fine block from random rows
            rows = rng.choice(n, size=min(n, 4 * fpb), replace=False)
        members = jnp.asarray(x_np[rows])
        if rows.size <= fpb:
            # fewer members than fine slots: use members + random fill
            fill = x_np[rng.choice(n, size=fpb - rows.size, replace=True)]
            block = np.concatenate([x_np[rows], fill]) if rows.size else fill
            centroids[g * fpb : (g + 1) * fpb] = block
        else:
            centroids[g * fpb : (g + 1) * fpb] = np.asarray(
                kmeans(members, fpb, iters=iters, seed=seed + 1 + g,
                       metric=metric))
    return jnp.asarray(centroids), cen_c


def _assign_topc_grouped(
    chunk: np.ndarray,  # [m, D] unit-norm float32 (host)
    centroids: np.ndarray,  # [nlist, D] coarse-major fine centroids (host)
    coarse: np.ndarray,  # [kc, D] coarse centroids (host)
    c: int,
    p: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Two-level top-c assignment on host numpy (BLAS matmuls).

    Scores the ``kc`` coarse centroids, then only the fine centroids of
    each row's top-``p`` coarse groups — (kc + p * fpb) dots per row
    instead of nlist.  Same (cand [m, c], cscore [m, c]) contract as
    ``_assign_topc``.  Rows near a coarse boundary can miss their true
    nearest fine centroid when it lives in an unprobed group; with
    residual coding + balanced placement that only shifts probe-hit
    probability, never stored-score correctness (build_ivf_streaming
    docstring) — recall parity is asserted in
    tests/test_ivf_twolevel.py.
    """
    kc, d = coarse.shape
    nlist = centroids.shape[0]
    fpb = nlist // kc
    p = min(p, kc)
    m = chunk.shape[0]
    s_c = chunk @ coarse.T  # [m, kc]
    topp = np.argpartition(-s_c, p - 1, axis=1)[:, :p]  # [m, p]
    cand = np.empty((m, p * fpb), np.int32)
    score = np.full((m, p * fpb), -np.inf, np.float32)
    base = np.arange(fpb, dtype=np.int32)
    for j in range(p):
        g = topp[:, j]
        order = np.argsort(g, kind="stable")
        bounds = np.searchsorted(g[order], np.arange(kc + 1))
        col = slice(j * fpb, (j + 1) * fpb)
        for gi in range(kc):
            rows = order[bounds[gi] : bounds[gi + 1]]
            if rows.size == 0:
                continue
            blk = centroids[gi * fpb : (gi + 1) * fpb]
            score[rows, col] = chunk[rows] @ blk.T
            cand[rows, col] = gi * fpb + base
    # duplicate fine ids across the p slots (two top-p groups never
    # coincide: argpartition indices are distinct) — no dedup needed
    c_eff = min(c, p * fpb)
    top = np.argpartition(-score, c_eff - 1, axis=1)[:, :c_eff]
    sv = np.take_along_axis(score, top, axis=1)
    order = np.argsort(-sv, axis=1, kind="stable")
    sv = np.take_along_axis(sv, order, axis=1)
    ci = np.take_along_axis(np.take_along_axis(cand, top, axis=1),
                            order, axis=1)
    return ci, sv


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
    ids: Optional[np.ndarray] = None,  # original row id per input row
) -> IVFIndex:
    """``ids``: maps input positions to caller row ids (defaults to
    arange).  Lets mutable engines build over LIVE rows only — deleted
    rows would otherwise occupy cluster capacity and probe bandwidth
    forever (churn fidelity decay, found by bench_churn r4)."""
    x = jnp.asarray(embeddings, jnp.float32)
    n, d = x.shape
    ids_arr = (np.arange(n, dtype=np.int32) if ids is None
               else np.asarray(ids, np.int32))
    assert ids_arr.shape == (n,), "ids must map every input row"
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
    # 128-aligned: the union kernel async-copies [B, C] score tiles
    # whose LANE dim is C — Mosaic requires 128-multiple slices there
    # (a 64-only multiple like 1216 fails AOT compile on v5e, seen in
    # the r5 p50 run at 1M/nlist=1024)
    capacity = -(-capacity // 128) * 128
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
    row_ids[sorted_assign[keep], rank[keep]] = ids_arr[order[keep]]
    overflow_rows = order[~keep].tolist()  # positions into x_np/assign

    scales = None
    sign_plane = None
    use_signs = dtype == jnp.int8 and d % 8 == 0
    if dtype == jnp.int8:
        # quantize on the host: a device-side pass would materialize a
        # [nlist*capacity, d] f32 transient (several GB) next to the
        # training arrays and can OOM HBM during builds
        flat = values.reshape(-1, d)
        q_np, s_np = _quant_rows(flat)
        if use_signs:
            sign_plane = jnp.asarray(
                pack_error_signs(flat, q_np, s_np).reshape(
                    nlist, capacity, d // 8))
        vals = jnp.asarray(q_np.reshape(nlist, capacity, d))
        scales = s_np.reshape(nlist, capacity)
    else:
        vals = jnp.asarray(values, dtype)

    overflow = None
    overflow_ids = None
    of_sign = None
    of_assign = None
    if overflow_rows:
        of_idx = np.asarray(overflow_rows)
        of = x_np[of_idx]
        if dtype == jnp.int8:
            if residual:
                # residual-code overflow vs the row's OWN best cluster
                # (it spilled that cluster's capacity, not its
                # neighborhood): same noise shrink as in-cluster rows
                of_assign_np = assign[of_idx].astype(np.int32)
                of = of - np.asarray(centroids)[of_assign_np]
                of_assign = jnp.asarray(of_assign_np)
            oq_np, os_np = _quant_rows(of)
            if use_signs:
                of_sign = jnp.asarray(pack_error_signs(of, oq_np, os_np))
            overflow = DenseCorpus(values=jnp.asarray(oq_np),
                                   scales=jnp.asarray(os_np))
        else:
            overflow = DenseCorpus(values=jnp.asarray(of, dtype))
        overflow_ids = jnp.asarray(ids_arr[of_idx])

    return IVFIndex(
        centroids=centroids,
        values=vals,
        scales=jnp.asarray(scales) if scales is not None else None,
        row_ids=jnp.asarray(row_ids),
        overflow=overflow,
        overflow_rows=overflow_ids,
        residual=residual,
        sign_plane=sign_plane,
        of_sign_plane=of_sign,
        of_assign=of_assign,
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


def pack_error_signs(stored: np.ndarray, q: np.ndarray,
                     s: np.ndarray) -> np.ndarray:
    """Bit-pack the sign of the quantization error (host build step).

    ``stored/s - q`` is uniform on [-0.5, 0.5]; its sign is one free bit
    of refinement: dequantizing as ``s * (q + 0.25*sign)`` halves the
    error std.  Little bit order so the device unpack (shift/and) maps
    bit b of byte j to element 8j+b.
    """
    e = stored / s[:, None] - q
    return np.packbits(e > 0, axis=-1, bitorder="little")


def unpack_signs(codes: jax.Array) -> jax.Array:
    """[..., D//8] uint8 -> [..., D] float32 in {-1, +1} (device side)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (codes[..., None] >> shifts) & jnp.uint8(1)
    signs = bits.astype(jnp.float32) * 2.0 - 1.0
    return signs.reshape(*codes.shape[:-1], codes.shape[-1] * 8)


def refine_candidates(
    q: jax.Array,           # [B, D] f32 (unit-norm already for cosine)
    cs: jax.Array,          # [B, nlist] probe scores q @ centroids.T
    index: IVFIndex,
    fv: jax.Array,          # [B, K] phase-1 scores (sorted desc, -inf pad)
    fi: jax.Array,          # [B, K] global row ids (-1 invalid)
    loc: jax.Array,         # [B, K] candidate location codes:
                            #   in-cluster: cluster*cap + slot
                            #   overflow:   nlist*cap + overflow_idx
) -> tuple[jax.Array, jax.Array]:
    """Re-score the candidate pool with the 1-bit error-refinement plane.

    Phase 1 (kernel / blocked scan) ranks by the raw int8 dequant — its
    noise only has to keep the true top-k INSIDE the pool, which holds
    with huge margin (pool-boundary score gaps are ~30x the noise at the
    10M operating point).  This stage re-derives each pooled candidate's
    score from its codes + error signs + exact centroid correction, then
    re-sorts.  Cost: two [B, K, D] gathers and einsums — microseconds
    next to the streaming kernel.
    """
    nlist, cap, d = index.values.shape
    split = nlist * cap
    in_cl = loc < split
    lc = jnp.clip(loc, 0, split - 1)
    vals = jnp.take(index.values.reshape(split, d), lc, axis=0)
    scl = jnp.take(index.scales.reshape(split), lc, axis=0)
    sgn = unpack_signs(
        jnp.take(index.sign_plane.reshape(split, d // 8), lc, axis=0))
    cl_of_loc = lc // cap
    if index.overflow is not None:
        m = index.overflow.size
        oc = jnp.clip(loc - split, 0, m - 1)
        vals_of = jnp.take(index.overflow.values, oc, axis=0)
        scl_of = jnp.take(index.overflow.scales, oc, axis=0)
        vals = jnp.where(in_cl[..., None], vals, vals_of)
        scl = jnp.where(in_cl, scl, scl_of)
        if index.of_sign_plane is not None:
            sgn_of = unpack_signs(jnp.take(index.of_sign_plane, oc, axis=0))
            sgn = jnp.where(in_cl[..., None], sgn, sgn_of)
        if index.of_assign is not None:
            cl_of_loc = jnp.where(in_cl, cl_of_loc,
                                  jnp.take(index.of_assign, oc))
    qf = q.astype(jnp.float32)
    dots = jnp.einsum("bkd,bd->bk", vals.astype(jnp.float32), qf)
    dots = dots + 0.25 * jnp.einsum("bkd,bd->bk", sgn, qf)
    scores = dots * scl
    if index.residual:
        corr = jnp.take_along_axis(cs, cl_of_loc, axis=1)
        if index.of_assign is None and index.overflow is not None:
            # overflow rows store FULL vectors (legacy layout): no add-back
            corr = jnp.where(in_cl, corr, 0.0)
        scores = scores + corr
    scores = jnp.where(fi >= 0, scores, NEG_INF)
    k = fv.shape[1]
    rv, pos = jax.lax.top_k(scores, k)
    ri = jnp.take_along_axis(fi, pos, axis=-1)
    return rv, jnp.where(jnp.isfinite(rv), ri, -1)


def overflow_topk(
    q: jax.Array,            # [B, D] f32
    cs: Optional[jax.Array],  # [B, nlist] probe scores (residual add-back)
    index: IVFIndex,
    k: int,
    mask: Optional[jax.Array] = None,  # [N] bool over GLOBAL rows
    block_size: int = 65536,
    approx: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k over the overflow segment; returns (scores, global ids,
    LOCAL overflow indices).  Residual-coded overflow (``of_assign``) adds
    the stored-centroid probe score back per block — the [B, M] bias is
    never materialized whole."""
    of = index.overflow
    m = of.size
    k_eff = min(k, m)
    assign = index.of_assign
    use_bias = assign is not None and cs is not None

    pad = (-m) % block_size
    values = jnp.pad(of.values, ((0, pad), (0, 0)))
    scales = jnp.pad(of.scales, (0, pad)) if of.scales is not None else None
    keep = jnp.ones((m,), jnp.bool_) if mask is None else jnp.take(
        mask, index.overflow_rows)
    keep = jnp.pad(keep, (0, pad), constant_values=False)
    assign_p = (jnp.pad(assign, (0, pad)) if use_bias
                else jnp.zeros((m + pad,), jnp.int32))
    nb = values.shape[0] // block_size
    d = values.shape[1]

    def body(carry, inp):
        bvals, bscales, bkeep, bassign, base = inp
        v = bvals.astype(jnp.bfloat16) if bvals.dtype == jnp.int8 else bvals
        s = jax.lax.dot_general(
            q.astype(v.dtype), v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bscales is not None:
            s = s * bscales[None, :]
        if use_bias:
            s = s + jnp.take(cs, bassign, axis=1)
        s = jnp.where(bkeep[None, :], s, NEG_INF)
        kb = min(k_eff, block_size)
        if approx and kb < block_size:
            # the exact form is a full bitonic sort per block — at the
            # 10M overflow scale (~24 blocks) that alone busts the p50
            # budget; the refine stage re-scores the pool exactly anyway
            v_, i_ = jax.lax.approx_max_k(s, kb)
        else:
            v_, i_ = jax.lax.top_k(s, kb)
        return carry, (v_, i_.astype(jnp.int32) + base)

    has_scales = scales is not None

    def body_wrapped(carry, inp):
        bvals, bscales, bkeep, bassign, base = inp
        return body(carry, (bvals, bscales if has_scales else None,
                            bkeep, bassign, base))

    _, (vals_, idxs_) = jax.lax.scan(
        body_wrapped, None,
        (values.reshape(nb, block_size, d),
         (scales.reshape(nb, block_size) if has_scales
          else jnp.zeros((nb, 0))),
         keep.reshape(nb, block_size),
         assign_p.reshape(nb, block_size),
         jnp.arange(nb, dtype=jnp.int32) * block_size),
    )
    kb = vals_.shape[-1]
    b = q.shape[0]
    vals_ = jnp.moveaxis(vals_, 0, 1).reshape(b, nb * kb)
    idxs_ = jnp.moveaxis(idxs_, 0, 1).reshape(b, nb * kb)
    ov, pos = jax.lax.top_k(vals_, k_eff)
    oi_local = jnp.take_along_axis(idxs_, pos, axis=-1)
    oi = jnp.take(index.overflow_rows, oi_local)
    return ov, oi, oi_local


def attach_overflow_and_refine(
    q: jax.Array,
    cs: Optional[jax.Array],
    index: IVFIndex,
    fv: jax.Array,   # [B, K] in-cluster phase scores
    fi: jax.Array,   # [B, K] global row ids
    floc: jax.Array,  # [B, K] location codes (cluster*cap + slot)
    k: int,
    mask: Optional[jax.Array] = None,
    approx: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Shared tail of every dense-tier search: merge the overflow
    segment's exact top-k into the in-cluster candidates, then re-score
    the pool with the 1-bit sign plane (refine_candidates)."""
    split = index.nlist * index.capacity
    if index.overflow is not None:
        if index.of_assign is not None:
            ov, oi, oi_local = overflow_topk(q, cs, index, k, mask=mask,
                                             approx=approx)
        else:
            ov, oi_local = dense_search(
                q, index.overflow, k=min(k, index.overflow.size),
                metric=Metric.DOT,  # rows already unit-norm
                mask=(jnp.take(mask, index.overflow_rows)
                      if mask is not None else None),
            )
            oi = jnp.take(index.overflow_rows, oi_local)
        fv = jnp.concatenate([fv, ov], axis=1)
        fi = jnp.concatenate([fi, oi], axis=1)
        floc = jnp.concatenate(
            [floc, split + oi_local.astype(jnp.int32)], axis=1)
        fv, pos = jax.lax.top_k(fv, k)
        fi = jnp.take_along_axis(fi, pos, axis=-1)
        floc = jnp.take_along_axis(floc, pos, axis=-1)
    if index.sign_plane is not None:
        fv, fi = refine_candidates(q, cs, index, fv, fi, floc)
    return fv, fi


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "approx_topk", "block_clusters",
                     "int8_queries"),
)
def ivf_flat_topk(
    queries: jax.Array,
    index: IVFIndex,
    k: int,
    metric: Metric = Metric.COSINE,
    mask: Optional[jax.Array] = None,
    approx_topk: bool = True,
    block_clusters: Optional[int] = None,
    int8_queries: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Large-batch tier: exact scan of every cluster tile, MXU-shaped.

    When B * nprobe approaches nlist the probe union covers the whole
    index, so probing saves no bytes — but a per-query (or even
    per-tile) kernel still starves the MXU.  This tier reads the
    [nlist, C, D] array ONCE per batch as big [B, D] @ [D, block]
    matmuls (block = whole cluster tiles, so the residual add-back is a
    broadcast over the [B, clusters, C] view that XLA fuses into the
    matmul epilogue), takes per-block approx_max_k, merges, then runs
    the shared overflow + sign-refine tail.  Equivalent of the
    reference's brute-force/batch path (seekdb_connector.py:98) but
    quantization-refined and single-program.
    """
    metric = Metric(metric)
    q = jnp.asarray(queries, jnp.float32)
    if metric == Metric.COSINE:
        nrm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        q = q / jnp.where(nrm > 0, nrm, 1.0)
    b = q.shape[0]
    nlist, cap, d = index.values.shape
    cs = q @ index.centroids.T  # [B, nlist]

    if block_clusters is None:
        # largest divisor of nlist whose block stays near 512k rows
        target = max(1, (1 << 19) // cap)
        block_clusters = 1
        for c in range(1, nlist + 1):
            if nlist % c == 0 and c <= target:
                block_clusters = c
    cpb = block_clusters
    nb = nlist // cpb
    blk = cpb * cap
    k_blk = min(k, blk)

    has_scales = index.scales is not None
    cs_blocks = jnp.moveaxis(cs.reshape(b, nb, cpb), 1, 0)  # [nb, B, cpb]

    use_int8 = int8_queries and index.values.dtype == jnp.int8
    if use_int8:
        # phase-1 ranking runs the int8 MXU mode (2x bf16 throughput);
        # the refine stage re-scores the pool against f32 queries, so
        # query-quantization noise never reaches the returned scores
        q_abs = jnp.abs(q).max(axis=-1)
        sq = jnp.where(q_abs > 0, q_abs, 1.0) / 127.0
        q_i8 = jnp.clip(jnp.round(q / sq[:, None]), -127, 127).astype(
            jnp.int8)

    def body(carry, inp):
        bvals, bscales, brow, bcs, base = inp
        v2 = bvals.reshape(blk, d)
        if use_int8:
            sc = jax.lax.dot_general(
                q_i8, v2,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * sq[:, None]
        else:
            cdt = (jnp.float32 if index.values.dtype == jnp.float32
                   else jnp.bfloat16)
            sc = jax.lax.dot_general(
                q.astype(cdt), v2.astype(cdt),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, blk]
        if has_scales:
            sc = sc * bscales.reshape(blk)[None, :]
        if index.residual:
            sc = (sc.reshape(b, cpb, cap)
                  + bcs[:, :, None]).reshape(b, blk)
        keep = brow.reshape(blk) >= 0
        if mask is not None:
            keep &= jnp.take(mask, jnp.maximum(brow.reshape(blk), 0))
        sc = jnp.where(keep[None, :], sc, NEG_INF)
        if approx_topk:
            v_, p_ = jax.lax.approx_max_k(sc, k_blk)
        else:
            v_, p_ = jax.lax.top_k(sc, k_blk)
        return carry, (v_, p_.astype(jnp.int32) + base)

    _, (vs, locs) = jax.lax.scan(
        body, None,
        (index.values.reshape(nb, cpb, cap, d),
         (index.scales.reshape(nb, cpb, cap) if has_scales
          else jnp.zeros((nb, 0))),
         index.row_ids.reshape(nb, cpb, cap),
         cs_blocks,
         jnp.arange(nb, dtype=jnp.int32) * blk),
    )
    vs = jnp.moveaxis(vs, 0, 1).reshape(b, nb * k_blk)
    locs = jnp.moveaxis(locs, 0, 1).reshape(b, nb * k_blk)
    k_eff = min(k, nb * k_blk)
    fv, pos = jax.lax.top_k(vs, k_eff)
    floc = jnp.take_along_axis(locs, pos, axis=-1)
    fi = jnp.take(index.row_ids.reshape(nlist * cap), floc)
    fi = jnp.where(jnp.isfinite(fv), fi, -1)
    return attach_overflow_and_refine(q, cs, index, fv, fi, floc, k_eff,
                                      mask=mask, approx=approx_topk)


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
    host_arrays: bool = False,
    ids: Optional[np.ndarray] = None,  # original row id per streamed row
    coarse: Optional[int] = None,
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

    ``coarse`` (e.g. sqrt(nlist)) switches BOTH k-means training and
    pass-2 assignment to the two-level path (kmeans_twolevel /
    _assign_topc_grouped): ~(coarse + 2 * nlist/coarse) dots per row
    instead of nlist — at the 10M x 768 / nlist 16384 north star that
    is ~4e15 FLOPs instead of ~2.5e17, turning a weeks-long CPU build
    (CLAUDE.md round-5 addendum) into an overnight one, and cutting the
    on-device assignment cost the same 64x.
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

    coarse_np = None
    if coarse is not None and coarse > 1:
        centroids, cen_coarse = kmeans_twolevel(
            jnp.asarray(train), nlist, coarse, iters=kmeans_iters,
            seed=seed, metric=metric)
        coarse_np = np.asarray(cen_coarse)
    else:
        centroids = kmeans(jnp.asarray(train), nlist, iters=kmeans_iters,
                           seed=seed, metric=metric)
    cen_np = np.asarray(centroids)

    capacity = max(8, int(np.ceil(n / nlist * capacity_factor)))
    # 128-aligned: the union kernel async-copies [B, C] score tiles
    # whose LANE dim is C — Mosaic requires 128-multiple slices there
    # (a 64-only multiple like 1216 fails AOT compile on v5e, seen in
    # the r5 p50 run at 1M/nlist=1024)
    capacity = -(-capacity // 128) * 128

    store_int8 = dtype == jnp.int8
    use_signs = store_int8 and cen_np.shape[1] % 8 == 0
    if store_int8:
        values = np.zeros((nlist, capacity, cen_np.shape[1]), np.int8)
        scales = np.zeros((nlist, capacity), np.float32)
        signs = (np.zeros((nlist, capacity, cen_np.shape[1] // 8), np.uint8)
                 if use_signs else None)
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
    of_signs: list[np.ndarray] = []
    of_assign_l: list[np.ndarray] = []

    # pass 2: assign + balanced fill
    ids_arr = None if ids is None else np.asarray(ids, np.int32)
    if ids_arr is not None:
        assert ids_arr.shape == (n,), "ids must map every streamed row"
    base = 0
    cand_c = min(assign_candidates, nlist)
    for chunk in chunks():
        chunk = norm(np.asarray(chunk, np.float32))
        m = chunk.shape[0]
        if coarse_np is not None:
            cand, cscore = _assign_topc_grouped(
                chunk, cen_np, coarse_np, cand_c)
        else:
            cand_j, cscore_j = _assign_topc(jnp.asarray(chunk), centroids,
                                            cand_c)
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
            if use_signs:
                signs[cl[ok], slot[ok]] = pack_error_signs(stored, q, s)
        else:
            values[cl[ok], slot[ok]] = stored.astype(values.dtype)
        pos = base + np.flatnonzero(ok)
        row_ids[cl[ok], slot[ok]] = (
            ids_arr[pos] if ids_arr is not None else pos.astype(np.int32)
        )
        if spill.size:
            sv = chunk[spill]
            if store_int8 and residual:
                # residual-code spilled rows vs their BEST centroid —
                # the probe-score row restores the full dot at search
                sv = sv - cen_np[cand[spill, 0]]
                of_assign_l.append(cand[spill, 0].astype(np.int32))
            if store_int8:
                q, s = _quant_rows(sv)
                of_vals.append(q)
                of_scales.append(s)
                if use_signs:
                    of_signs.append(pack_error_signs(sv, q, s))
            else:
                of_vals.append(sv.astype(values.dtype))
            sp = base + spill
            of_rows.append(ids_arr[sp] if ids_arr is not None
                           else sp.astype(np.int32))
        base += m

    # ``host_arrays`` keeps the result in host numpy: builders that only
    # want to CACHE the index skip two ~10 GB relay transfers (device-put
    # here + device-get in the caller) — on this image's remote TPU a
    # transfer that size can wedge indefinitely (CLAUDE.md), and the
    # build phase itself never searches the arrays it just wrote.
    put = (lambda a: a) if host_arrays else jnp.asarray

    overflow = None
    overflow_ids = None
    of_sign = None
    of_assign = None
    if of_vals:
        if store_int8:
            overflow = DenseCorpus(
                values=put(np.concatenate(of_vals)),
                scales=put(np.concatenate(of_scales)),
            )
            if use_signs:
                of_sign = put(np.concatenate(of_signs))
            if of_assign_l:
                of_assign = put(np.concatenate(of_assign_l))
        else:
            overflow = DenseCorpus(values=put(np.concatenate(of_vals)))
        overflow_ids = put(np.concatenate(of_rows))

    return IVFIndex(
        centroids=np.asarray(centroids) if host_arrays else centroids,
        values=put(values),
        scales=put(scales) if scales is not None else None,
        row_ids=put(row_ids),
        overflow=overflow,
        overflow_rows=overflow_ids,
        residual=residual,
        sign_plane=put(signs) if use_signs else None,
        of_sign_plane=of_sign,
        of_assign=of_assign,
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
        # candidate location (cluster*cap + slot) for the refine stage
        cl_top = jnp.take_along_axis(probes, pos // cap, axis=1)
        loc_top = cl_top.astype(jnp.int32) * cap + (pos % cap).astype(
            jnp.int32)
        return None, (v_top, i_top, loc_top)

    _, (vals_, ids_, locs_) = jax.lax.scan(
        per_block, None, qp.reshape(nqb, query_block, d)
    )
    kk = vals_.shape[-1]
    vals_ = vals_.reshape(nqb * query_block, kk)[:b]
    ids_ = ids_.reshape(nqb * query_block, kk)[:b]
    locs_ = locs_.reshape(nqb * query_block, kk)[:b]
    return vals_, ids_, locs_


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
    v, i, loc = _ivf_search_core(
        q, index.centroids, index.values, index.scales, index.row_ids,
        mask, k=k, nprobe=nprobe, query_block=min(query_block, q.shape[0]),
        has_mask=mask is not None, residual=index.residual,
    )
    cs = None
    if index.residual or index.sign_plane is not None:
        cs = q @ index.centroids.T
    return attach_overflow_and_refine(q, cs, index, v, i, loc, k, mask=mask)
