"""Decompose the union-kernel 6.4 ms: kernel stream vs post-processing.

scripts/tpu_smoke_union.py measured b32 ~6.4 ms nearly invariant to the
tile count (512 vs 1024 tiles) — a fixed cost dominates.  Candidates:
  (a) the kernel itself (DMA issue latency per tile, out-copy latency);
  (b) the [U, B, C] -> [B, U*C] transpose + epilogue + approx_max_k
      failing to fuse (a 184 MB layout change materialized 2-3x);
  (c) dispatch/sync overhead of the relay.

Times _union_scores alone (sync on one element), the full pallas call,
and nbuf variants.  Quiet host required.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

T0 = time.perf_counter()


def log(m):
    print(f"[diag +{time.perf_counter() - T0:6.0f}s] {m}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from super_rag_tpu.ops.dense import DenseCorpus
    from super_rag_tpu.ops.ivf import IVFIndex
    from super_rag_tpu.ops import pallas_ivf as pv

    log(f"backend {jax.default_backend()}")

    def timed(fn, sync, lo=2, hi=8):
        def total(depth):
            t0 = time.perf_counter()
            o = None
            for _ in range(depth):
                o = fn()
            sync(o)
            return time.perf_counter() - t0

        total(1)
        tlo = min(total(lo) for _ in range(2))
        thi = min(total(hi) for _ in range(2))
        return (thi - tlo) / (hi - lo)

    nlist, cap, d = 1024, 1408, 768
    rng = np.random.default_rng(0)
    vals = jax.device_put(
        rng.integers(-127, 128, (nlist, cap, d), dtype=np.int8))
    q = jnp.asarray(rng.standard_normal((32, d), dtype=np.float32))
    qb = q.astype(jnp.bfloat16)
    union_all = jnp.asarray(np.arange(nlist, dtype=np.int32))
    union_half = jnp.asarray(np.arange(512, dtype=np.int32))
    log("arrays ready")

    # (1) kernel alone, nbuf sweep, U sweep
    for nbuf in (4, 8):
        for uname, u in (("512", union_half), ("1024", union_all)):
            f = jax.jit(functools.partial(
                pv._union_scores, interpret=False, nbuf=nbuf))
            t = timed(lambda: f(qb, u, vals),
                      lambda o: np.asarray(o[0, :1, :1]))
            log(f"kernel nbuf={nbuf} U={uname}: {t*1e3:.2f} ms")

    # (2) kernel + transpose + approx_max_k (the fused epilogue path)
    @jax.jit
    def kernel_plus_topk(qq, u, vv):
        raw = pv._union_scores(qq, u, vv, interpret=False)
        cv = jnp.moveaxis(raw, 1, 0).reshape(32, -1)
        return jax.lax.approx_max_k(cv, 128)

    for uname, u in (("512", union_half), ("1024", union_all)):
        t = timed(lambda: kernel_plus_topk(qb, u, vals),
                  lambda o: np.asarray(o[0][:1]))
        log(f"kernel+transpose+topk U={uname}: {t*1e3:.2f} ms")

    # (3) full pallas_ivf_topk on a synthetic index (no overflow)
    index = IVFIndex(
        centroids=jnp.asarray(
            rng.standard_normal((nlist, d), dtype=np.float32)),
        values=vals,
        scales=jnp.asarray(
            rng.random((nlist, cap), dtype=np.float32) * 0.01 + 0.005),
        row_ids=jnp.asarray(
            np.arange(nlist * cap, dtype=np.int32).reshape(nlist, cap)),
        overflow=None, overflow_rows=None, residual=True,
        sign_plane=jnp.asarray(
            rng.integers(0, 256, (nlist, cap, d // 8), dtype=np.uint8)),
    )
    for np_ in (16, 32):
        t = timed(lambda nn=np_: pv.pallas_ivf_topk(
            q, index, k=128, nprobe=nn, approx_topk=True),
            lambda o: np.asarray(o[0][:1]))
        log(f"full (no overflow) b32 np{np_}: {t*1e3:.2f} ms")

    log("done")


if __name__ == "__main__":
    main()
