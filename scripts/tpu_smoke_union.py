"""Mosaic smoke + timing for the tile-parallel (union) IVF kernel.

Fabricates an IVF-shaped index from random arrays (no build): the union
kernel's cost depends only on shapes, and this must run BEFORE the 2.5 h
10M rebuild to prove the kernel lowers and pipelines on real hardware.

Also times ivf_flat_topk (the large-batch tier) on the same arrays, with
f32 and int8-quantized queries.

Run: python -u scripts/tpu_smoke_union.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

T0 = time.perf_counter()


def log(m):
    print(f"[smoke +{time.perf_counter() - T0:6.0f}s] {m}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from super_rag_tpu.ops.dense import DenseCorpus
    from super_rag_tpu.ops.ivf import IVFIndex, ivf_flat_topk
    from super_rag_tpu.ops.pallas_ivf import pallas_ivf_topk

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

    def sync(o):
        np.asarray(o[0][:1])

    nlist, cap, d = 1024, 1408, 768
    m_of = 32768
    rng = np.random.default_rng(0)
    log("fabricating arrays")
    vals = rng.integers(-127, 128, (nlist, cap, d), dtype=np.int8)
    n_rows = nlist * cap
    index = IVFIndex(
        centroids=jnp.asarray(
            rng.standard_normal((nlist, d), dtype=np.float32)),
        values=jax.device_put(vals),
        scales=jnp.asarray(
            rng.random((nlist, cap), dtype=np.float32) * 0.01 + 0.005),
        row_ids=jnp.asarray(
            np.arange(n_rows, dtype=np.int32).reshape(nlist, cap)),
        overflow=DenseCorpus(
            values=jnp.asarray(
                rng.integers(-127, 128, (m_of, d), dtype=np.int8)),
            scales=jnp.asarray(
                rng.random(m_of, dtype=np.float32) * 0.01)),
        overflow_rows=jnp.asarray(
            np.arange(n_rows, n_rows + m_of, dtype=np.int32)),
        residual=True,
        sign_plane=jnp.asarray(
            rng.integers(0, 256, (nlist, cap, d // 8), dtype=np.uint8)),
        of_sign_plane=jnp.asarray(
            rng.integers(0, 256, (m_of, d // 8), dtype=np.uint8)),
        of_assign=jnp.asarray(
            rng.integers(0, nlist, m_of, dtype=np.int32)),
    )
    q = jnp.asarray(rng.standard_normal((512, d), dtype=np.float32))
    log(f"index on device ({vals.nbytes/2**30:.2f} GB in-cluster)")
    del vals

    # union path correctness-on-hardware probe: run once, check ids valid
    for b in (32, 64):
        for np_ in (16, 32):
            fn = lambda bb=b, nn=np_: pallas_ivf_topk(
                q[:bb], index, k=128, nprobe=nn, approx_topk=True)
            o = fn()
            ids = np.asarray(o[1])
            assert ids.max() < n_rows + m_of and (ids >= 0).all(), ids
            t = timed(fn, sync)
            log(f"union ivf b{b} np{np_}: {t*1e3:.2f} ms")

    # large-batch flat tier: bf16 vs native-int8 phase-1
    for i8 in (False, True):
        fn = lambda ii=i8: ivf_flat_topk(q, index, k=128, approx_topk=True,
                                         int8_queries=ii)
        o = fn()
        t = timed(fn, sync)
        log(f"flat tier b512 int8={i8}: {t*1e3:.2f} ms (qps {512/t:.0f})")

    log("done")


if __name__ == "__main__":
    main()
