"""Size the 10M flat-scan redesign on the real chip.

The round-3 profile (scripts/tpu_profile_ivf.py) showed the per-query
Pallas IVF kernel is matvec-bound: grid=(B,) feeds the MXU one query row
at a time, so b512/np32 costs 752 ms while the data it touches would
stream in ~20 ms.  Before rewriting, measure what the hardware actually
gives us for the two candidate shapes:

  (a) flat blocked scan over the REAL cached 10M int8 in-cluster array
      ([8192*1408, 768]) — big [B, D] @ [D, block] matmuls, per-block
      approx_max_k, final merge.  If b512 lands near the compute bound
      this is the >=10k-QPS tier.
  (b) the same at b32 — tells us how far the latency tier needs IVF.
  (c) raw matmul rates: f32 / bf16 / int8->bf16 / native int8 (int32
      accum) at scan shapes, so the kernel rework targets a real number.
  (d) approx_max_k vs top_k over scan-width score rows.

One TPU claim; run with a quiet host.

Run: MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824 \
     python -u scripts/tpu_microbench_flat.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

CACHE = os.path.join(ROOT, ".bench10m_cache")
N, D = 8192 * 1221, 768
TAG = f"n{N}_d{D}_v131072_s48"
T0 = time.perf_counter()


def log(m):
    print(f"[micro +{time.perf_counter() - T0:6.0f}s] {m}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend {jax.default_backend()} devices {jax.devices()}")

    def timed(fn, sync, lo=2, hi=6):
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

    def sync_pair(o):
        np.asarray(o[0][:1])

    def sync_arr(o):
        np.asarray(o[:1])

    results = {}

    # ---- (c) raw matmul rates ------------------------------------------
    rng = np.random.default_rng(0)
    for rows in (32, 128, 512):
        qf = jnp.asarray(rng.standard_normal((rows, D), dtype=np.float32))
        wf = jnp.asarray(
            rng.standard_normal((D, 131072), dtype=np.float32))
        flops = rows * D * 131072 * 2

        mm_f32 = jax.jit(lambda a, b: a @ b)
        t = timed(lambda: mm_f32(qf, wf), sync_arr)
        results[f"mm_f32_{rows}x{D}x131072_ms"] = round(t * 1e3, 3)
        log(f"f32  [{rows},{D}]@[{D},131072]: {t*1e3:.2f} ms "
            f"({flops/t/1e12:.1f} TF/s)")

        qb, wb = qf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16)
        mm_bf16 = jax.jit(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        t = timed(lambda: mm_bf16(qb, wb), sync_arr)
        results[f"mm_bf16_{rows}_ms"] = round(t * 1e3, 3)
        log(f"bf16 [{rows},{D}]@[{D},131072]: {t*1e3:.2f} ms "
            f"({flops/t/1e12:.1f} TF/s)")

        wi = jnp.asarray(
            rng.integers(-127, 127, (D, 131072), dtype=np.int8))
        qi = jnp.asarray(rng.integers(-127, 127, (rows, D), dtype=np.int8))
        mm_conv = jax.jit(
            lambda a, b: jax.lax.dot_general(
                a, b.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        t = timed(lambda: mm_conv(qb, wi), sync_arr)
        results[f"mm_int8conv_{rows}_ms"] = round(t * 1e3, 3)
        log(f"i8->bf16 [{rows}]: {t*1e3:.2f} ms ({flops/t/1e12:.1f} TF/s)")

        try:
            mm_i8 = jax.jit(
                lambda a, b: jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32))
            t = timed(lambda: mm_i8(qi, wi), sync_arr)
            results[f"mm_int8native_{rows}_ms"] = round(t * 1e3, 3)
            log(f"i8 native [{rows}]: {t*1e3:.2f} ms "
                f"({flops/t/1e12:.1f} TF/s)")
        except Exception as e:  # noqa: BLE001
            log(f"i8 native [{rows}]: unsupported ({type(e).__name__})")
            results[f"mm_int8native_{rows}_ms"] = None

    # ---- (d) top-k over scan-width rows --------------------------------
    s = jnp.asarray(rng.standard_normal((512, 1 << 20), dtype=np.float32))
    for name, fn in (
        ("approx", jax.jit(lambda x: jax.lax.approx_max_k(x, 128))),
        ("exact", jax.jit(lambda x: jax.lax.top_k(x, 128))),
    ):
        t = timed(lambda: fn(s), sync_pair)
        results[f"topk_{name}_512x1M_ms"] = round(t * 1e3, 3)
        log(f"top128 {name} [512, 1M]: {t*1e3:.2f} ms")
    del s

    # ---- (a/b) flat blocked scan over the real 10M int8 array ----------
    log("loading cached 10M ivf arrays (host)")
    z = np.load(os.path.join(CACHE, f"ivf_{TAG}_l8192.npz"))
    values = z["values"]  # [nlist, cap, D] int8
    scales = z["scales"].astype(np.float32)
    nlist, cap, _ = values.shape
    flat_n = nlist * cap
    log(f"host arrays ready ({values.nbytes/2**30:.2f} GB)")

    dev_vals = jax.device_put(values.reshape(flat_n, D))
    dev_scales = jax.device_put(scales.reshape(flat_n))
    del values, scales, z
    log("device put done")

    qrng = np.random.default_rng([7, 1])
    centers = (np.random.default_rng([7, 0])
               .standard_normal((2048, D), dtype=np.float32) * 3.0)
    qa = qrng.integers(0, 2048, 512)
    qx = centers[qa] + qrng.standard_normal((512, D), dtype=np.float32)
    qx /= np.linalg.norm(qx, axis=1, keepdims=True)
    q512 = jnp.asarray(qx)
    q32 = q512[:32]

    @functools.partial(jax.jit, static_argnames=("block", "approx", "k"))
    def flat_scan(q, vals, scls, block, approx, k=128):
        nb = flat_n // block  # flat_n = 8192*1408 divides 2^k blocks

        def body(carry, inp):
            bvals, bscales, base = inp
            sc = jax.lax.dot_general(
                q.astype(jnp.bfloat16), bvals.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * bscales[None, :]
            if approx:
                v, i = jax.lax.approx_max_k(sc, k)
            else:
                v, i = jax.lax.top_k(sc, k)
            return carry, (v, i.astype(jnp.int32) + base)

        _, (vs, is_) = jax.lax.scan(
            body, None,
            (vals.reshape(nb, block, D),
             scls.reshape(nb, block),
             jnp.arange(nb, dtype=jnp.int32) * block))
        b = q.shape[0]
        vs = jnp.moveaxis(vs, 0, 1).reshape(b, nb * k)
        is_ = jnp.moveaxis(is_, 0, 1).reshape(b, nb * k)
        fv, pos = jax.lax.top_k(vs, k)
        return fv, jnp.take_along_axis(is_, pos, axis=-1)

    for b, q in ((512, q512), (32, q32)):
        for block in (1 << 18, 1 << 19, 1 << 20):
            t = timed(
                lambda: flat_scan(q, dev_vals, dev_scales, block=block,
                                  approx=True), sync_pair)
            key = f"flat_i8_b{b}_blk{block>>10}k_approx_ms"
            results[key] = round(t * 1e3, 3)
            log(f"flat int8 b{b} block {block>>10}k approx: {t*1e3:.2f} ms"
                f" (qps {b/t:.0f})")
        t = timed(
            lambda: flat_scan(q, dev_vals, dev_scales, block=1 << 19,
                              approx=False), sync_pair)
        results[f"flat_i8_b{b}_blk512k_exact_ms"] = round(t * 1e3, 3)
        log(f"flat int8 b{b} block 512k exact: {t*1e3:.2f} ms"
            f" (qps {b/t:.0f})")

    # ---- union-kernel latency tier on the real 10M index ---------------
    from super_rag_tpu.ops.ivf import IVFIndex
    from super_rag_tpu.ops.dense import DenseCorpus
    from super_rag_tpu.ops.pallas_ivf import pallas_ivf_topk

    z = np.load(os.path.join(CACHE, f"ivf_{TAG}_l8192.npz"))
    index = IVFIndex(
        centroids=jax.device_put(z["centroids"]),
        values=dev_vals.reshape(nlist, cap, D),
        scales=dev_scales.reshape(nlist, cap),
        row_ids=jax.device_put(z["row_ids"]),
        overflow=DenseCorpus(values=jax.device_put(z["of_values"]),
                             scales=jax.device_put(z["of_scales"])),
        overflow_rows=jax.device_put(z["of_rows"]),
        residual=bool(z["residual"]),
        sign_plane=(jax.device_put(z["sign_plane"])
                    if "sign_plane" in z.files else None),
        of_sign_plane=(jax.device_put(z["of_sign_plane"])
                       if "of_sign_plane" in z.files else None),
        of_assign=(jax.device_put(z["of_assign"])
                   if "of_assign" in z.files else None),
    )
    del z
    log(f"ivf index on device (signs={'yes' if index.sign_plane is not None else 'no'})")
    for b, q in ((32, q32), (64, q512[:64])):
        for np_ in (16, 32):
            t = timed(lambda: pallas_ivf_topk(
                q, index, k=128, nprobe=np_, approx_topk=True), sync_pair)
            results[f"union_ivf_b{b}_np{np_}_ms"] = round(t * 1e3, 3)
            log(f"union ivf b{b} np{np_}: {t*1e3:.2f} ms")

    out = os.path.join(CACHE, "microbench_flat.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
