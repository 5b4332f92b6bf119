"""Benchmark: retrieval QPS/chip on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 10,000 hybrid queries/sec/chip on v5e,
so vs_baseline = measured_qps / 10_000.

Timing notes for this environment: the TPU is reached through a relay
whose block_until_ready returns early, so synchronization must force a
host transfer; per-call RTT (~30 ms) is amortized by queueing many
dispatches and transferring once, and the reported number is the
marginal per-call time (slope between two queue depths).
"""

from __future__ import annotations

import json
import time

import numpy as np


def timed_qps(run, sync, batch: int, k_lo: int = 8, k_hi: int = 32) -> tuple[float, float]:
    """Marginal per-call latency via two queue depths; returns (qps, ms)."""

    def total(depth: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(depth):
            out = run()
        sync(out)
        return time.perf_counter() - t0

    total(2)  # warm the dispatch path
    t_lo = min(total(k_lo) for _ in range(2))
    t_hi = min(total(k_hi) for _ in range(2))
    per_call = (t_hi - t_lo) / (k_hi - k_lo)
    return batch / per_call, per_call * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.ops.dense import build_corpus, dense_search

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)

    n = 1_000_000 if on_tpu else 20_000
    d = 768
    batch = 128
    k = 10
    block = 262_144 if on_tpu else 8_192

    rng = np.random.default_rng(0)
    corpus = build_corpus(
        jnp.asarray(rng.standard_normal((n, d)).astype(np.float32)),
        dtype=jnp.bfloat16,
    )
    queries = jnp.asarray(rng.standard_normal((batch, d)).astype(np.float32))

    state = {}

    def run():
        state["out"] = dense_search(queries, corpus, k=k, block_size=block)
        return state["out"]

    def sync(out):
        np.asarray(out[0])

    sync(run())  # compile
    qps, ms = timed_qps(run, sync, batch)

    print(
        json.dumps(
            {
                "metric": f"dense top-{k} QPS/chip ({n}x{d} bf16, batch {batch}, {backend})",
                "value": round(qps, 1),
                "unit": "queries/sec",
                "vs_baseline": round(qps / 10_000.0, 4),
                "extra": {"batch_latency_ms": round(ms, 3)},
            }
        )
    )


if __name__ == "__main__":
    main()
