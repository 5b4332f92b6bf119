"""Ingest throughput: docs/s through the full engine write path.

Measures CollectionEngine.ingest (tokenize -> encoder forward ->
normalize/quantize -> donated dynamic_update_slice writes + host BM25
analysis) with the flax TextEncoder on device.  The device-resident
embedding path (EncoderService.embed_device + DeviceIndex._prep_dense)
lets the host tokenize/analyze batch i+1 while batch i's forward and
write execute, so the comparison host_sync vs device_path isolates the
pipelining win.

Reference counterpart: the ingestion fan-out measured in SURVEY.md §6
(embedding via remote HTTP APIs, batches of 10 through a thread pool).

Run on TPU: python scripts/bench_ingest.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.engine.collection import CollectionEngine
    from super_rag_tpu.engine.index import IndexSpec
    from super_rag_tpu.models.encoder import EncoderConfig
    from super_rag_tpu.models.encoder_service import EncoderService

    on_tpu = jax.default_backend() != "cpu"
    n_docs = 20_000 if on_tpu else 512
    batch = 256 if on_tpu else 64
    dim = 768 if on_tpu else 64

    cfg = EncoderConfig(
        vocab_size=30522, hidden_dim=384 if on_tpu else 64,
        num_layers=6 if on_tpu else 2, num_heads=6 if on_tpu else 2,
        mlp_dim=1536 if on_tpu else 256, embed_dim=dim, max_len=128,
    )
    svc = EncoderService(cfg, batch_size=batch, max_len=128)

    rng = np.random.default_rng(0)
    words = [f"token{i}" for i in range(5000)]
    docs = [
        " ".join(rng.choice(words, size=rng.integers(20, 60)))
        for _ in range(n_docs)
    ]

    spec = IndexSpec(dim=dim, dtype=jnp.int8, vocab_size=1 << 17,
                     min_capacity=1 << 15)

    def run(device_path: bool) -> float:
        eng = CollectionEngine(spec, embedder=svc)
        if not device_path:
            # force the host-sync path by hiding embed_device
            eng.embedder = _HostOnly(svc)
        # warm up compile on one batch
        eng.ingest(docs[:batch])
        t0 = time.perf_counter()
        for i in range(batch, n_docs, batch):
            eng.ingest(docs[i : i + batch])
        # drain device queue
        np.asarray(eng.index.emb[:1])
        dt = time.perf_counter() - t0
        return (n_docs - batch) / dt

    class _HostOnly:
        def __init__(self, inner):
            self._inner = inner
            self.dim = inner.dim

        def embed(self, texts):
            return self._inner.embed(texts)

    host_dps = run(device_path=False)
    dev_dps = run(device_path=True)
    print(json.dumps({
        "metric": "ingest_docs_per_s",
        "encoder": f"{cfg.num_layers}L-{cfg.hidden_dim}h->{dim}d int8 index",
        "batch": batch,
        "host_sync_docs_per_s": round(host_dps, 1),
        "device_path_docs_per_s": round(dev_dps, 1),
        "speedup": round(dev_dps / host_dps, 2),
    }))


if __name__ == "__main__":
    main()
