"""super_rag_tpu — a TPU-native RAG framework.

A from-scratch re-design of the capabilities of promoteAI/super-rag
(reference layer map in /root/repo/SURVEY.md) where the retrieval engine —
dense ANN search, BM25 full-text, hybrid fusion, and cross-encoder rerank —
runs as XLA/Pallas programs on TPU instead of being delegated to an external
C++ vector database (reference: super_rag/vectorstore/seekdb_connector.py).

Package layout:
  ops/        fused search kernels (dense top-k, BM25, RRF, quantization, IVF)
  parallel/   mesh construction + sharded search with ICI top-k merge
  models/     JAX dual encoder + cross-encoder (+ hash embedder for tests)
  train/      contrastive fine-tuning of the encoder (dp x tp sharded)
  engine/     device-resident mutable index + collection-level query engine
  tokenize/   text analysis for BM25 + model tokenizers
  chunk/      structure-aware rechunker (semantics of reference chunk/chunking.py)
  fileparser/ document parsing to Parts
  store/      sqlite3 metadata store + object store
  tasks/      ingestion reconciler + task scheduler (in-proc / process pool)
  nodeflow/   query-time DAG engine
  service/    business logic
  api/        asyncio HTTP server + REST routes (reference super_rag/api)
  mcp/        MCP (JSON-RPC) tool server
"""

__version__ = "0.1.0"
