"""Device mesh construction and sharded search with ICI top-k merge."""

from super_rag_tpu.parallel.mesh import corpus_mesh, shard_corpus
from super_rag_tpu.parallel.sharded import sharded_dense_search

__all__ = ["corpus_mesh", "shard_corpus", "sharded_dense_search"]
