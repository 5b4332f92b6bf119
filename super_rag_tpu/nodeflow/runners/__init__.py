"""Importing this package registers all built-in node runners."""

from super_rag_tpu.nodeflow.runners import (  # noqa: F401
    start,
    vector_search,
    fulltext_search,
    hybrid_search,
    graph_search,
    merge,
    rerank,
    llm,
)
