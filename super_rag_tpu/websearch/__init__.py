from super_rag_tpu.websearch.service import WebSearchService

__all__ = ["WebSearchService"]
