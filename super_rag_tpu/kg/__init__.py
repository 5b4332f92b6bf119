from super_rag_tpu.kg.service import KnowledgeGraphService

__all__ = ["KnowledgeGraphService"]
