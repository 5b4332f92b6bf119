from super_rag_tpu.tokenize.analyzer import Analyzer, fnv1a32

__all__ = ["Analyzer", "fnv1a32"]
