from super_rag_tpu.chunk.chunking import Chunk, Rechunker, rechunk

__all__ = ["Chunk", "Rechunker", "rechunk"]
