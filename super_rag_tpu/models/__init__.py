from super_rag_tpu.models.encoder import EncoderConfig, TextEncoder
from super_rag_tpu.models.cross_encoder import CrossEncoder
from super_rag_tpu.models.hash_embedder import HashEmbedder

__all__ = ["EncoderConfig", "TextEncoder", "CrossEncoder", "HashEmbedder"]
