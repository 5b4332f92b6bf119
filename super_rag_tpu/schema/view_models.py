"""API contract models.

Counterpart of the reference's schema/view_models.py (~90 pydantic
models; the load-bearing ones are CollectionConfig with index-enable
flags + ModelSpecs :51-90 and the search params/request/result
:1036-1127).  Routes validate inbound payloads through these so invalid
configs fail with 422s instead of deep in the engine.
"""

from __future__ import annotations

from typing import Literal, Optional

from pydantic import BaseModel, Field, field_validator


class ModelSpec(BaseModel):
    """Which provider/model serves an api for a collection."""

    provider: str = ""
    model: str = ""
    dim: Optional[int] = None  # embeddings only; None = probe/default


class CollectionConfig(BaseModel):
    """Per-collection JSON config (stored in collection.config)."""

    metric: Literal["cosine", "ip", "l2"] = "cosine"
    index_dtype: Literal["float32", "bfloat16", "int8"] = "bfloat16"
    bm25_slots: int = Field(default=64, ge=8, le=512)
    vocab_size: int = Field(default=1 << 17, ge=1 << 10)
    enable_summary: bool = False
    enable_vision: bool = False
    enable_knowledge_graph: bool = False
    embedding: Optional[ModelSpec] = None
    completion: Optional[ModelSpec] = None
    rerank: Optional[ModelSpec] = None

    @field_validator("vocab_size")
    @classmethod
    def _pow2(cls, v: int) -> int:
        if v & (v - 1) != 0:
            raise ValueError("vocab_size must be a power of two")
        return v


class CollectionCreate(BaseModel):
    title: str = Field(min_length=1, max_length=256)
    description: str = ""
    config: CollectionConfig = Field(default_factory=CollectionConfig)


class DocumentUpload(BaseModel):
    name: str = Field(min_length=1, max_length=512)
    content: Optional[str] = None
    content_base64: Optional[str] = None
    metadata: dict = Field(default_factory=dict)
    chat_id: Optional[str] = None


class SearchRequest(BaseModel):
    """POST /collections/{id}/searches body (reference :1036-1127)."""

    query: str = Field(min_length=1)
    top_k: int = Field(default=5, ge=1, le=100)
    similarity_threshold: Optional[float] = Field(default=0.2, ge=-1.0, le=1.0)
    use_fulltext: bool = True
    use_graph: bool = False
    use_rerank: bool = True
    chat_id: Optional[str] = None


class SearchResultItem(BaseModel):
    rank: int
    score: float
    text: str
    recall_type: str
    metadata: dict = {}


class SearchResult(BaseModel):
    query: str
    collection_id: str
    items: list[SearchResultItem]
