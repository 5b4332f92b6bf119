from super_rag_tpu.schema.view_models import (
    CollectionConfig,
    ModelSpec,
    SearchRequest,
    SearchResultItem,
    SearchResult,
    DocumentUpload,
    CollectionCreate,
)

__all__ = [
    "CollectionConfig",
    "ModelSpec",
    "SearchRequest",
    "SearchResultItem",
    "SearchResult",
    "DocumentUpload",
    "CollectionCreate",
]
