"""API contract models.

Counterpart of the reference's schema/view_models.py (~90 pydantic
models: CollectionConfig with index-enable flags + ModelSpecs :51-90,
workflow definition graph models :329-450, search params/request/result
:1036-1127, plus the document/chat/agent views).  Routes parse inbound
payloads through these so invalid configs fail with 422s instead of deep
in the engine, and shape outbound responses through the view models so
the REST, MCP, and CLI surfaces stay in sync by construction.
"""

from __future__ import annotations

from typing import Any, Literal, Optional

from pydantic import BaseModel, Field, field_validator

# -- model / collection configuration -----------------------------------------


class ModelSpec(BaseModel):
    """Which provider/model serves an api for a collection."""

    provider: str = ""
    model: str = ""
    dim: Optional[int] = None  # embeddings only; None = probe/default


class KGEntityType(BaseModel):
    """One custom KG entity type (graphiti custom-entity-types parity:
    graphiti_core/prompts/extract_nodes.py renders per-deployment
    pydantic entity models into its extraction prompts)."""

    name: str = Field(min_length=1, max_length=64)
    description: str = Field(default="", max_length=300)
    # optional regex cue for the offline heuristic extractor
    pattern: Optional[str] = Field(default=None, max_length=300)


class CollectionConfig(BaseModel):
    """Per-collection JSON config (stored in collection.config)."""

    metric: Literal["cosine", "ip", "l2"] = "cosine"
    index_dtype: Literal["float32", "bfloat16", "int8"] = "bfloat16"
    bm25_slots: int = Field(default=64, ge=8, le=512)
    vocab_size: int = Field(default=1 << 17, ge=1 << 10)
    enable_summary: bool = False
    enable_vision: bool = False
    enable_knowledge_graph: bool = False
    # custom entity ontology for the graph index; empty = default set
    kg_entity_types: list[KGEntityType] = Field(default_factory=list)
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


class CollectionUpdate(BaseModel):
    title: Optional[str] = Field(default=None, min_length=1, max_length=256)
    description: Optional[str] = None
    config: Optional[CollectionConfig] = None


class CollectionView(BaseModel):
    id: str
    title: str
    description: str = ""
    user: str = ""
    status: str = "ACTIVE"
    config: dict = Field(default_factory=dict)
    created: Optional[float] = None
    updated: Optional[float] = None

    model_config = {"extra": "allow"}


# -- documents -----------------------------------------------------------------


class DocumentUpload(BaseModel):
    name: str = Field(min_length=1, max_length=512)
    content: Optional[str] = None
    content_base64: Optional[str] = None
    metadata: dict = Field(default_factory=dict)
    chat_id: Optional[str] = None


class DocumentIndexView(BaseModel):
    index_type: str
    status: str
    version: int = 1
    observed_version: int = 0
    error_message: str = ""


class DocumentView(BaseModel):
    id: str
    collection_id: str
    name: str
    status: str
    size: int = 0
    content_hash: str = ""
    indexes: list[DocumentIndexView] = Field(default_factory=list)

    model_config = {"extra": "allow"}


class ChunkView(BaseModel):
    row: int
    text: str
    metadata: dict = Field(default_factory=dict)


# -- search ---------------------------------------------------------------------


class SearchRequest(BaseModel):
    """POST /collections/{id}/searches body (reference :1036-1127)."""

    query: str = Field(min_length=1)
    top_k: int = Field(default=5, ge=1, le=100)
    similarity_threshold: Optional[float] = Field(default=0.2, ge=-1.0, le=1.0)
    use_fulltext: bool = True
    use_graph: bool = False
    use_rerank: bool = True
    chat_id: Optional[str] = None


class MultiSearchRequest(BaseModel):
    query: str = Field(min_length=1)
    collection_ids: list[str] = Field(min_length=1)
    top_k: int = Field(default=5, ge=1, le=100)
    use_rerank: bool = True
    chat_id: Optional[str] = None


class ImageSearchRequest(BaseModel):
    image_base64: str = Field(min_length=4)
    top_k: int = Field(default=5, ge=1, le=100)


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


# -- workflows (reference :329-450) ----------------------------------------------


class WorkflowNode(BaseModel):
    id: str = Field(min_length=1)
    type: str = Field(min_length=1)
    data: dict = Field(default_factory=dict)


class WorkflowEdge(BaseModel):
    source: str
    target: str
    sourceHandle: Optional[str] = None
    targetHandle: Optional[str] = None


class WorkflowGraph(BaseModel):
    nodes: list[WorkflowNode]
    edges: list[WorkflowEdge] = Field(default_factory=list)


class WorkflowDefinition(BaseModel):
    name: str = ""
    graph: WorkflowGraph
    input_schema: dict = Field(default_factory=dict)


class WorkflowCreate(BaseModel):
    title: str = Field(min_length=1, max_length=256)
    definition: WorkflowDefinition


class WorkflowRunRequest(BaseModel):
    inputs: dict = Field(default_factory=dict)


class NodeRunView(BaseModel):
    node_id: str
    node_type: str = ""
    status: str
    duration_ms: Optional[float] = None
    error: str = ""


class WorkflowRunView(BaseModel):
    id: str
    workflow_id: str = ""
    status: str
    outputs: dict = Field(default_factory=dict)
    node_runs: list[NodeRunView] = Field(default_factory=list)

    model_config = {"extra": "allow"}


# -- chats / agents ---------------------------------------------------------------


class ChatCreate(BaseModel):
    title: str = Field(default="", max_length=256)
    collection_ids: list[str] = Field(default_factory=list)


class ChatMessageSend(BaseModel):
    message: str = Field(min_length=1)


class FeedbackRequest(BaseModel):
    feedback: Optional[Literal["good", "bad"]] = None


class AgentCreate(BaseModel):
    title: str = Field(min_length=1, max_length=256)
    description: str = ""
    config: dict = Field(default_factory=dict)


class AgentUpdate(BaseModel):
    title: Optional[str] = Field(default=None, min_length=1, max_length=256)
    description: Optional[str] = None
    config: Optional[dict] = None


# -- llm providers -----------------------------------------------------------------


class LLMProviderCreate(BaseModel):
    name: str = Field(min_length=1, max_length=128)
    label: str = ""
    base_url: str = ""
    api_type: str = "openai"


class LLMProviderModelCreate(BaseModel):
    api: Literal["completion", "embedding", "rerank"] = "completion"
    model: str = Field(min_length=1, max_length=256)
    context_window: int = Field(default=0, ge=0)
    max_tokens: int = Field(default=0, ge=0)
    tags: list[str] = Field(default_factory=list)


class ProviderKeySet(BaseModel):
    api_key: str = Field(min_length=1)


# -- auth ---------------------------------------------------------------------------


class RegisterRequest(BaseModel):
    username: str = Field(min_length=1, max_length=64)
    password: str = Field(min_length=8, max_length=256)
    email: str = ""


class LoginRequest(BaseModel):
    username: str
    password: str


class ChangePasswordRequest(BaseModel):
    """reference view_models.ChangePassword (api/auth.py:443)."""

    username: str = ""
    old_password: str
    new_password: str = Field(min_length=8, max_length=256)


class ApiKeyCreate(BaseModel):
    description: str = ""


# -- web search -----------------------------------------------------------------------


class WebSearchRequest(BaseModel):
    # query may be empty when ``source`` drives llms.txt discovery
    # (reference WebSearchRequest: query or source required)
    query: str = Field(default="")
    max_results: int = Field(default=5, ge=1, le=50)
    source: Optional[str] = None
    providers: Optional[list] = None


class WebReadRequest(BaseModel):
    url: str = Field(min_length=1)


# -- knowledge graph -------------------------------------------------------------------


class GraphNodeView(BaseModel):
    id: str
    name: str
    label: str = "Entity"
    community: Optional[str] = None


class GraphEdgeView(BaseModel):
    id: str
    source: str
    target: str
    relation: str
    fact: str = ""


class SubgraphView(BaseModel):
    nodes: list[GraphNodeView]
    edges: list[GraphEdgeView]


class CommunityView(BaseModel):
    id: str
    size: int
    summary: str
    members: list[str] = Field(default_factory=list)


class GraphStatsView(BaseModel):
    nodes: int
    edges: int
    communities: int = 0
    community_summaries: list[dict] = Field(default_factory=list)


def parse_body(model: type[BaseModel], data: Any):
    """Validate a request body against a contract model; raises the
    router's 422 with the first error's location+message (shared by the
    REST routes, MCP tools, and the CLI)."""
    from pydantic import ValidationError

    from super_rag_tpu.api.http import HttpError

    try:
        return model(**(data or {}))
    except ValidationError as e:
        first = e.errors()[0]
        loc = ".".join(str(x) for x in first["loc"])
        raise HttpError(422, f"{loc}: {first['msg']}") from e
