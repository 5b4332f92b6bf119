"""Shared pydantic types flowing between nodes.

DocumentWithScore mirrors the reference's result model
(super_rag/models/models.py:263) — the unit passed between
vector_search/fulltext_search/merge/rerank/llm nodes.
"""

from __future__ import annotations


from pydantic import BaseModel


class DocumentWithScore(BaseModel):
    text: str
    score: float = 0.0
    metadata: dict = {}
    recall_type: str = ""


class DocsOutput(BaseModel):
    docs: list[DocumentWithScore] = []


class StartOutput(BaseModel):
    query: str = ""


class AnswerOutput(BaseModel):
    text: str = ""
    docs: list[DocumentWithScore] = []
    references: list[dict] = []
