"""Central prompt-template library.

Counterpart of the reference's llm/prompts.py (all prompt templates:
RAG QA, summary map-reduce, vision captions, chat titles, agent query
prompt) and prompt_template_service.py:349 (build_agent_query_prompt).
Every subsystem that talks to a completion model sources its template
here so operators can audit/override prompts in one place; runners and
indexers accept per-call overrides that take precedence.
"""

from __future__ import annotations

from typing import Optional

# -- RAG answering (nodeflow/runners/llm.py) ---------------------------------

RAG_ANSWER = """Answer the question using ONLY the context below. If the
context is insufficient, say so.

# Context
{context}

# Question
{query}

# Answer
"""

# -- chat pipeline (service/chat_service.py) ---------------------------------

CHAT_ANSWER = """Answer using the context; cite [n] indices.

# History
{history}

# Context
{context}

# Question
{query}

# Answer
"""

CHAT_TITLE = (
    "Give a 3-6 word title for a conversation that starts with: "
    "{first_message}\nTitle:"
)

# -- agent runtime (agent/runtime.py) -----------------------------------------

AGENT_SYSTEM = """You are a retrieval assistant with tools.

Tools:
{tool_descriptions}

To call a tool reply with EXACTLY one JSON object and nothing else:
{{"tool": "<name>", "arguments": {{...}}}}

When you can answer, reply with the answer text directly (no JSON).
Cite facts from tool results. Conversation so far:
{history}

User: {query}
"""

# -- document summary index (index/summary.py) -------------------------------

SUMMARY_MAP = """Summarize the passage in 2-3 sentences, keeping key entities
and numbers.

Passage:
{text}

Summary:"""

SUMMARY_REDUCE = """Combine the partial summaries into one coherent document
summary of at most 200 words titled '{title}'.

Partial summaries:
{parts}

Document summary:"""

# -- vision index (index/vision.py) -------------------------------------------

VISION_CAPTION = (
    "Describe this image in 2-3 sentences for search indexing. Include any "
    "visible text, charts, and key objects."
)

# -- knowledge graph extraction (kg/extract.py) --------------------------------

KG_EXTRACTION = """Extract knowledge triples from the text as JSON:
{{"triples": [{{"source": "...", "relation": "...", "target": "...",
"fact": "one sentence"}}]}}
Only include facts stated in the text.

Text:
{text}

JSON:"""


def build_agent_query_prompt(
    query: str,
    history: Optional[list[dict]] = None,
    collection_titles: Optional[list[str]] = None,
) -> str:
    """Render a retrieval-grounded user turn (reference
    prompt_template_service.py:349 build_agent_query_prompt).
    ``history`` rows are chat-message dicts with ``role`` + text
    ``parts`` (store/db.py chat_message schema)."""
    lines = []
    for m in (history or [])[-6:]:
        for p in m.get("parts", []):
            if p.get("type") == "text" and p.get("text"):
                lines.append(f"{m.get('role', 'user')}: {p['text']}")
    scope = ", ".join(collection_titles or []) or "(none)"
    hist = "\n".join(lines) if lines else "(no prior messages)"
    return (
        f"{hist}\n\nUser question: {query}\n\n"
        f"Relevant collections: {scope}\n"
        "Use the search tool before answering questions about document "
        "content."
    )


def build_rag_context(docs: list[tuple[int, str]]) -> str:
    """Number context items as ``[n] text`` for citation-style answers."""
    return "\n\n".join(f"[{i}] {text}" for i, text in docs)
