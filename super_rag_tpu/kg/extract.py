"""Entity/relation extraction for the knowledge graph.

The reference's graphiti drives extraction through LLM prompts
(graphiti/prompts/, SURVEY.md 2.8).  Ours keeps that as the primary
extractor when a completion client is configured, with a deterministic
heuristic fallback (capitalized-span entities, verb-linked pairs within a
sentence) so KG indexing works fully offline — the same degradation
philosophy as the rest of the stack.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Callable, Optional

_SENT_SPLIT = re.compile(r"(?<=[.!?。！？])\s+")
# Capitalized span: 1-4 words, each starting uppercase (skips sentence
# starts handled below); also CJK runs of 2-6 chars.
_ENTITY = re.compile(
    r"\b([A-Z][A-Za-z0-9_-]+(?:\s+[A-Z][A-Za-z0-9_-]+){0,3})\b"
)
_VERB_HINT = re.compile(
    r"\b(is|are|was|were|has|have|uses|runs|builds|created|founded|owns|"
    r"supports|provides|implements|replaces|extends|contains|employs|"
    r"acquired|launched|develops|leads|wrote|invented)\b",
    re.IGNORECASE,
)

from super_rag_tpu.llm.prompts import KG_EXTRACTION as EXTRACTION_PROMPT


@dataclass
class Triple:
    source: str
    relation: str
    target: str
    fact: str


_PASSIVE_RE = re.compile(r"\b(?:was|were|is|are|has been|have been)\s+"
                         r"(\w+(?:ed|en|n))\s+by\b", re.IGNORECASE)


def heuristic_extract(text: str, max_triples: int = 50) -> list[Triple]:
    """Offline extraction: entity pairs linked by the verb BETWEEN them.

    Two refinements over a bare adjacent-pair chain (r4): the relation
    for a pair is the verb hint that lies between the two entity spans
    (not the sentence's first verb), and the passive form
    'B was founded by A' inverts to (A, founded, B)."""
    triples: list[Triple] = []
    for sent in _SENT_SPLIT.split(text):
        if len(sent) < 8:
            continue
        # ignore a capitalized sentence-start word unless multi-word
        ents = []
        for m in _ENTITY.finditer(sent):
            span = m.group(1)
            if m.start() == 0 and " " not in span:
                continue
            if span.lower() in ("the", "a", "an", "this", "that", "it"):
                continue
            ents.append((span, m.start(), m.end()))
        seen: set[str] = set()
        uniq = []
        for e in ents:
            if e[0] not in seen:
                seen.add(e[0])
                uniq.append(e)
        if len(uniq) < 2:
            continue
        verbs = [(v.start(), v.end(), v.group(1).lower())
                 for v in _VERB_HINT.finditer(sent)]
        for (a, _as, a_end), (b_, b_start, _be) in zip(uniq, uniq[1:]):
            between = sent[a_end:b_start]
            relation = next(
                (name for s, e, name in verbs if a_end <= s and e <= b_start),
                verbs[0][2] if verbs else "related_to",
            )
            src, dst = a, b_
            pm = _PASSIVE_RE.search(between)
            if pm:
                # 'B was founded by A' → (A, founded, B)
                src, dst = b_, a
                relation = pm.group(1).lower()
            triples.append(
                Triple(source=src, relation=relation, target=dst,
                       fact=sent.strip()[:500])
            )
            if len(triples) >= max_triples:
                return triples
    return triples


def llm_extract(text: str, completion: Callable,
                max_triples: int = 50) -> list[Triple]:
    raw = completion(prompt=EXTRACTION_PROMPT.format(text=text[:6000]))
    raw = str(raw)
    m = re.search(r"\{.*\}", raw, re.S)
    if not m:
        return []
    try:
        data = json.loads(m.group(0))
    except json.JSONDecodeError:
        return []
    out = []
    for t in data.get("triples", [])[:max_triples]:
        if not all(t.get(k) for k in ("source", "target")):
            continue
        out.append(
            Triple(
                source=str(t["source"])[:200],
                relation=str(t.get("relation", "related_to"))[:100],
                target=str(t["target"])[:200],
                fact=str(t.get("fact", ""))[:500]
                or f"{t['source']} {t.get('relation', '')} {t['target']}",
            )
        )
    return out


def extract(text: str, completion: Optional[Callable] = None,
            max_triples: int = 50) -> list[Triple]:
    if completion is not None:
        try:
            triples = llm_extract(text, completion, max_triples)
            if triples:
                return triples
        except Exception:  # noqa: BLE001 — fall back to the heuristic
            pass
    return heuristic_extract(text, max_triples)
