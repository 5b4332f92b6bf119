"""Knowledge graph: extraction, episode lifecycle, hybrid fact search,
graph-indexed documents end-to-end."""

import jax.numpy as jnp
import pytest

from super_rag_tpu.config import Settings
from super_rag_tpu.kg.extract import Triple, extract, heuristic_extract, llm_extract
from super_rag_tpu.kg.service import KnowledgeGraphService
from super_rag_tpu.store.db import Database

TEXT = (
    "Alice Johnson founded Acme Robotics in 2019. "
    "Acme Robotics builds warehouse automation systems. "
    "Bob Smith leads the hardware team at Acme Robotics."
)


@pytest.fixture
def kg(tmp_path):
    db = Database(str(tmp_path / "kg.db"))
    return KnowledgeGraphService(db, embed_dim=64)


def test_heuristic_extraction():
    triples = heuristic_extract(TEXT)
    assert triples
    pairs = {(t.source, t.target) for t in triples}
    assert any("Acme Robotics" in s or "Acme Robotics" in t for s, t in pairs)
    rels = {t.relation for t in triples}
    assert rels & {"founded", "builds", "leads"}


def test_llm_extraction_parses_json():
    def fake_completion(prompt: str):
        return ('{"triples": [{"source": "Alice", "relation": "founded", '
                '"target": "Acme", "fact": "Alice founded Acme."}]}')

    triples = llm_extract(TEXT, fake_completion)
    assert triples == [Triple("Alice", "founded", "Acme",
                              "Alice founded Acme.")]
    # extract() prefers the llm, falls back on garbage output
    assert extract(TEXT, fake_completion)[0].source == "Alice"
    assert extract(TEXT, lambda prompt: "not json at all")  # heuristic


def test_add_episode_and_search(kg):
    r = kg.add_episode("col1", TEXT, source="doc1")
    assert r["triples"] > 0
    hits = kg.search("col1", "who founded acme robotics", top_k=3)
    assert hits
    assert any("founded" in h["fact"].lower() or "Acme" in h["fact"]
               for h in hits)
    stats = kg.stats("col1")
    assert stats["nodes"] >= 2 and stats["edges"] == r["triples"]


def test_group_isolation(kg):
    kg.add_episode("col1", TEXT)
    kg.add_episode("col2", "Zeta Corp acquired Yotta Labs last year.")
    hits1 = kg.search("col1", "zeta corp acquisition", top_k=3)
    assert all("Zeta" not in h["fact"] for h in hits1)


def test_supersedence(kg):
    kg.add_episode("c", "", triples=[
        Triple("Acme", "employs", "Bob", "Acme employs Bob as engineer.")
    ])
    kg.add_episode("c", "", triples=[
        Triple("Acme", "employs", "Bob", "Acme employs Bob as director.")
    ])
    hits = kg.search("c", "acme employs bob", top_k=5)
    facts = [h["fact"] for h in hits]
    assert "Acme employs Bob as director." in facts
    assert "Acme employs Bob as engineer." not in facts
    assert kg.stats("c")["edges"] == 1


def test_live_search_not_crowded_by_superseded(kg):
    """Heavy churn: superseded edges keep device rows for as_of queries,
    but live search must still fill top_k with valid facts — the pool
    is an allowlist of currently-valid rows (ADVICE r3 #4)."""
    for i in range(8):
        kg.add_episode("c", "", triples=[
            Triple("Acme", "employs", f"P{i}",
                   f"Acme employs P{i} as engineer.")
        ])
    # supersede every employment fact several times → many dead rows
    for gen in ("senior", "staff", "principal"):
        for i in range(8):
            kg.add_episode("c", "", triples=[
                Triple("Acme", "employs", f"P{i}",
                       f"Acme employs P{i} as {gen}.")
            ])
    hits = kg.search("c", "acme employs engineer principal", top_k=5)
    assert len(hits) == 5, f"pool crowded by superseded rows: {len(hits)}"
    assert all(h["invalid_at"] is None for h in hits)
    assert all("principal" in h["fact"] for h in hits)


def test_episode_delete(kg):
    r = kg.add_episode("c", TEXT, source="doc1")
    kg.delete_episode("c", r["episode_id"])
    assert kg.search("c", "acme robotics", top_k=3) == []


def test_subgraph_and_labels(kg):
    kg.add_episode("c", TEXT)
    g = kg.subgraph("c")
    assert g["nodes"] and g["edges"]
    centered = kg.subgraph("c", node_name="Acme Robotics")
    assert centered["edges"]
    assert kg.labels("c")[0]["label"] == "Entity"


def test_rehydration_from_db(tmp_path):
    db_path = str(tmp_path / "kg2.db")
    db = Database(db_path)
    kg1 = KnowledgeGraphService(db, embed_dim=64)
    kg1.add_episode("c", TEXT)
    # fresh service over the same db: device index rebuilt lazily
    kg2 = KnowledgeGraphService(db, embed_dim=64)
    hits = kg2.search("c", "warehouse automation", top_k=3)
    assert hits


def test_graph_indexed_document_end_to_end(tmp_path):
    """Collection with enable_knowledge_graph: upload -> graph index ->
    graph_search node returns facts."""
    import asyncio

    from super_rag_tpu.service.context import build_context
    from super_rag_tpu.service.collection_service import CollectionService
    from super_rag_tpu.service.document_service import DocumentService

    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    ctx = build_context(cfg)
    collections = CollectionService(ctx)
    documents = DocumentService(ctx, collections)
    coll = collections.create("u", "kb",
                              config={"enable_knowledge_graph": True})
    doc = documents.create("u", coll["id"], "acme.md",
                           ("# Acme\n\n" + TEXT).encode())
    statuses = {i["index_type"]: i["status"] for i in doc["indexes"]}
    assert statuses == {"vector": "ACTIVE", "graph": "ACTIVE"}

    result = asyncio.new_event_loop().run_until_complete(
        collections.execute_search("u", coll["id"],
                                   "who founded acme robotics",
                                   use_graph=True)
    )
    assert result["items"]
    # graph docs render facts as one context doc
    assert any(i["recall_type"] in ("graph_search", "hybrid", "reranked")
               for i in result["items"]) or result["items"]


def test_add_episode_bulk_dedups_nodes(kg):
    texts = [
        "Ada Lovelace worked with Charles Babbage. Ada Lovelace wrote Notes.",
        "Charles Babbage designed the Analytical Engine.",
        "Ada Lovelace annotated the Analytical Engine papers.",
    ]
    r = kg.add_episode_bulk("bulkgrp", texts, source="doc-1")
    assert len(r["episode_ids"]) == 3
    assert r["triples"] >= 2
    # node dedup: 'ada lovelace' appears once despite three mentions
    rows = kg.db.query(
        "SELECT name_norm, COUNT(*) AS c FROM kg_node WHERE group_id=?"
        " GROUP BY name_norm HAVING c > 1", ("bulkgrp",))
    assert rows == []
    hits = kg.search("bulkgrp", "analytical engine")
    assert hits


def test_communities_and_stats(kg):
    kg.add_episode_bulk("commgrp", [
        "Alice Smith knows Bob Jones. Bob Jones knows Carol White.",
        "Xenon Gas bonds with Fluorine Gas.",
    ])
    comms = kg.communities("commgrp")
    assert len(comms) >= 2
    assert comms[0]["size"] >= comms[-1]["size"]
    assert all(c["summary"] for c in comms)
    stats = kg.stats("commgrp")
    assert stats["communities"] == len(comms)
    assert stats["community_summaries"]
    sub = kg.subgraph("commgrp")
    assert any(n.get("community") for n in sub["nodes"])


def test_mmr_rerank_diversifies(kg):
    kg.add_episode_bulk("mmrgrp", [
        "Solar Panels convert Sunlight into electricity.",
        "Solar Panels transform Sunlight Energy into usable power.",
        "Wind Turbines convert Wind Power into electricity.",
    ])
    plain = kg.search("mmrgrp", "convert electricity", top_k=2)
    mmr = kg.search("mmrgrp", "convert electricity", top_k=2, rerank="mmr")
    assert plain and mmr
    facts = [h["fact"] for h in mmr]
    assert len(set(facts)) == len(facts)
