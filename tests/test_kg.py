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


def test_llm_extraction_types_and_event_time():
    def fake(prompt: str):
        return ('{"triples": [{"source": "Alice", "source_type": "Person", '
                '"relation": "founded", "target": "Acme", '
                '"target_type": "Organization", '
                '"fact": "Alice founded Acme in 2019.", '
                '"valid_at": "2019-03-01"}, '
                '{"source": "X", "source_type": "Banana", '
                '"relation": "r", "target": "Y", '
                '"fact": "X r Y.", "valid_at": null}]}')

    t = llm_extract(TEXT, fake, reflexion=False)
    assert t[0].source_type == "Person"
    assert t[0].target_type == "Organization"
    import calendar

    assert t[0].valid_at == calendar.timegm((2019, 3, 1, 0, 0, 0))
    # invented type collapses to the untyped default; missing date -> None
    assert t[1].source_type == "Entity" and t[1].valid_at is None


def test_llm_extraction_reflexion_recovers_missed_entities():
    calls = []

    def fake(prompt: str):
        calls.append(prompt)
        if "MISSING" in prompt:
            return '{"missed": ["Bob Smith"]}'
        if "INVOLVING" in prompt:
            return ('{"triples": [{"source": "Bob Smith", '
                    '"source_type": "Person", "relation": "leads", '
                    '"target": "hardware team", '
                    '"fact": "Bob Smith leads the hardware team."}]}')
        return ('{"triples": [{"source": "Alice", "relation": "founded", '
                '"target": "Acme", "fact": "Alice founded Acme."}]}')

    t = llm_extract(TEXT, fake)
    assert len(calls) == 3  # extract + reflexion + focused re-extract
    assert {x.source for x in t} == {"Alice", "Bob Smith"}
    # focused triples dedupe against the first pass
    t2 = llm_extract(TEXT, lambda prompt: (
        '{"missed": []}' if "MISSING" in prompt else
        '{"triples": [{"source": "A", "relation": "r", "target": "B", '
        '"fact": "A r B."}]}'
    ))
    assert len(t2) == 1  # nothing missed -> no third call, no dupes


def test_heuristic_types_and_event_time():
    t = heuristic_extract(
        "Dr Alice Johnson founded Acme Robotics Inc in 2019."
    )
    assert t
    assert t[0].source_type == "Person"
    assert t[0].target_type == "Organization"
    assert t[0].valid_at is not None
    t2 = heuristic_extract("Foo Widget uses Bar Gadget.")
    assert t2 and t2[0].source_type == "Entity"
    assert t2[0].valid_at is None


def test_entity_types_land_on_nodes_and_upgrade(kg):
    kg.add_episode("colT", "x", triples=[
        Triple("Acme", "builds", "Robots", "Acme builds Robots."),
    ])
    rows = {r["name"]: r for r in kg.db.query(
        "SELECT name, label FROM kg_node WHERE group_id='colT'")}
    assert rows["Acme"]["label"] == "Entity"
    # a later TYPED extraction upgrades the untyped node, never downgrades
    kg.add_episode("colT", "y", triples=[
        Triple("Acme", "acquired", "Zeta", "Acme acquired Zeta.",
               source_type="Organization", target_type="Organization"),
    ])
    kg.add_episode("colT", "z", triples=[
        Triple("Acme", "sells", "Robots", "Acme sells Robots.",
               source_type="Entity"),
    ])
    rows = {r["name"]: r for r in kg.db.query(
        "SELECT name, label FROM kg_node WHERE group_id='colT'")}
    assert rows["Acme"]["label"] == "Organization"
    assert rows["Zeta"]["label"] == "Organization"


def test_event_time_valid_at_respected_by_as_of(kg):
    import calendar

    t2019 = float(calendar.timegm((2019, 1, 1, 0, 0, 0)))
    kg.add_episode("colE", "x", triples=[
        Triple("Alice", "founded", "Acme", "Alice founded Acme in 2019.",
               valid_at=t2019),
    ])
    edge = kg.db.query_one(
        "SELECT valid_at, created FROM kg_edge WHERE group_id='colE'")
    assert edge["valid_at"] == t2019
    assert edge["created"] > t2019  # transaction time stays now
    # point-in-time: known by 2020, unknown in 2018
    hits_2020 = kg.search("colE", "who founded acme", top_k=3,
                          as_of=float(calendar.timegm((2020, 1, 1, 0, 0, 0))))
    hits_2018 = kg.search("colE", "who founded acme", top_k=3,
                          as_of=float(calendar.timegm((2018, 1, 1, 0, 0, 0))))
    assert hits_2020 and not hits_2018
