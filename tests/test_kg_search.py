"""Graphiti search-surface parity: node search, episode retrieval, BFS
expansion, point-in-time (as_of) queries, reranker recipes, combined
search (reference graphiti_core/search/search.py:54-454,
search_config_recipes.py)."""

import time

import numpy as np
import pytest

from super_rag_tpu.kg.extract import Triple
from super_rag_tpu.kg.service import KnowledgeGraphService
from super_rag_tpu.store.db import Database


def triples_a():
    return [
        Triple("Alice", "founded", "Acme Robotics",
               "Alice founded Acme Robotics in 2019."),
        Triple("Acme Robotics", "builds", "warehouse robots",
               "Acme Robotics builds warehouse robots."),
        Triple("Bob", "leads", "hardware team",
               "Bob leads the hardware team at Acme Robotics."),
        Triple("Bob", "reports to", "Alice", "Bob reports to Alice."),
    ]


@pytest.fixture
def kg(tmp_path):
    db = Database(str(tmp_path / "kg.db"))
    svc = KnowledgeGraphService(db, embed_dim=64)
    svc.add_episode("g", "Acme episode about robots", source="doc1",
                    triples=triples_a())
    return svc


def test_node_search_finds_entity(kg):
    out = kg.search_nodes("g", "warehouse robots", top_k=5)
    assert out
    names = {o["name"] for o in out}
    assert "Acme Robotics" in names or "warehouse robots" in names
    assert all("facts" in o and "score" in o for o in out)


def test_node_search_aggregates_from_facts(kg):
    # 'founded' only appears in a fact, not a node name — the node search
    # must still surface its endpoints (rank aggregation branch)
    out = kg.search_nodes("g", "founded 2019", top_k=5)
    assert {"Alice", "Acme Robotics"} & {o["name"] for o in out}


def test_episode_search(kg):
    kg.add_episode("g", "A completely different episode about cooking pasta",
                   source="doc2", triples=[])
    out = kg.search_episodes("g", "cooking pasta", top_k=3)
    assert out
    assert "pasta" in out[0]["preview"]
    assert out[0]["source"] == "doc2"


def test_bfs_expand_depth(kg):
    one = kg.expand("g", ["Alice"], max_depth=1)
    names1 = {n["name"] for n in one["nodes"]}
    assert "Alice" in names1 and "Acme Robotics" in names1 and "Bob" in names1
    # depth 2 reaches the hardware team through Bob
    two = kg.expand("g", ["Alice"], max_depth=2)
    names2 = {n["name"] for n in two["nodes"]}
    assert "hardware team" in names2
    assert "hardware team" not in names1
    depths = {n["name"]: n["depth"] for n in two["nodes"]}
    assert depths["Alice"] == 0 and depths["hardware team"] == 2
    assert all(e["depth"] <= 2 for e in two["edges"])


def test_expand_unknown_origin_empty(kg):
    assert kg.expand("g", ["nobody"], max_depth=2) == {"nodes": [],
                                                       "edges": []}


def test_as_of_point_in_time(kg):
    t_before = time.time()
    time.sleep(0.01)
    # supersede the 'founded' fact
    kg.add_episode("g", "update", triples=[
        Triple("Alice", "founded", "Acme Robotics",
               "Alice founded Acme Robotics in 2019 (restated in 2024)."),
    ])
    live = kg.search("g", "alice founded acme robotics", top_k=5)
    live_facts = [h["fact"] for h in live]
    assert any("restated" in f for f in live_facts)
    assert not any(f == "Alice founded Acme Robotics in 2019."
                   for f in live_facts)
    # as-of BEFORE the update: the original fact, not the restatement
    past = kg.search("g", "alice founded acme robotics", top_k=5,
                     as_of=t_before)
    past_facts = [h["fact"] for h in past]
    assert "Alice founded Acme Robotics in 2019." in past_facts
    assert not any("restated" in f for f in past_facts)
    # as-of before anything existed: nothing
    assert kg.search("g", "alice", top_k=5, as_of=t_before - 1000) == []


def test_node_distance_reranker(kg):
    out = kg.search("g", "acme robots team hardware", top_k=5,
                    center_node="Alice", rerank="node_distance")
    assert out
    # scores are 1/(1+hops): edges touching Alice outrank 2-hop ones
    by_fact = {h["fact"]: h["score"] for h in out}
    if "Bob reports to Alice." in by_fact and \
            "Bob leads the hardware team at Acme Robotics." in by_fact:
        assert by_fact["Bob reports to Alice."] >= \
            by_fact["Bob leads the hardware team at Acme Robotics."]


def test_cross_encoder_reranker_used(tmp_path):
    calls = {}

    def ce(query, texts):
        calls["n"] = len(texts)
        return np.arange(len(texts), 0, -1, dtype=np.float32)

    db = Database(str(tmp_path / "kg2.db"))
    svc = KnowledgeGraphService(db, embed_dim=64, reranker=ce)
    svc.add_episode("g", "ep", triples=triples_a())
    out = svc.search("g", "acme robots", top_k=3, rerank="cross_encoder")
    assert out and calls["n"] >= len(out)


def test_bfs_origin_merges_unretrieved_edges(kg):
    # query that matches nothing lexically similar to 'reports to'
    out = kg.search("g", "warehouse robots", top_k=10,
                    bfs_origin_nodes=["Alice"])
    facts = {h["fact"] for h in out}
    assert "Bob reports to Alice." in facts  # pulled in by BFS, not recall


def test_combined_search_scopes(kg):
    out = kg.search_combined("g", "acme robots", limit=3)
    assert set(out) == {"edges", "nodes", "episodes", "communities"}
    assert out["edges"] and out["nodes"]
    only = kg.search_combined("g", "acme robots", scopes=["nodes"])
    assert set(only) == {"nodes"}


def test_community_search(kg):
    out = kg.search_communities("g", "robots", top_k=2)
    assert out and "summary" in out[0] and "score" in out[0]


def test_hydration_restores_all_scopes(tmp_path):
    db_path = str(tmp_path / "kg3.db")
    db = Database(db_path)
    svc = KnowledgeGraphService(db, embed_dim=64)
    svc.add_episode("g", "Acme episode text", source="d",
                    triples=triples_a())
    # fresh service over the same DB: engines rebuild from sqlite
    svc2 = KnowledgeGraphService(Database(db_path), embed_dim=64)
    assert svc2.search_nodes("g", "acme robotics")
    assert svc2.search_episodes("g", "acme episode")
    assert svc2.search("g", "warehouse robots")


def test_superseded_rows_survive_for_as_of(tmp_path):
    db_path = str(tmp_path / "kg4.db")
    svc = KnowledgeGraphService(Database(db_path), embed_dim=64)
    svc.add_episode("g", "v1", triples=[
        Triple("X", "is", "old", "X is old.")])
    t_mid = time.time()
    time.sleep(0.01)
    svc.add_episode("g", "v2", triples=[
        Triple("X", "is", "old", "X is new now.")])
    # restart: hydration must index the superseded fact too
    svc2 = KnowledgeGraphService(Database(db_path), embed_dim=64)
    past = svc2.search("g", "X old", as_of=t_mid)
    assert any(h["fact"] == "X is old." for h in past)
    live = svc2.search("g", "X old")
    assert not any(h["fact"] == "X is old." for h in live)
