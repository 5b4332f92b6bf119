"""KG construction depth (VERDICT r3 item 5): node dedupe, edge
duplicate/contradiction resolution, entity summaries, label-propagation
communities — graphiti construction semantics
(graphiti_core/prompts/dedupe_nodes.py, dedupe_edges.py,
utils/maintenance/) with offline + LLM tiers, plus a golden fixture."""

import json

import pytest

from super_rag_tpu.kg.construct import (
    is_acronym,
    label_propagation,
    resolve_edge,
    resolve_node,
    summarize_node,
    trigram_similarity,
)
from super_rag_tpu.kg.extract import Triple
from super_rag_tpu.kg.service import KnowledgeGraphService
from super_rag_tpu.store.db import Database


@pytest.fixture
def kg(tmp_path):
    db = Database(str(tmp_path / "kgc.db"))
    return KnowledgeGraphService(db, embed_dim=64)


def make_kg(tmp_path, completion):
    db = Database(str(tmp_path / "kgc_llm.db"))
    return KnowledgeGraphService(db, completion=completion, embed_dim=64)


# -- units ---------------------------------------------------------------------


def test_trigram_similarity_orders_variants():
    assert trigram_similarity("Acme Robotics", "acme robotics") == 1.0
    assert trigram_similarity("Acme Robotics", "Acme Robotic") > 0.8
    assert trigram_similarity("Acme Robotics", "Zeta Labs") < 0.2


def test_acronym_detection():
    assert is_acronym("GPU", "Graphics Processing Unit")
    assert is_acronym("G.P.U.", "graphics processing unit")
    assert not is_acronym("GPU", "General Motors")
    assert not is_acronym("GP", "Graphics Processing Unit")


def test_label_propagation_splits_weakly_joined():
    # two 4-cliques joined by one bridge edge: components would return
    # ONE group; label propagation must find two dense clusters
    adj: dict[str, set[str]] = {}

    def link(a, b):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    left = ["a1", "a2", "a3", "a4"]
    right = ["b1", "b2", "b3", "b4"]
    for grp in (left, right):
        for i, x in enumerate(grp):
            for y in grp[i + 1:]:
                link(x, y)
    link("a1", "b1")  # weak bridge
    clusters = label_propagation(adj)
    assert len(clusters) == 2
    assert {frozenset(c) for c in clusters} == {frozenset(left),
                                                frozenset(right)}


def test_resolve_node_offline_tiers():
    cands = [{"name": "Acme Robotics"}, {"name": "Zeta Labs"}]
    assert resolve_node("acme robotics", cands) == "Acme Robotics"
    assert resolve_node("Acme Robotic", cands) == "Acme Robotics"  # typo
    assert resolve_node("Graphics Processing Unit",
                        [{"name": "GPU"}]) == "GPU"
    assert resolve_node("Bolt Dynamics", cands) is None


def test_resolve_node_llm_tier():
    calls = {}

    def completion(prompt: str):
        calls["prompt"] = prompt
        return json.dumps({"duplicate_name": "Robert Smith"})

    got = resolve_node("Bob Smith", [{"name": "Robert Smith"},
                                     {"name": "Alice"}],
                       completion, context="Bob Smith runs the team.")
    assert got == "Robert Smith"
    assert "Bob Smith" in calls["prompt"]
    # garbage output falls back to the offline verdict (no match here)
    assert resolve_node("Bob Smith", [{"name": "Robert Smith"}],
                        lambda prompt: "not json") is None


def test_resolve_edge_offline():
    # identical fact = duplicate (idempotent re-index)
    r = resolve_edge("Acme employs Bob.", "employs",
                     [(0, "Acme employs Bob.")], [])
    assert r.duplicates == [0] and r.contradictions == []
    # same key, different fact = contradiction (temporal supersede)
    r = resolve_edge("Acme employs Bob as director.", "employs",
                     [(0, "Acme employs Bob as engineer.")], [])
    assert r.contradictions == [0] and r.duplicates == []
    # functional relation: different target contradicts
    r = resolve_edge("Carol leads the hardware team.", "leads",
                     [], [(0, "Bob leads the hardware team.")])
    assert r.contradictions == [0]
    # non-functional relation: different target coexists
    r = resolve_edge("Acme employs Carol.", "employs",
                     [], [(0, "Acme employs Bob.")])
    assert r.contradictions == []


def test_resolve_edge_llm_overrides():
    def completion(prompt: str):
        return json.dumps({"duplicates": [], "contradictions": [1]})

    r = resolve_edge("Bob moved to the platform team.", "works_on",
                     [(0, "Bob works on search.")],
                     [(1, "Bob works on ads.")], completion)
    assert r.contradictions == [1]
    # exact-text duplicate survives even if the LLM forgets it
    r = resolve_edge("Bob works on search.", "works_on",
                     [(0, "Bob works on search.")], [],
                     lambda prompt: json.dumps(
                         {"duplicates": [], "contradictions": []}))
    assert r.duplicates == [0]


def test_summarize_node_offline_truncates():
    s = summarize_node("Acme", ["Acme builds robots."] * 40)
    assert s and len(s) <= 250
    assert summarize_node("X", []) == ""


# -- end-to-end through the service ---------------------------------------------


def test_reindex_is_idempotent(kg):
    t = [Triple("Acme", "builds", "Robots", "Acme builds robots.")]
    r1 = kg.add_episode("c", "", triples=t)
    r2 = kg.add_episode("c", "", triples=t)
    assert r1["triples"] == 1 and r2["triples"] == 0
    assert kg.stats("c")["edges"] == 1


def test_functional_relation_invalidates_old_target(kg):
    kg.add_episode("c", "", triples=[
        Triple("Bob", "leads", "Hardware Team", "Bob leads Hardware Team.")
    ])
    kg.add_episode("c", "", triples=[
        Triple("Carol", "leads", "Hardware Team",
               "Carol leads Hardware Team."),
    ])
    # different SOURCE same relation is not functional-contradicted
    assert kg.stats("c")["edges"] == 2
    kg.add_episode("c", "", triples=[
        Triple("Bob", "leads", "Platform Team", "Bob leads Platform Team.")
    ])
    live = kg.db.query(
        "SELECT fact FROM kg_edge WHERE invalid_at IS NULL AND group_id='c'"
    )
    facts = {r["fact"] for r in live}
    assert "Bob leads Hardware Team." not in facts  # superseded
    assert "Bob leads Platform Team." in facts
    assert "Carol leads Hardware Team." in facts


def test_out_of_order_ingest_keeps_newest_fact_live(kg):
    """Event-time contradiction order (graphiti resolve_edge_contradictions):
    ingesting an OLDER fact after a newer one must not resurrect the stale
    fact — the old fact lands pre-invalidated at the newer event time."""
    t2024, t2015 = 1.7e9, 1.4e9
    kg.add_episode("c", "", triples=[
        Triple("Alice", "works_at", "Foo Corp",
               "Alice works at Foo Corp.", valid_at=t2024)
    ])
    # a 2015 document arrives later
    kg.add_episode("c", "", triples=[
        Triple("Alice", "works_at", "Bar Inc",
               "Alice worked at Bar Inc.", valid_at=t2015)
    ])
    rows = {r["fact"]: r for r in kg.db.query(
        "SELECT fact, valid_at, invalid_at FROM kg_edge WHERE group_id='c'"
    )}
    assert rows["Alice works at Foo Corp."]["invalid_at"] is None  # still live
    old = rows["Alice worked at Bar Inc."]
    assert old["invalid_at"] == t2024  # superseded at the newer event time
    # and in the forward direction the old fact IS superseded
    kg.add_episode("c", "", triples=[
        Triple("Bob", "works_at", "Foo Corp",
               "Bob worked at Foo Corp.", valid_at=t2015),
    ])
    kg.add_episode("c", "", triples=[
        Triple("Bob", "works_at", "Bar Inc",
               "Bob works at Bar Inc.", valid_at=t2024),
    ])
    rows = {r["fact"]: r for r in kg.db.query(
        "SELECT fact, invalid_at FROM kg_edge WHERE group_id='c'"
    )}
    assert rows["Bob worked at Foo Corp."]["invalid_at"] == t2024
    assert rows["Bob works at Bar Inc."]["invalid_at"] is None


def test_node_dedupe_merges_name_variants(kg):
    kg.add_episode("c", "", triples=[
        Triple("Acme Robotics", "builds", "Robots",
               "Acme Robotics builds robots.")
    ])
    kg.add_episode("c", "", triples=[
        Triple("acme robotics", "employs", "Bob",
               "acme robotics employs Bob."),
        Triple("Acme Robotic", "owns", "Factory",
               "Acme Robotic owns a factory."),  # typo variant
    ])
    names = [r["name"] for r in kg.db.query(
        "SELECT name FROM kg_node WHERE group_id='c'"
    )]
    acmeish = [n for n in names if "acme" in n.lower()]
    assert len(acmeish) == 1, names


def test_llm_node_dedupe_merges_aliases(tmp_path):
    def completion(prompt: str):
        if "duplicate_name" in prompt:
            if "Bob Smith" in prompt and "Robert Smith" in prompt:
                return json.dumps({"duplicate_name": "Robert Smith"})
            return json.dumps({"duplicate_name": ""})
        if "duplicates" in prompt:
            return json.dumps({"duplicates": [], "contradictions": []})
        return "summary text"

    kg2 = make_kg(tmp_path, completion)
    kg2.add_episode("c", "", triples=[
        Triple("Robert Smith", "leads", "Hardware",
               "Robert Smith leads hardware.")
    ])
    kg2.add_episode("c", "", triples=[
        Triple("Bob Smith", "manages", "Budget",
               "Bob Smith manages the budget.")
    ])
    names = [r["name"] for r in kg2.db.query(
        "SELECT name FROM kg_node WHERE group_id='c'"
    )]
    assert "Robert Smith" in names
    assert "Bob Smith" not in names
    # both facts hang off the merged node
    nid = kg2._node_id("c", "Robert Smith")
    n_edges = kg2.db.query_one(
        "SELECT COUNT(*) AS n FROM kg_edge WHERE source_id=?", (nid,)
    )["n"]
    assert n_edges == 2


def test_node_summaries_maintained(kg):
    kg.add_episode("c", "", triples=[
        Triple("Acme", "builds", "Robots", "Acme builds warehouse robots."),
        Triple("Acme", "employs", "Bob", "Acme employs Bob."),
    ])
    row = kg.db.query_one(
        "SELECT summary FROM kg_node WHERE group_id='c' AND name='Acme'"
    )
    assert "robots" in row["summary"].lower()
    assert "bob" in row["summary"].lower()


def test_communities_use_label_propagation_and_summaries(kg):
    # two dense clusters + one bridge
    for a, b in [("A1", "A2"), ("A2", "A3"), ("A1", "A3"),
                 ("B1", "B2"), ("B2", "B3"), ("B1", "B3"),
                 ("A1", "B1")]:
        kg.add_episode("c", "", triples=[
            Triple(a, "collaborates_with", b, f"{a} collaborates with {b}.")
        ])
    comms = kg.communities("c")
    assert len(comms) == 2
    assert all(c["summary"] for c in comms)
    # summaries come from member entity summaries (facts), not a stub
    assert any("collaborates" in c["summary"].lower() for c in comms)


def test_golden_fixture_graph(kg):
    """Golden eval: a small fixture corpus must land on a known-clean
    graph after dedupe + supersedence (VERDICT r3 item 5 'small golden
    eval')."""
    kg.add_episode("g", "", triples=[
        Triple("Acme Robotics", "headquartered_in", "Boston",
               "Acme Robotics is headquartered in Boston."),
        Triple("Alice Johnson", "founded", "Acme Robotics",
               "Alice Johnson founded Acme Robotics in 2019."),
    ])
    kg.add_episode("g", "", triples=[
        # name-variant of an existing node + an HQ move (functional)
        Triple("acme robotics", "headquartered_in", "Austin",
               "acme robotics moved its headquarters to Austin."),
        Triple("Alice Johnson", "founded", "Acme Robotics",
               "Alice Johnson founded Acme Robotics in 2019."),  # dup
    ])
    nodes = {r["name"].lower() for r in kg.db.query(
        "SELECT name FROM kg_node WHERE group_id='g'"
    )}
    assert nodes == {"acme robotics", "boston", "alice johnson", "austin"}
    live = {(r["relation"], r["fact"]) for r in kg.db.query(
        "SELECT relation, fact FROM kg_edge WHERE group_id='g'"
        " AND invalid_at IS NULL"
    )}
    assert live == {
        ("headquartered_in",
         "acme robotics moved its headquarters to Austin."),
        ("founded", "Alice Johnson founded Acme Robotics in 2019."),
    }
    # the superseded HQ fact is still reachable as-of the past
    all_edges = kg.db.query(
        "SELECT fact, invalid_at FROM kg_edge WHERE group_id='g'"
    )
    dead = [r for r in all_edges if r["invalid_at"] is not None]
    assert len(dead) == 1 and "Boston" in dead[0]["fact"]


# -- round-4 self-review fixes ----------------------------------------------


def test_duplicate_and_contradicted_means_update(tmp_path):
    """The restate-and-update case: LLM flags the old fact as duplicate
    AND contradicted — the old edge must be invalidated and the new fact
    inserted (not silently dropped)."""
    def completion(prompt: str):
        if "duplicate_name" in prompt:
            return json.dumps({"duplicate_name": ""})
        if '"duplicates"' in prompt or "duplicates" in prompt:
            return json.dumps({"duplicates": [0], "contradictions": [0]})
        return "s"

    kg2 = make_kg(tmp_path, completion)
    kg2.add_episode("c", "", triples=[
        Triple("Bob", "role", "CEO", "Bob is CEO of Acme since 2019.")
    ])
    # second add triggers the resolve prompt (candidates exist now)
    kg2.add_episode("c", "", triples=[
        Triple("Bob", "role", "CEO", "Bob is CEO of Acme since 2024.")
    ])
    live = [r["fact"] for r in kg2.db.query(
        "SELECT fact FROM kg_edge WHERE group_id='c' AND invalid_at IS NULL"
    )]
    assert live == ["Bob is CEO of Acme since 2024."]


def test_bulk_within_batch_contradiction(kg):
    """Two facts in ONE bulk batch with the same functional key must
    supersede within the batch exactly like sequential episodes."""
    r = kg.add_episode_bulk("c", [
        "Alice Cooper works_at Acme Labs now.",
        "Alice Cooper works_at Beta Corp now.",
    ])
    # heuristic extraction may vary: drive the invariant directly too
    kg.delete_group("c")
    from super_rag_tpu.kg.extract import Triple as T

    # use add_episode_bulk's internals via triples through two episodes
    # in one batch: monkeypatch extract by pre-seeding? simplest: call
    # the per-episode path twice then verify bulk matches it — here we
    # call bulk with texts whose heuristic extraction yields the pair
    eng_facts = [
        ("Alice", "works_at", "Acme", "Alice works_at Acme."),
        ("Alice", "works_at", "Beta", "Alice works_at Beta."),
    ]
    # emulate the batch by invoking the resolution loop through
    # add_episode (sequential gold)...
    for s, rel, t2, f in eng_facts:
        kg.add_episode("gold", "", triples=[T(s, rel, t2, f)])
    gold_live = {r2["fact"] for r2 in kg.db.query(
        "SELECT fact FROM kg_edge WHERE group_id='gold'"
        " AND invalid_at IS NULL")}
    assert gold_live == {"Alice works_at Beta."}


def test_bulk_batch_functional_supersede_directly(kg, monkeypatch):
    """add_episode_bulk with extraction stubbed: within-batch functional
    contradiction invalidates the earlier batch fact."""
    from super_rag_tpu.kg import service as svc
    from super_rag_tpu.kg.extract import Triple as T

    seq = [
        [T("Alice", "works_at", "Acme", "Alice works_at Acme.")],
        [T("Alice", "works_at", "Beta", "Alice works_at Beta.")],
    ]
    calls = iter(seq)
    monkeypatch.setattr(svc, "extract",
                        lambda text, completion, **kw: next(calls))
    r = kg.add_episode_bulk("b", ["ep1", "ep2"])
    live = {x["fact"] for x in kg.db.query(
        "SELECT fact FROM kg_edge WHERE group_id='b'"
        " AND invalid_at IS NULL")}
    assert live == {"Alice works_at Beta."}
    assert r["triples"] == 1  # only the surviving edge was inserted


def test_alias_keeps_both_surface_forms_resolving(tmp_path):
    """After an LLM merge promotes a longer display name, BOTH surface
    forms must resolve to the same node and re-ingest stays idempotent."""
    def completion(prompt: str):
        if "duplicate_name" in prompt and "Apple Inc." in prompt:
            return json.dumps({"duplicate_name": "Apple"})
        if "duplicate_name" in prompt:
            return json.dumps({"duplicate_name": ""})
        if "duplicates" in prompt:
            return json.dumps({"duplicates": [], "contradictions": []})
        return "s"

    kg2 = make_kg(tmp_path, completion)
    kg2.add_episode("c", "", triples=[
        Triple("Apple", "makes", "Phones", "Apple makes phones.")
    ])
    kg2.add_episode("c", "", triples=[
        Triple("Apple Inc.", "employs", "Tim", "Apple Inc. employs Tim.")
    ])
    names = [r["name"] for r in kg2.db.query(
        "SELECT name FROM kg_node WHERE group_id='c'")]
    assert "Apple Inc." in names and "Apple" not in names
    nid_long = kg2._node_id("c", "Apple Inc.")
    nid_short = kg2._node_id("c", "Apple")
    assert nid_long and nid_long == nid_short
    # the OLD surface form upserts to the same node (no duplicate)
    assert kg2._upsert_node("c", "Apple") == nid_long
    n_nodes = kg2.db.query_one(
        "SELECT COUNT(*) AS n FROM kg_node WHERE group_id='c'"
        " AND name LIKE 'Apple%'")["n"]
    assert n_nodes == 1


def test_ce_batches_terminates_on_tiny_pools():
    """n_negatives larger than the pair pool must not spin forever."""
    from super_rag_tpu.models.tokenization import HashTokenizer
    from super_rag_tpu.train.pairs import Pair
    from super_rag_tpu.train.rerank import RerankTrainConfig, ce_batches

    pairs = [Pair(query=f"q{i}", positive=f"p{i}") for i in range(4)]
    cfg = RerankTrainConfig(n_negatives=19)
    tok = HashTokenizer(vocab_size=1 << 12)
    rng = __import__("numpy").random.default_rng(0)
    batches = list(ce_batches(pairs, [[1], [0], [3], [2]], tok, rng, cfg,
                              batch_queries=2, max_len=32))
    assert batches
    assert batches[0]["ids"].shape[0] == 2 * 20  # full group shape kept


def test_heuristic_passive_voice_inverts():
    from super_rag_tpu.kg.extract import heuristic_extract

    ts = heuristic_extract("Acme Robotics was founded by Alice Johnson.")
    assert any(t.source == "Alice Johnson" and t.relation == "founded"
               and t.target == "Acme Robotics" for t in ts), ts


def test_heuristic_verb_between_pair():
    from super_rag_tpu.kg.extract import heuristic_extract

    # two pairs with DIFFERENT verbs in one sentence: each pair must get
    # the verb between its own spans, not the sentence's first verb
    ts = heuristic_extract(
        "Alice Johnson founded Acme Robotics and Bob Smith leads Acme Labs."
    )
    rels = {(t.source, t.relation, t.target) for t in ts}
    assert ("Alice Johnson", "founded", "Acme Robotics") in rels
    assert any(s == "Bob Smith" and r == "leads" for s, r, _t in rels), rels
