"""Per-collection KG entity ontologies (graphiti custom-entity-types
parity — graphiti_core/prompts/extract_nodes.py entity_types)."""

from __future__ import annotations

import json

from super_rag_tpu.kg.extract import (
    DEFAULT_ONTOLOGY,
    EntityType,
    Ontology,
    extract,
    heuristic_extract,
    llm_extract,
)
from super_rag_tpu.schema.view_models import CollectionConfig

MEDICAL = Ontology((
    EntityType("Drug", "a pharmaceutical compound", r"(?:mab|nib|pril)$"),
    EntityType("Disease", "a medical condition", r"(?i)(syndrome|itis)\b"),
    EntityType("Gene", "a gene or protein"),
))


def test_from_config_variants():
    assert Ontology.from_config(None) is DEFAULT_ONTOLOGY
    assert Ontology.from_config([]) is DEFAULT_ONTOLOGY
    o = Ontology.from_config(["Drug", {"name": "Gene", "description": "g"}])
    assert [e.name for e in o.entity_types] == ["Drug", "Gene"]
    assert o.entity_types[1].description == "g"
    # malformed entries are dropped; all-malformed falls back to default
    assert Ontology.from_config([{"nope": 1}, ""]) is DEFAULT_ONTOLOGY


def test_canonical_maps_unknown_to_entity():
    assert MEDICAL.canonical("drug") == "Drug"
    assert MEDICAL.canonical("Organization") == "Entity"
    assert DEFAULT_ONTOLOGY.canonical("person") == "Person"


def test_prompt_types_rendered_into_llm_prompt():
    prompts_seen = []

    def completion(prompt: str) -> str:
        prompts_seen.append(prompt)
        return json.dumps({"triples": [{
            "source": "Imatinib", "source_type": "Drug",
            "relation": "treats", "target": "Leukemia",
            "target_type": "Disease", "fact": "Imatinib treats leukemia.",
        }], "missed": []})

    triples = llm_extract("Imatinib treats leukemia.", completion,
                          ontology=MEDICAL)
    assert any("Drug — a pharmaceutical compound" in p
               for p in prompts_seen)
    assert triples[0].source_type == "Drug"
    assert triples[0].target_type == "Disease"


def test_llm_types_validated_against_ontology():
    def completion(prompt: str) -> str:
        return json.dumps({"triples": [{
            "source": "X", "source_type": "Spaceship",
            "relation": "r", "target": "Y", "target_type": "gene",
        }], "missed": []})

    t = llm_extract("X r Y.", completion, ontology=MEDICAL)[0]
    assert t.source_type == "Entity"  # not in the ontology
    assert t.target_type == "Gene"    # case-normalized to canonical


def test_heuristic_uses_ontology_patterns():
    text = ("The drug Tofacitinib supports Remission Care. "
            "Trials show Pembrolizumab extends Survival Time.")
    triples = heuristic_extract(text, ontology=MEDICAL)
    typed = {(t.source, t.source_type) for t in triples}
    assert ("Tofacitinib", "Drug") in typed or \
        ("Pembrolizumab", "Drug") in typed


def test_extract_threads_ontology_to_fallback():
    triples = extract("Reports say Imatinib supports Remission Care.", completion=None,
                      ontology=MEDICAL)
    assert any(t.source_type == "Drug" for t in triples)


def test_collection_config_field_roundtrip():
    cfg = CollectionConfig(kg_entity_types=[
        {"name": "Drug", "description": "d", "pattern": "nib$"},
    ])
    dumped = cfg.model_dump()
    assert dumped["kg_entity_types"][0]["name"] == "Drug"
    onto = Ontology.from_config(dumped["kg_entity_types"])
    assert onto.entity_types[0].pattern == "nib$"
    # default config keeps the field empty -> default ontology
    assert Ontology.from_config(
        CollectionConfig().model_dump()["kg_entity_types"]
    ) is DEFAULT_ONTOLOGY
