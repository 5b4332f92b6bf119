"""End-to-end retrieval quality: natural questions must bring back their
gold chunk through the full engine (ingest -> chunk rows -> hybrid
search), scored with evals.py (VERDICT r1 weak #6: 'does the right chunk
come back for a real question').  Runs on the offline stack (hash
embedder + BM25), so the floor asserts what ships in any environment;
trained-encoder quality is measured by scripts/semantic_eval.py."""

import jax.numpy as jnp

from super_rag_tpu.engine.collection import CollectionEngine
from super_rag_tpu.engine.index import IndexSpec
from super_rag_tpu.evals import LabeledQuery, evaluate_engine

# distinct topical paragraphs: each question below targets exactly one
CORPUS = {
    "solar": ("Solar panels convert sunlight into electricity using "
              "photovoltaic cells made from silicon wafers. Inverters "
              "then transform the direct current into alternating "
              "current for household appliances."),
    "sourdough": ("Baking sourdough bread starts with a live starter of "
                  "wild yeast and lactobacilli. The dough ferments "
                  "slowly, developing an open crumb and a tangy flavor "
                  "before baking in a dutch oven."),
    "coral": ("Coral reefs are built by colonies of tiny polyps that "
              "secrete calcium carbonate skeletons. Rising ocean "
              "temperatures cause bleaching, expelling the symbiotic "
              "algae that give corals their color."),
    "transformer": ("The transformer architecture relies on multi-head "
                    "self-attention to relate every token to every "
                    "other token, replacing recurrence entirely and "
                    "enabling massive parallel training."),
    "espresso": ("Pulling a good espresso shot requires finely ground "
                 "coffee tamped evenly, water at about 93 degrees "
                 "celsius, and nine bars of pressure for roughly "
                 "twenty-five seconds of extraction."),
    "glacier": ("Glaciers form where winter snowfall exceeds summer "
                "melt for decades, compacting into dense ice that "
                "flows downhill and carves valleys into bedrock."),
}

QUESTIONS = [
    ("How do photovoltaic cells turn sunlight into power?", "solar"),
    ("What makes sourdough bread taste tangy?", "sourdough"),
    ("Why do corals lose their color when the ocean warms?", "coral"),
    ("What did self-attention replace in sequence models?", "transformer"),
    ("What pressure and temperature does an espresso shot need?",
     "espresso"),
    ("How does compacted snow become a glacier that carves valleys?",
     "glacier"),
]


def _build_engine():
    eng = CollectionEngine(IndexSpec(dim=256, dtype=jnp.float32,
                                     vocab_size=1 << 15))
    for doc_id, text in CORPUS.items():
        eng.ingest([text], metadata=[{"document_id": doc_id}])
    return eng


def test_questions_find_gold_chunks():
    eng = _build_engine()
    labeled = [LabeledQuery(query=q, relevant_doc_ids={gold})
               for q, gold in QUESTIONS]
    report = evaluate_engine(eng, labeled, ks=(1, 5), mode="hybrid")
    # offline stack (hash embed + BM25 + RRF): every gold chunk must be
    # in the top-5, and most questions should rank it first
    assert report.recall_at_k[5] == 1.0, report.per_query
    assert report.recall_at_k[1] >= 0.8, report.per_query
    assert report.mrr >= 0.85, report.mrr


def test_dense_only_still_recalls():
    eng = _build_engine()
    labeled = [LabeledQuery(query=q, relevant_doc_ids={gold})
               for q, gold in QUESTIONS]
    report = evaluate_engine(eng, labeled, ks=(5,), mode="dense")
    assert report.recall_at_k[5] >= 0.8, report.per_query
