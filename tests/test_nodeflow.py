"""Nodeflow: validation, templating, level parallelism, end-to-end RAG flow."""

import asyncio

import jax.numpy as jnp
import pytest
from pydantic import BaseModel

import super_rag_tpu.nodeflow.runners  # noqa: F401 — registers runners
from super_rag_tpu.engine.manager import EngineManager
from super_rag_tpu.config import Settings
from super_rag_tpu.nodeflow.engine import NodeflowEngine
from super_rag_tpu.nodeflow.models import (
    Edge,
    NodeInstance,
    NodeflowInstance,
    SystemInput,
    register_node_runner,
    node_type_catalog,
)
from super_rag_tpu.nodeflow.parser import NodeflowParser
from super_rag_tpu.store.db import Database


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def test_cycle_detection():
    flow = NodeflowInstance(
        name="bad",
        nodes=[NodeInstance("a", "start"), NodeInstance("b", "start")],
        edges=[Edge("a", "b"), Edge("b", "a")],
    )
    with pytest.raises(ValueError, match="cycle"):
        flow.validate()


def test_duplicate_ids_and_unknown_edge():
    with pytest.raises(ValueError, match="duplicate"):
        NodeflowInstance(
            "x", [NodeInstance("a", "start"), NodeInstance("a", "start")], []
        ).validate()
    with pytest.raises(ValueError, match="unknown"):
        NodeflowInstance(
            "x", [NodeInstance("a", "start")], [Edge("a", "zzz")]
        ).validate()


class EchoIn(BaseModel):
    value: str = ""


class EchoOut(BaseModel):
    value: str = ""


@register_node_runner("test_echo", EchoIn, EchoOut)
async def _echo(node, inputs, ctx):
    return EchoOut(value=inputs.value)


class SleepIn(BaseModel):
    tag: str = ""


class SleepOut(BaseModel):
    tag: str = ""


_order: list[str] = []


@register_node_runner("test_sleep", SleepIn, SleepOut)
async def _sleep(node, inputs, ctx):
    _order.append("start:" + inputs.tag)
    await asyncio.sleep(0.05)
    _order.append("end:" + inputs.tag)
    return SleepOut(tag=inputs.tag)


def test_template_resolution_and_parallel_levels():
    _order.clear()
    flow = NodeflowInstance(
        name="t",
        nodes=[
            NodeInstance("s", "start"),
            NodeInstance("p1", "test_sleep", input_values={"tag": "a"}),
            NodeInstance("p2", "test_sleep", input_values={"tag": "b"}),
            NodeInstance(
                "e", "test_echo",
                input_values={"value": "q={{ nodes.s.output.query }} "
                                       "tags={{ nodes.p1.output.tag }}{{ nodes.p2.output.tag }}"},
            ),
        ],
        edges=[Edge("s", "p1", target_handle="tag"),
               Edge("s", "p2", target_handle="tag"),
               Edge("p1", "e", target_handle="value"),
               Edge("p2", "e", target_handle="value")],
    )
    # explicit input_values on p1/p2 take precedence over edge binding
    eng = NodeflowEngine()
    ctx = run(eng.execute_nodeflow(flow, SystemInput(query="hello")))
    assert ctx.outputs["e"].value == "q=hello tags=ab"
    # p1 and p2 ran concurrently: both started before either finished
    assert _order[:2] == ["start:a", "start:b"] or _order[:2] == ["start:b", "start:a"]


def test_single_expr_returns_raw_object():
    eng = NodeflowEngine()
    flow = NodeflowInstance(
        name="t",
        nodes=[NodeInstance("s", "start"),
               NodeInstance("e", "test_echo",
                            input_values={"value": "{{ sys.query }}"})],
        edges=[Edge("s", "e", target_handle="value")],
    )
    ctx = run(eng.execute_nodeflow(flow, SystemInput(query="raw")))
    assert ctx.outputs["e"].value == "raw"


def test_events_emitted():
    events = []
    eng = NodeflowEngine(on_event=events.append)
    flow = NodeflowInstance(name="t", nodes=[NodeInstance("s", "start")], edges=[])
    run(eng.execute_nodeflow(flow, SystemInput(query="x")))
    kinds = [e["event"] for e in events]
    assert kinds == ["FLOW_START", "NODE_START", "NODE_END", "FLOW_END"]
    assert events[2]["duration_ms"] >= 0


RAG_FLOW = {
    "name": "rag",
    "graph": {
        "nodes": [
            {"id": "start", "type": "start", "data": {}},
            {"id": "vs", "type": "vector_search",
             "data": {"input_values": {"top_k": 5, "similarity_threshold": None,
                                        "collection_ids": ["COLL"]}}},
            {"id": "fs", "type": "fulltext_search",
             "data": {"input_values": {"top_k": 5, "collection_ids": ["COLL"]}}},
            {"id": "merge", "type": "merge",
             "data": {"input_values": {
                 "vector_docs": "{{ nodes.vs.output.docs }}",
                 "fulltext_docs": "{{ nodes.fs.output.docs }}",
                 "strategy": "rrf"}}},
            {"id": "rerank", "type": "rerank",
             "data": {"input_values": {"docs": "{{ nodes.merge.output.docs }}",
                                        "top_k": 3}}},
            {"id": "llm", "type": "llm",
             "data": {"input_values": {"docs": "{{ nodes.rerank.output.docs }}"}}},
        ],
        "edges": [
            {"source": "start", "target": "vs", "targetHandle": "query"},
            {"source": "start", "target": "fs", "targetHandle": "query"},
            {"source": "vs", "target": "merge", "targetHandle": "vector_docs"},
            {"source": "fs", "target": "merge", "targetHandle": "fulltext_docs"},
            {"source": "merge", "target": "rerank", "targetHandle": "docs"},
            {"source": "rerank", "target": "llm", "targetHandle": "docs"},
        ],
    },
}


def test_end_to_end_rag_flow(tmp_path):
    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    db = Database(cfg.resolved_db_path())
    engines = EngineManager(cfg)
    coll = db.create_collection("kb", "alice")
    eng = engines.get(coll["id"], coll["config"])
    eng.ingest([
        "the fox jumps over the dog",
        "TPUs multiply matrices with systolic arrays",
        "JAX traces python functions into XLA programs",
    ])

    import copy
    defn = copy.deepcopy(RAG_FLOW)
    for n in defn["graph"]["nodes"]:
        iv = n["data"].get("input_values", {})
        if "collection_ids" in iv:
            iv["collection_ids"] = [coll["id"]]

    flow, defaults = NodeflowParser().parse(defn)
    nf = NodeflowEngine()
    ctx = run(
        nf.execute_nodeflow(
            flow, SystemInput(query="how do TPUs multiply matrices"),
            services={"engines": engines, "db": db},
        )
    )
    answer = ctx.outputs["llm"]
    assert answer.docs
    assert "systolic" in answer.docs[0].text
    assert answer.text  # echo fallback returns top doc text
    assert answer.references


def test_parser_rejects_bad_port():
    bad = {
        "name": "x",
        "graph": {
            "nodes": [
                {"id": "a", "type": "start", "data": {}},
                {"id": "b", "type": "rerank", "data": {}},
            ],
            "edges": [
                {"source": "a", "target": "b", "targetHandle": "nonexistent"}
            ],
        },
    }
    with pytest.raises(ValueError, match="no input port"):
        NodeflowParser().parse(bad)


def test_node_type_catalog():
    cat = node_type_catalog()
    types = {c["type"] for c in cat}
    assert {"start", "vector_search", "fulltext_search", "merge", "rerank",
            "llm", "graph_search"} <= types
    vs = next(c for c in cat if c["type"] == "vector_search")
    assert "top_k" in vs["input_schema"]["properties"]


def test_yaml_workflow_and_globals():
    yaml_def = """
name: yflow
input_schema:
  greeting:
    type: string
    default: "hello from globals"
graph:
  nodes:
    - id: s
      type: start
      data: {}
    - id: e
      type: test_echo
      data:
        input_values:
          value: "{{ globals.greeting }}"
  edges:
    - source: s
      target: e
      targetHandle: value
"""
    flow, defaults = NodeflowParser().parse(yaml_def)
    assert defaults == {"greeting": "hello from globals"}
    eng = NodeflowEngine()
    ctx = run(eng.execute_nodeflow(flow, SystemInput(query="q"),
                                   globals_=defaults))
    assert ctx.outputs["e"].value == "hello from globals"
    # override the default at run time
    ctx = run(eng.execute_nodeflow(flow, SystemInput(query="q"),
                                   globals_={"greeting": "overridden"}))
    assert ctx.outputs["e"].value == "overridden"
