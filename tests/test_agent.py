"""Agent runtime: tool loop with a scripted LLM, offline policy, AG-UI
mapping, session expiry, API surface."""

import asyncio
import json

import pytest

from super_rag_tpu.agent.ag_ui import to_ag_ui
from super_rag_tpu.agent.runtime import AgentSession, Tool, ToolRegistry
from super_rag_tpu.agent.session_manager import AgentSessionManager, platform_tools
from super_rag_tpu.config import Settings
from super_rag_tpu.service.context import build_context
from super_rag_tpu.service.collection_service import CollectionService


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


async def collect(aiter):
    return [e async for e in aiter]


def make_tools():
    calls = []

    def lookup(query: str):
        calls.append(query)
        return {"items": [{"text": f"fact about {query}", "score": 1.0}]}

    reg = ToolRegistry([
        Tool("search_collections", "search docs",
             {"type": "object", "properties": {"query": {"type": "string"}}},
             lookup)
    ])
    return reg, calls


def test_tool_loop_with_scripted_llm():
    reg, calls = make_tools()
    responses = iter([
        '{"tool": "search_collections", "arguments": {"query": "foxes"}}',
        "Foxes are canids; see the retrieved fact.",
    ])
    session = AgentSession(tools=reg, completion=lambda prompt: next(responses))
    events = run(collect(session.run("tell me about foxes")))
    kinds = [e["event"] for e in events]
    assert kinds[0] == "tool_call" and kinds[1] == "tool_result"
    assert kinds[-1] == "done"
    assert calls == ["foxes"]
    assert "canids" in events[-1]["data"]["text"]
    # history retained for the next turn
    assert session.history[-1]["role"] == "assistant"


def test_unknown_tool_feeds_error_back():
    reg, _ = make_tools()
    responses = iter([
        '{"tool": "nope", "arguments": {}}',
        "final answer",
    ])
    session = AgentSession(tools=reg, completion=lambda prompt: next(responses))
    events = run(collect(session.run("q")))
    tr = next(e for e in events if e["event"] == "tool_result")
    assert "unknown tool" in tr["data"]["result"]["error"]
    assert events[-1]["data"]["text"] == "final answer"


def test_iteration_budget():
    reg, _ = make_tools()
    session = AgentSession(
        tools=reg,
        completion=lambda prompt: '{"tool": "search_collections", "arguments": {"query": "x"}}',
    )
    events = run(collect(session.run("q")))
    tool_calls = [e for e in events if e["event"] == "tool_call"]
    assert len(tool_calls) == 10
    assert "budget" in events[-1]["data"]["text"]


def test_offline_policy(tmp_path):
    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    ctx = build_context(cfg)
    collections = CollectionService(ctx)
    coll = collections.create("u", "kb")
    eng = ctx.engines.get(coll["id"], coll["config"])
    eng.ingest(["TPUs use systolic arrays for matrix multiplication."])

    session = AgentSession(
        tools=platform_tools(ctx, "u", [coll["id"]]), completion=None
    )
    events = run(collect(session.run("how do TPUs multiply matrices")))
    kinds = [e["event"] for e in events]
    assert "tool_call" in kinds and kinds[-1] == "done"
    assert "systolic" in events[-1]["data"]["text"]


def test_ag_ui_mapping():
    reg, _ = make_tools()
    responses = iter([
        '{"tool": "search_collections", "arguments": {"query": "a"}}',
        "answer text",
    ])
    session = AgentSession(tools=reg, completion=lambda prompt: next(responses))
    events = run(collect(to_ag_ui(session.run("q"))))
    kinds = [e["event"] for e in events]
    assert kinds[0] == "RunStarted" and kinds[-1] == "RunFinished"
    assert "ToolCallStart" in kinds and "TextMessageContent" in kinds
    assert kinds.index("TextMessageStart") < kinds.index("TextMessageEnd")


def test_session_manager_caching_and_expiry(tmp_path):
    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    ctx = build_context(cfg)
    mgr = AgentSessionManager(ctx)
    s1 = mgr.get("u", "chat1", [])
    s2 = mgr.get("u", "chat1", [])
    assert s1 is s2
    s3 = mgr.get("u", "chat2", [])
    assert s3 is not s1
    # force expiry
    key = ("u", "chat1")
    sess, _ = mgr._sessions[key]
    mgr._sessions[key] = (sess, 0.0)
    assert mgr.evict_expired() == 1
