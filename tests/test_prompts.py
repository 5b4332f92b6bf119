"""Prompt-template system: builtin role presets, jinja2 rendering,
language-variant agent prompts, per-user CRUD, per-agent overrides
(reference llm/prompts.py MULTI_ROLE_* + prompt_template_service.py)."""

import asyncio

from super_rag_tpu.agent.runtime import AgentSession, ToolRegistry
from super_rag_tpu.llm import prompts
from super_rag_tpu.store.db import Database


def test_builtin_templates_by_language():
    en = prompts.list_templates("en-US")
    zh = prompts.list_templates("zh-CN")
    assert len(en) >= 10 and len(zh) >= 4
    assert all(t["builtin"] for t in en)
    assert {"universal", "rag-cited-answer", "summarizer",
            "translator-en-zh", "code-explainer", "sql-generator",
            "fact-checker"} <= {t["name"] for t in en}


def test_render_template_jinja():
    out = prompts.render_template(
        "Hi {{ name }}{% if loud %}!!!{% endif %}", name="x", loud=True
    )
    assert out == "Hi x!!!"
    # builtin presets render with defaults
    summ = next(t for t in prompts.list_templates("en-US")
                if t["name"] == "summarizer")
    assert "150" in prompts.render_template(summ["prompt"], query="text")


def test_agent_system_prompt_languages():
    en = prompts.get_agent_system_prompt("en-US")
    zh = prompts.get_agent_system_prompt("zh-CN")
    assert "{tool_descriptions}" in en and "{tool_descriptions}" in zh
    assert en != zh
    assert prompts.get_agent_system_prompt("fr-FR") == en  # fallback
    assert prompts.get_agent_system_prompt("en-US", custom="X") == "X"


def test_build_agent_query_prompt_defaults_and_custom():
    out = prompts.build_agent_query_prompt(
        "what is x", history=[{"role": "user",
                               "parts": [{"type": "text", "text": "hi"}]}],
        collection_titles=["KB one"], web_search_enabled=True,
    )
    assert "what is x" in out and "KB one" in out and "user: hi" in out
    assert "Web search is enabled" in out
    zh = prompts.build_agent_query_prompt("问题", language="zh-CN")
    assert "用户问题" in zh
    custom = prompts.build_agent_query_prompt(
        "q", custom_template="Q={{ query }} L={{ language }}"
    )
    assert custom == "Q=q L=en-US"


def test_prompt_template_crud(tmp_path):
    db = Database(str(tmp_path / "t.db"))
    row = db.create_prompt_template("alice", "mine", "P {{ query }}",
                                    description="d")
    assert row["user"] == "alice" and row["language"] == "en-US"
    # merged listing: builtins + custom
    merged = prompts.list_templates("en-US", db=db, username="alice")
    custom = [t for t in merged if not t["builtin"]]
    assert len(custom) == 1 and custom[0]["name"] == "mine"
    # other users don't see it
    assert all(t["builtin"] for t in
               prompts.list_templates("en-US", db=db, username="bob"))
    db.update_prompt_template(row["id"], prompt="P2", user="EVIL")
    got = db.get_prompt_template(row["id"])
    assert got["prompt"] == "P2" and got["user"] == "alice"
    db.delete_prompt_template(row["id"])
    assert db.get_prompt_template(row["id"]) is None


def test_agent_session_custom_system_template():
    seen = {}

    def completion(prompt: str):
        seen["prompt"] = prompt
        return "answer"

    session = AgentSession(
        tools=ToolRegistry(), completion=completion,
        system_template="CUSTOM {{ query }} | {{ tool_descriptions }}",
    )

    async def run():
        return [ev async for ev in session.run("hello")]

    events = asyncio.run(run())
    assert seen["prompt"].startswith("CUSTOM hello")
    assert any(ev["event"] == "done" for ev in events)


def test_agent_session_zh_default():
    seen = {}

    def completion(prompt: str):
        seen["prompt"] = prompt
        return "答案"

    session = AgentSession(tools=ToolRegistry(), completion=completion,
                           language="zh-CN")

    async def run():
        return [ev async for ev in session.run("你好")]

    asyncio.run(run())
    assert "可用工具" in seen["prompt"]


def test_render_template_sandboxed_against_ssti():
    """User-controlled templates (prompt_template CRUD, agent
    system_prompt_template) must render in the jinja2 sandbox: the
    attribute-graph escape that reaches os.popen raises SecurityError
    instead of executing (ADVICE r3 #1)."""
    import pytest

    from jinja2.exceptions import SecurityError

    from super_rag_tpu.llm.prompts import render_template

    # benign templates still render
    assert render_template("hi {{ name }}", name="x") == "hi x"
    assert render_template(
        "{% if xs %}{{ xs | join(',') }}{% endif %}", xs=["a", "b"]
    ) == "a,b"
    evil = ("{{ cycler.__init__.__globals__.os.popen('echo pwned')"
            ".read() }}")
    with pytest.raises(SecurityError):
        render_template(evil, query="q")


def test_nodeflow_template_env_sandboxed():
    from super_rag_tpu.nodeflow.engine import NodeflowEngine
    import jinja2.sandbox

    eng = NodeflowEngine()
    assert isinstance(eng._jinja, jinja2.sandbox.SandboxedEnvironment)
