"""Progressive agent skills: disclosure levels, markdown loading, L4 tools."""

import asyncio

from super_rag_tpu.agent.runtime import AgentSession, Tool, ToolRegistry
from super_rag_tpu.agent.skills import (
    AgentSkill,
    SkillLibrary,
    parse_skill_markdown,
)


def test_render_levels():
    s = AgentSkill(name="sql", description="query databases",
                   instructions="Use SELECT ...")
    assert s.render(1) == "- sql"
    assert s.render(2) == "- sql: query databases"
    assert "Use SELECT" in s.render(3)


def test_markdown_parsing():
    text = """---
name: deploy
description: ship a release
---
Step 1: build. Step 2: push."""
    s = parse_skill_markdown(text)
    assert s.name == "deploy" and s.description == "ship a release"
    assert s.instructions.startswith("Step 1")


def test_directory_loading(tmp_path):
    (tmp_path / "a.md").write_text("---\nname: alpha\ndescription: first\n---\nbody")
    (tmp_path / "ignore.txt").write_text("x")
    lib = SkillLibrary.from_directory(str(tmp_path))
    assert "alpha" in lib.prompt_section()


def test_engage_binds_tools_and_escalates():
    calls = []
    tool = Tool("deploy_now", "do it", {"type": "object", "properties": {}},
                lambda: calls.append(1) or {"ok": True})
    lib = SkillLibrary([AgentSkill(name="deploy", description="ship",
                                   instructions="press the button",
                                   tools=[tool])])
    reg = ToolRegistry()
    reg.add(lib.as_tool(reg))
    # before engagement: L2 only, tool not bound
    assert "press the button" not in lib.prompt_section()
    assert reg.get("deploy_now") is None

    async def drive():
        out = await reg.get("use_skill").call({"name": "deploy"})
        return out

    out = asyncio.new_event_loop().run_until_complete(drive())
    assert out["tools_added"] == ["deploy_now"]
    assert "press the button" in lib.prompt_section()  # now L3
    assert reg.get("deploy_now") is not None


def test_agent_uses_skill_in_loop():
    lib = SkillLibrary([AgentSkill(
        name="math", description="arithmetic helper",
        instructions="add numbers carefully",
        tools=[Tool("add", "add two ints",
                    {"type": "object",
                     "properties": {"a": {"type": "integer"},
                                    "b": {"type": "integer"}}},
                    lambda a, b: {"sum": a + b})],
    )])
    reg = ToolRegistry()
    reg.add(lib.as_tool(reg))
    responses = iter([
        '{"tool": "use_skill", "arguments": {"name": "math"}}',
        '{"tool": "add", "arguments": {"a": 2, "b": 3}}',
        "The sum is 5.",
    ])
    session = AgentSession(tools=reg, completion=lambda prompt: next(responses))

    async def drive():
        return [e async for e in session.run("add 2 and 3")]

    events = asyncio.new_event_loop().run_until_complete(drive())
    results = [e for e in events if e["event"] == "tool_result"]
    assert results[1]["data"]["result"] == {"sum": 5}
    assert events[-1]["data"]["text"] == "The sum is 5."
