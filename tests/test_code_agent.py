"""Code-agent layer (reference agent_pro parity): sandboxed runner,
plan generation/execution with lifecycle callbacks, and an agent chat
that escalates a skill L1 -> L4 and executes a tool-generated plan
(reference agent_pro/code_agent.py, llm_agent.py:30,200-228)."""

import asyncio
import json

from super_rag_tpu.agent.code_runner import run_python
from super_rag_tpu.agent.planner import (
    AgentCallback,
    Plan,
    PlanStep,
    execute_plan,
    make_plan,
)
from super_rag_tpu.agent.runtime import AgentSession, Tool, ToolRegistry
from super_rag_tpu.agent.skills import SkillLibrary, builtin_skills


# -- sandbox ------------------------------------------------------------------


def test_run_python_basic():
    r = run_python("print(2 + 40)")
    assert r.exit_code == 0 and r.stdout.strip() == "42"
    assert not r.timed_out


def test_run_python_error_reported():
    r = run_python("raise ValueError('boom')")
    assert r.exit_code != 0 and "boom" in r.stderr


def test_run_python_wall_clock_kill():
    r = run_python("import time; time.sleep(60)", timeout_s=1.5)
    assert r.timed_out and "killed" in r.stderr


def test_run_python_timeout_kills_grandchildren(tmp_path):
    """A forking snippet must not survive the wall clock: the timeout
    path killpg's the whole session group (ADVICE r3 #3)."""
    beat = tmp_path / "beat"
    code = f"""
import os, time
pid = os.fork()
if pid == 0:  # grandchild: heartbeat forever
    while True:
        with open({str(beat)!r}, 'a') as f:
            f.write('x')
        time.sleep(0.1)
time.sleep(60)
"""
    r = run_python(code, timeout_s=1.5)
    assert r.timed_out
    import time

    time.sleep(0.5)  # allow any survivor to beat again
    n1 = beat.stat().st_size if beat.exists() else 0
    time.sleep(1.0)
    n2 = beat.stat().st_size if beat.exists() else 0
    assert n2 == n1, "grandchild survived the sandbox kill"


def test_run_python_cpu_limit():
    r = run_python("while True: pass", timeout_s=30.0, cpu_seconds=1)
    assert r.exit_code != 0  # SIGXCPU, not the 30s wall clock
    assert r.duration_s < 10


def test_run_python_collects_files():
    r = run_python("open('out.txt', 'w').write('artifact')")
    assert r.files == {"out.txt": "artifact"}


def test_run_python_isolated_env():
    r = run_python("import os; print(os.environ.get('PYTHONPATH', 'none'))")
    assert r.stdout.strip() == "none"


# -- planner ------------------------------------------------------------------


def test_make_plan_from_llm_json():
    def completion(prompt):
        return json.dumps({"objective": "obj", "steps": [
            {"goal": "compute", "tool": "code",
             "code": "print(6 * 7)"},
        ]})

    plan = make_plan("what is 6*7", completion)
    assert plan.objective == "obj"
    assert plan.steps[0].tool == "code"


def test_make_plan_offline_fallback():
    reg = ToolRegistry([Tool("search_collections", "s",
                             {"type": "object", "properties": {}},
                             lambda **kw: {"items": []})])
    plan = make_plan("q", None, tools=reg)
    assert plan.steps[0].tool == "search_collections"
    plan2 = make_plan("q", lambda prompt: "not json", tools=reg)
    assert plan2.steps[0].tool == "search_collections"


def test_execute_plan_code_and_tools_with_callbacks():
    events = []

    class Rec(AgentCallback):
        def on_tool_call(self, tool, arguments):
            events.append(("call", tool))

        def after_tool_call(self, tool, result):
            events.append(("after", tool))

    reg = ToolRegistry([Tool("lookup", "l",
                             {"type": "object", "properties": {}},
                             lambda **kw: {"value": 21})])
    plan = Plan(objective="o", steps=[
        PlanStep(goal="fetch", tool="lookup", arguments={}),
        PlanStep(goal="double it", tool="code",
                 code="import json\n"
                      "ctx = json.loads(PLAN_CONTEXT)\n"
                      "print(ctx[0]['result']['value'] * 2)"),
    ])
    transcript = asyncio.run(execute_plan(plan, tools=reg, callbacks=[Rec()]))
    assert transcript[0]["result"] == {"value": 21}
    assert transcript[1]["result"]["stdout"].strip() == "42"
    assert events == [("call", "lookup"), ("after", "lookup"),
                      ("call", "code"), ("after", "code")]


def test_execute_plan_tool_error_does_not_abort():
    reg = ToolRegistry()
    plan = Plan(objective="o", steps=[
        PlanStep(goal="missing", tool="nope"),
        PlanStep(goal="still runs", tool="code", code="print('ok')"),
    ])
    transcript = asyncio.run(execute_plan(plan, tools=reg))
    assert "error" in transcript[0]["result"]
    assert transcript[1]["result"]["stdout"].strip() == "ok"


# -- L1 -> L4 escalation through an agent chat --------------------------------


def scripted_completion(script):
    state = {"i": 0}

    def completion(prompt):
        out = script[min(state["i"], len(script) - 1)]
        state["i"] += 1
        return out(prompt) if callable(out) else out

    return completion


def test_agent_chat_escalates_skill_to_l4_and_runs_code():
    """The VERDICT item-9 acceptance path: the python-sandbox skill is
    visible at L2, use_skill escalates it (L3 instructions + L4 tool
    binding), and the newly bound run_python tool executes code."""
    completion = scripted_completion([
        # turn 1: the model engages the skill it can see at L2
        json.dumps({"tool": "use_skill",
                    "arguments": {"name": "python-sandbox"}}),
        # turn 2: the L4-bound tool is now callable
        json.dumps({"tool": "run_python",
                    "arguments": {"code": "print(19 * 3)"}}),
        # turn 3: final answer from the tool result
        "the answer is 57",
    ])
    tools = ToolRegistry()
    lib = SkillLibrary(builtin_skills())
    tools.add(lib.as_tool(tools))
    session = AgentSession(tools=tools, completion=completion, skills=lib)

    # L1/L2: before escalation the sandbox tool is NOT bound
    assert tools.get("run_python") is None
    assert "python-sandbox" in session._tool_descriptions()

    async def run():
        return [ev async for ev in session.run("what is 19*3?")]

    events = asyncio.run(run())
    kinds = [(e["event"], e["data"].get("tool")) for e in events
             if e["event"] in ("tool_call",)]
    assert ("tool_call", "use_skill") in kinds
    assert ("tool_call", "run_python") in kinds
    # L4 happened: the tool is bound now and the skill reports engaged
    assert tools.get("run_python") is not None
    assert "python-sandbox" in lib.engaged()
    results = [e["data"]["result"] for e in events
               if e["event"] == "tool_result"
               and e["data"]["tool"] == "run_python"]
    assert results and results[0]["stdout"].strip() == "57"
    done = [e for e in events if e["event"] == "done"]
    assert done[0]["data"]["text"] == "the answer is 57"


def test_agent_chat_executes_tool_generated_plan():
    """plan-execute skill: the model engages it, the planner generates a
    plan (scripted LLM), and execute_plan runs a code step."""
    plan_json = json.dumps({"objective": "compute", "steps": [
        {"goal": "calc", "tool": "code", "code": "print(8 * 8)"},
    ]})
    script = [
        json.dumps({"tool": "use_skill",
                    "arguments": {"name": "plan-execute"}}),
        json.dumps({"tool": "plan_execute",
                    "arguments": {"task": "compute 8*8"}}),
        "64 it is",
    ]
    # make_plan also calls the completion (with the planning prompt): let
    # the scripted completion answer the plan prompt with plan JSON
    state = {"i": 0}

    def completion(prompt):
        if "Break the task into" in prompt:
            return plan_json
        out = script[min(state["i"], len(script) - 1)]
        state["i"] += 1
        return out

    tools = ToolRegistry()
    lib = SkillLibrary(builtin_skills(completion=completion,
                                      base_tools=tools))
    tools.add(lib.as_tool(tools))
    session = AgentSession(tools=tools, completion=completion, skills=lib)

    async def run():
        return [ev async for ev in session.run("compute 8*8")]

    events = asyncio.run(run())
    results = [e["data"]["result"] for e in events
               if e["event"] == "tool_result"
               and e["data"]["tool"] == "plan_execute"]
    assert results, events
    transcript = results[0]["transcript"]
    assert transcript[0]["result"]["stdout"].strip() == "64"
    assert results[0]["plan"]["steps"][0]["tool"] == "code"


def test_session_callbacks_fire():
    hooks = []

    class Rec(AgentCallback):
        def on_task_begin(self, query):
            hooks.append("begin")

        def on_generate_response(self, prompt, response):
            hooks.append("gen")

        def on_task_end(self, answer):
            hooks.append("end")

    session = AgentSession(tools=ToolRegistry(),
                           completion=lambda prompt: "hi",
                           callbacks=[Rec()])

    async def run():
        return [ev async for ev in session.run("q")]

    asyncio.run(run())
    assert hooks == ["begin", "gen", "end"]
