"""Tracing: span hierarchy, decorators, error status."""

import asyncio

from super_rag_tpu.trace.tracing import Tracer, get_tracer, trace_function, trace_async_function


def test_span_hierarchy():
    t = Tracer()
    with t.start_span("parent") as parent:
        with t.start_span("child") as child:
            assert child.trace_id == parent.trace_id
            assert child.parent_id == parent.span_id
    spans = t.recent()
    assert [s["name"] for s in spans] == ["child", "parent"]
    assert spans[1]["duration_ms"] >= spans[0]["duration_ms"]


def test_error_status():
    t = Tracer()
    try:
        with t.start_span("boom"):
            raise ValueError("nope")
    except ValueError:
        pass
    s = t.recent()[-1]
    assert s["status"] == "ERROR" and "nope" in s["attributes"]["error"]


def test_decorators():
    tracer = get_tracer()
    before = len(tracer.recent(10_000))

    @trace_function()
    def work(x):
        return x * 2

    @trace_async_function("async-work")
    async def awork(x):
        return x + 1

    assert work(21) == 42
    assert asyncio.new_event_loop().run_until_complete(awork(1)) == 2
    names = [s["name"] for s in tracer.recent(10_000)[before:]]
    assert any("work" in n for n in names) and "async-work" in names


def test_ring_buffer_bound():
    t = Tracer(max_spans=5)
    for i in range(10):
        with t.start_span(f"s{i}"):
            pass
    assert len(t.recent(100)) == 5
